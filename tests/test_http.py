"""HTTP embedder/oracle against a local fake provider server: retry with
backoff on 429, char-budget request chunking, journal idempotence, and the
map_batches actor seam."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow as pa
import pytest

from raylink.http_client import (
    HttpBatchOracle,
    HttpEmbedder,
    HttpOracle,
    HttpSession,
)

DIM = 8


def _fake_embedding(text: str) -> list[float]:
    rng = np.random.default_rng(abs(hash(text)) % (2**32))
    return [float(x) for x in rng.normal(size=DIM)]


def _same(prompt: str) -> bool:
    # parse "Name A: ...\nName B: ..." out of a rendered prompt
    lines = dict(ln.split(": ", 1) for ln in prompt.splitlines() if ": " in ln)
    return lines["Name A"].lower().rstrip(" .") == lines["Name B"].lower().rstrip(" .")


class _Handler(BaseHTTPRequestHandler):
    state: dict = {}

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        st = self.state
        with st["lock"]:
            st["requests"].append(self.path)
            if st["fail_remaining"] > 0:
                st["fail_remaining"] -= 1
                self.send_response(429)
                self.send_header("Retry-After", "0")
                self.end_headers()
                return
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n).decode())
        if self.path.endswith("/embeddings"):
            texts = payload["input"]
            with st["lock"]:
                st["embed_batches"].append(list(texts))
            body = {"data": [{"embedding": _fake_embedding(t)} for t in texts]}
        elif self.path.endswith("/chat/completions"):
            user = next(
                m["content"] for m in payload["messages"] if m["role"] == "user"
            )
            with st["lock"]:
                st["chat_payloads"].append(payload)
            text = "yes, definitely" if _same(user) else "no way"
            body = {"choices": [{"message": {"content": text}}]}
        elif self.path.endswith("/messages"):
            # Anthropic wire shape: top-level system, content-block reply
            with st["lock"]:
                st["anthropic_payloads"].append(payload)
                st["anthropic_headers"].append(
                    {
                        "x-api-key": self.headers.get("x-api-key"),
                        "anthropic-version": self.headers.get("anthropic-version"),
                    }
                )
            user = payload["messages"][0]["content"]
            text = "Yes." if _same(user) else "No."
            body = {
                "content": [{"type": "text", "text": text}],
                "stop_reason": "end_turn",
            }
        else:  # legacy batched completions: prompt is a LIST
            prompts = payload["prompt"]
            with st["lock"]:
                st["batch_sizes"].append(len(prompts))
            choices = []
            for i, prompt in enumerate(prompts):
                lines = dict(
                    ln.split(": ", 1) for ln in prompt.splitlines() if ": " in ln
                )
                same = lines["Name A"].lower().rstrip(" .") == lines[
                    "Name B"
                ].lower().rstrip(" .")
                choices.append({"index": i, "text": " yes" if same else " no"})
            # shuffled choice order: clients must map back via index
            choices.reverse()
            body = {"choices": choices}
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture()
def fake_server():
    state = {
        "lock": threading.Lock(),
        "requests": [],
        "embed_batches": [],
        "batch_sizes": [],
        "chat_payloads": [],
        "anthropic_payloads": [],
        "anthropic_headers": [],
        "fail_remaining": 0,
    }
    _Handler.state = state
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1", state
    srv.shutdown()


def test_session_retries_on_429(fake_server):
    base, state = fake_server
    state["fail_remaining"] = 2
    s = HttpSession(base, max_retries=4, backoff=0.01)
    out = s.post_json("embeddings", {"model": "m", "input": ["x"]})
    assert len(out["data"]) == 1
    assert s.retries == 2
    assert len(state["requests"]) == 3  # 2 failures + 1 success


def test_session_gives_up_after_max_retries(fake_server):
    base, state = fake_server
    state["fail_remaining"] = 10
    s = HttpSession(base, max_retries=2, backoff=0.01)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        s.post_json("embeddings", {"model": "m", "input": ["x"]})
    assert len(state["requests"]) == 3  # initial + 2 retries


def test_embedder_chunks_and_memoizes(fake_server):
    base, state = fake_server
    emb = HttpEmbedder(base, dim=DIM, char_budget=20, max_items=3)
    texts = ["alpha", "beta", "gamma", "delta", "epsilon", "alpha"]
    mat = emb.encode_many(texts)
    assert mat.shape == (6, DIM)
    # unit-normalized, deterministic per text, dup rows identical
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)
    assert np.allclose(mat[0], mat[5])
    # chunking respected: every request under both caps (on distinct texts)
    for chunk in state["embed_batches"]:
        assert len(chunk) <= 3
        assert sum(len(t) for t in chunk) <= 20 or len(chunk) == 1
    sent_before = len(state["requests"])
    emb.encode_many(["alpha", "beta"])  # fully memoized: no new requests
    assert len(state["requests"]) == sent_before


def test_embedder_as_map_batches_stage(fake_server):
    base, _ = fake_server
    emb = HttpEmbedder(base, dim=DIM, text_col="key")
    batch = pa.table({"key": ["string_utils", "str_utils"]})
    out = emb(batch)
    assert "embedding" in out.column_names
    from raylink.embed import embeddings_to_numpy

    m = embeddings_to_numpy(out.column("embedding"), DIM)
    assert m.shape == (2, DIM)


def test_http_oracle_labels_normalize_and_journal(fake_server):
    base, state = fake_server
    o = HttpOracle(base, parallelism=4)
    got = o.label([("Joe", "Joe"), ("Joe", "joe."), ("Joe", "Ann")])
    assert got == ["Yes", "Yes", "No"]  # normalization: 'yes, definitely'→Yes
    sent_before = len(state["requests"])
    # journal idempotence: same pairs → zero new requests
    again = o.label([("Joe", "joe."), ("Joe", "Ann"), ("Joe", "Joe")])
    assert again == ["Yes", "No", "Yes"]
    assert len(state["requests"]) == sent_before


def test_http_oracle_drives_check_match(fake_server):
    base, _ = fake_server
    from raylink.oracle import check_match

    o = HttpOracle(base)
    assert check_match(["a", "b"], ["a", "c"], o) == ["Yes", "No"]


def test_batch_oracle_packs_prompts_and_maps_by_index(fake_server):
    """Legacy batched-completions mode (R/check_match.R:71-119): one POST
    per max_prompts chunk, answers mapped back by choice index (the fake
    server returns choices reversed), exact pairs never sent."""
    base, state = fake_server
    o = HttpBatchOracle(base, max_prompts=2)
    got = o.label([("Joe", "Joe"), ("Joe", "joe."), ("Joe", "Ann"), ("Bo", "Bo X")])
    assert got == ["Yes", "Yes", "No", "No"]
    # 3 non-exact pairs at max_prompts=2 → exactly 2 requests, sizes [2, 1]
    assert state["batch_sizes"] == [2, 1]
    sent_before = len(state["requests"])
    assert o.label([("Joe", "Ann"), ("Joe", "Joe")]) == ["No", "Yes"]
    assert len(state["requests"]) == sent_before  # journal idempotence


def test_batch_oracle_drives_check_match(fake_server):
    base, _ = fake_server
    from raylink.oracle import check_match

    o = HttpBatchOracle(base)
    assert check_match(["a", "b"], ["a", "c"], o) == ["Yes", "No"]


def test_http_embedder_through_fuzzylink_seam(fake_server):
    """The embedder_cls seam end-to-end: HttpEmbedder actors (running in
    Ray worker processes) reach the fake provider over localhost and the
    pipeline completes with the remote embeddings."""
    import ray.data as rd

    import raylink
    from raylink.synth import presidents_tables

    base, state = fake_server
    dfa, dfb, labels = presidents_tables()
    oracle = raylink.DeterministicOracle(labels)
    cfg = raylink.LinkConfig(
        by="name", blocking=["state"], seed=7, n_initial=20,
        al_batch_size=5, embedding_dim=DIM, embed_concurrency=2,
    )
    res = raylink.fuzzylink(
        rd.from_arrow(dfa), rd.from_arrow(dfb), oracle, cfg,
        embedder_cls=HttpEmbedder,
        embedder_kwargs={"base_url": base, "dim": DIM, "text_col": "key"},
    )
    linked = res.linked.to_pandas()
    assert len(linked) == 5  # dfA-complete
    with state["lock"]:
        assert any(p.endswith("/embeddings") for p in state["requests"])


def test_detect_wire_format_reference_dispatch():
    """Model-name pattern dispatch order matches R/check_match.R:127-203."""
    from raylink.http_client import detect_wire_format as d

    assert d("mistral-large-latest") == "mistral"
    assert d("open-mixtral-8x7b") == "mistral"
    assert d("claude-sonnet-4-20250514") == "anthropic"
    assert d("meta-llama/llama-3-70b") == "openrouter"
    assert d("mistralai/mistral-7b") == "mistral"  # mistral outranks slash
    assert d("gpt-4o") == "openai"


def test_http_oracle_anthropic_wire(fake_server, monkeypatch):
    """claude-* model auto-dispatches to the /messages shape: x-api-key +
    anthropic-version headers, top-level system, max_tokens required,
    content-block response parsing (R/check_match.R:145-161)."""
    base, state = fake_server
    monkeypatch.setenv("ANTHROPIC_API_KEY", "sk-ant-test")
    o = HttpOracle(base, model="claude-sonnet-4-20250514", parallelism=2)
    assert o.wire_format == "anthropic"
    got = o.label([("Joe", "joe."), ("Joe", "Ann"), ("Joe", "Joe")])
    assert got == ["Yes", "No", "Yes"]
    assert all(p.endswith("/messages") for p in state["requests"])
    for h in state["anthropic_headers"]:
        assert h["x-api-key"] == "sk-ant-test"
        assert h["anthropic-version"] == "2023-06-01"
    for p in state["anthropic_payloads"]:
        assert p["system"] == 'Respond with "Yes" or "No".'
        assert p["max_tokens"] > 0
        assert p["messages"][0]["role"] == "user"


def test_http_oracle_mistral_wire(fake_server, monkeypatch):
    """mistral-* models speak the OpenAI chat shape with the MISTRAL key
    env and the reference's system prompt (R/check_match.R:127-143)."""
    base, state = fake_server
    monkeypatch.setenv("MISTRAL_API_KEY", "mk-test")
    o = HttpOracle(base, model="mistral-large-latest")
    assert o.wire_format == "mistral"
    assert o.session.api_key_env == "MISTRAL_API_KEY"
    assert o.label([("Joe", "joe.")]) == ["Yes"]
    payload = state["chat_payloads"][-1]
    assert payload["messages"][0] == {
        "role": "system",
        "content": 'Respond with "Yes" or "No".',
    }
    assert payload["messages"][1]["role"] == "user"


def test_http_embedder_rejects_anthropic():
    from raylink.http_client import HttpEmbedder

    with pytest.raises(ValueError):
        HttpEmbedder("http://localhost", model="claude-embed")


def test_http_embedder_mistral_key_env(fake_server, monkeypatch):
    base, _ = fake_server
    monkeypatch.setenv("MISTRAL_API_KEY", "mk-test")
    emb = HttpEmbedder(base, model="mistral-embed", dim=DIM)
    assert emb.session.api_key_env == "MISTRAL_API_KEY"
    assert emb.encode_many(["alpha"]).shape == (1, DIM)
