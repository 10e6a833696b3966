"""Provider-agnostic HTTP embedding + labeling clients (SURVEY.md §2.3
T1/T2; reference ``R/get_embeddings.R:108-178`` and
``R/check_match.R:37-203``).

The reference's two biggest files are HTTP plumbing: char-budget request
chunking, 429/5xx retry loops with backoff, 20-way request parallelism,
and multi-provider dispatch via base-URL + model + env-var API key. This
module reproduces that capability behind the engine's existing seams:

* :class:`HttpEmbedder` — drop-in for the ``embedder_cls`` parameter of
  ``fuzzylink()`` / any ``map_batches`` embedding stage: a callable actor
  class whose ``__init__`` opens the session once per actor and whose
  ``__call__`` embeds a batch (chunked requests, per-actor memoization).
  Speaks the de-facto-standard ``POST {base}/embeddings`` JSON shape
  (``{"model": ..., "input": [...]}`` → ``{"data": [{"embedding": [...]}]}``).
* :class:`HttpOracle` — implements the :class:`raylink.oracle.Oracle`
  protocol: prompt rendering, 'Yes'/'No' normalization, exact-match
  short-circuit and journal idempotence identical to the deterministic
  oracle, with ``parallelism``-way concurrent requests (reference:
  ``future_map`` 20-way, R/check_match.R:85). Speaks
  ``POST {base}/chat/completions``.

Pure stdlib (urllib) — no extra dependencies; the no-network sandbox tests
it against a local fake server (tests/test_http.py). Deterministic local
encoders remain the default everywhere.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa

from raylink.embed import matrix_to_arrow
from raylink.oracle import normalize_label, render_prompt

_RETRYABLE = {429, 500, 502, 503, 504}

# Provider wire formats, mirroring the reference's model-name dispatch
# (R/check_match.R:127-203, R/get_embeddings.R:26-108): 'mistral|mixtral'
# → Mistral, 'claude' → Anthropic /v1/messages, a '/' in the model name →
# OpenRouter (OpenAI-shaped), else OpenAI. Each format carries its default
# API-key env var (the reference's per-provider *_api_key() installers,
# raylink.keys) and auth header style.
_WIRE_FORMATS = {
    "openai": {"key_env": "OPENAI_API_KEY", "auth": "bearer"},
    "openrouter": {"key_env": "OPENROUTER_API_KEY", "auth": "bearer"},
    "mistral": {"key_env": "MISTRAL_API_KEY", "auth": "bearer"},
    "anthropic": {"key_env": "ANTHROPIC_API_KEY", "auth": "x-api-key"},
}

# the reference's system prompt for every chat provider (R/check_match.R:131)
_SYSTEM_PROMPT = 'Respond with "Yes" or "No".'


def detect_wire_format(model: str) -> str:
    """Model-name pattern dispatch, reference order (R/check_match.R:127,
    145, 163: mistral/mixtral before claude before the OpenRouter slash
    test, with OpenAI as the fallthrough)."""
    low = model.lower()
    if "mistral" in low or "mixtral" in low:
        return "mistral"
    if "claude" in low:
        return "anthropic"
    if "/" in model:
        return "openrouter"
    return "openai"


def _resolve_wire(wire_format: str, model: str, api_key_env: str | None):
    fmt = detect_wire_format(model) if wire_format == "auto" else wire_format
    if fmt not in _WIRE_FORMATS:
        raise ValueError(
            f"unknown wire_format {fmt!r}; expected one of "
            f"{sorted(_WIRE_FORMATS)} or 'auto'"
        )
    spec = _WIRE_FORMATS[fmt]
    return fmt, api_key_env or spec["key_env"], spec["auth"]


class HttpSession:
    """Minimal JSON-POST session with exponential backoff.

    Mirrors the reference's retry loop (``R/get_embeddings.R:131-144``:
    retry on 429/5xx, sleep-and-retry with growing delay, honor
    ``Retry-After`` when present, give up after ``max_retries``).

    ``auth_style``: 'bearer' (``Authorization: Bearer <key>``) or
    'x-api-key' (Anthropic's header + required ``anthropic-version``)."""

    def __init__(
        self,
        base_url: str,
        api_key_env: str = "OPENAI_API_KEY",
        max_retries: int = 5,
        backoff: float = 0.5,
        timeout: float = 30.0,
        auth_style: str = "bearer",
    ):
        self.base_url = base_url.rstrip("/")
        self.api_key_env = api_key_env
        self.max_retries = max_retries
        self.backoff = backoff
        self.timeout = timeout
        self.auth_style = auth_style
        self.requests_sent = 0
        self.retries = 0

    def post_json(self, path: str, payload: dict) -> dict:
        url = f"{self.base_url}/{path.lstrip('/')}"
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
        key = os.environ.get(self.api_key_env)
        if self.auth_style == "x-api-key":
            if key:
                headers["x-api-key"] = key
            headers["anthropic-version"] = "2023-06-01"
        elif key:
            headers["Authorization"] = f"Bearer {key}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(url, data=body, headers=headers)
            try:
                self.requests_sent += 1
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode())
            except urllib.error.HTTPError as e:
                last_err = e
                if e.code not in _RETRYABLE or attempt == self.max_retries:
                    raise
                # Retry-After may be a delay in seconds OR an HTTP-date
                # (RFC 9110 §10.2.3); fall back to exponential backoff
                # when it is not a plain number.
                retry_after = e.headers.get("Retry-After")
                delay = self.backoff * (2**attempt)
                if retry_after:
                    try:
                        delay = float(retry_after)
                    except ValueError:
                        try:
                            from email.utils import parsedate_to_datetime

                            target = parsedate_to_datetime(retry_after)
                            delay = max(
                                0.0, target.timestamp() - time.time()
                            )
                        except (ValueError, TypeError):
                            pass
            except urllib.error.URLError as e:
                last_err = e
                if attempt == self.max_retries:
                    raise
                delay = self.backoff * (2**attempt)
            self.retries += 1
            time.sleep(delay)
        raise RuntimeError(f"unreachable retry state: {last_err}")


class HttpEmbedder:
    """Remote-API embedding stage for ``map_batches`` actor pools.

    Chunks each batch's distinct texts by BOTH a character budget and a
    max-items cap before sending (the reference chunks requests "to stay
    under the per-request token limit", ``R/get_embeddings.R:108-127``),
    memoizes per actor so repeated keys cost one request across the
    actor's lifetime, and L2-normalizes the returned vectors (the
    dot=cosine contract the pipeline relies on). Ray-level parallelism:
    one session per actor, ``concurrency=N`` actors in the pool — the
    distributed analogue of the reference's 20 concurrent futures."""

    def __init__(
        self,
        base_url: str,
        model: str = "text-embedding-3-large",
        dim: int | None = None,
        text_col: str = "key",
        api_key_env: str | None = None,
        char_budget: int = 100_000,
        max_items: int = 2048,
        max_retries: int = 5,
        backoff: float = 0.5,
        timeout: float = 30.0,
        wire_format: str = "auto",
    ):
        # Mistral's embeddings endpoint is OpenAI-shaped (same request and
        # response JSON); formats differ only in key env + auth header.
        # Model-name dispatch mirrors R/get_embeddings.R:26,47 (mistral vs
        # openai; anthropic has no embeddings endpoint to dispatch to).
        self.wire_format, key_env, auth = _resolve_wire(
            wire_format, model, api_key_env
        )
        if self.wire_format == "anthropic":
            raise ValueError(
                "anthropic exposes no embeddings endpoint; use an "
                "OpenAI-compatible embeddings provider"
            )
        self.session = HttpSession(
            base_url, key_env, max_retries, backoff, timeout, auth_style=auth
        )
        self.model = model
        self.dim = dim
        self.text_col = text_col
        self.char_budget = char_budget
        self.max_items = max_items
        self._cache: dict[str, np.ndarray] = {}

    def _chunks(self, texts: list[str]):
        cur: list[str] = []
        cur_chars = 0
        for t in texts:
            if cur and (
                cur_chars + len(t) > self.char_budget
                or len(cur) >= self.max_items
            ):
                yield cur
                cur, cur_chars = [], 0
            cur.append(t)
            cur_chars += len(t)
        if cur:
            yield cur

    def encode_many(self, strings) -> np.ndarray:
        todo = [s for s in dict.fromkeys(map(str, strings)) if s not in self._cache]
        for chunk in self._chunks(todo):
            resp = self.session.post_json(
                "embeddings", {"model": self.model, "input": chunk}
            )
            vecs = [d["embedding"] for d in resp["data"]]
            if len(vecs) != len(chunk):
                raise ValueError(
                    f"embedding API returned {len(vecs)} vectors for "
                    f"{len(chunk)} inputs"
                )
            for s, v in zip(chunk, vecs):
                arr = np.asarray(v, dtype=np.float32)
                n = np.linalg.norm(arr)
                if n > 0:
                    arr = arr / n
                self._cache[s] = arr
        if self.dim is None and self._cache:
            self.dim = len(next(iter(self._cache.values())))
        out = np.empty((len(strings), self.dim), dtype=np.float32)
        for i, s in enumerate(strings):
            out[i] = self._cache[str(s)]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        mat = self.encode_many(texts)
        return batch.append_column("embedding", matrix_to_arrow(mat))


class HttpOracle:
    """Remote-LLM pair-labeling oracle (Oracle protocol).

    * prompt per pair via :func:`raylink.oracle.render_prompt`
      (R/check_match.R:50-54), response normalized to first-word title
      case (R/check_match.R:141)
    * exact string equality short-circuits to 'Yes' with no request
      (R/check_match.R:59-63)
    * ``parallelism`` concurrent requests per ``label()`` call
      (reference: 20-way ``future_map``)
    * journal-backed idempotence: answered pairs are never re-sent, so a
      resumed run (pipeline journal save/load) re-spends nothing
    """

    def __init__(
        self,
        base_url: str,
        model: str = "gpt-4o",
        record_type: str = "entity",
        instructions: str | None = None,
        api_key_env: str | None = None,
        parallelism: int = 20,
        max_retries: int = 5,
        backoff: float = 0.5,
        timeout: float = 30.0,
        wire_format: str = "auto",
        system: str | None = _SYSTEM_PROMPT,
        max_tokens: int = 8,
    ):
        self.wire_format, key_env, auth = _resolve_wire(
            wire_format, model, api_key_env
        )
        self.session = HttpSession(
            base_url, key_env, max_retries, backoff, timeout, auth_style=auth
        )
        self.model = model
        self.record_type = record_type
        self.instructions = instructions
        self.parallelism = parallelism
        self.system = system
        self.max_tokens = max_tokens
        self.journal: dict[tuple[str, str], str] = {}
        self.calls = 0
        self.labels_spent = 0

    def _ask(self, a: str, b: str) -> str:
        prompt = render_prompt(a, b, self.record_type, self.instructions)
        if self.wire_format == "anthropic":
            # Anthropic /v1/messages: system is a top-level field,
            # max_tokens is required, and the reply is a content-block
            # list (R/check_match.R:145-161 via ellmer::chat_anthropic)
            payload = {
                "model": self.model,
                "max_tokens": self.max_tokens,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": 0,
            }
            if self.system:
                payload["system"] = self.system
            resp = self.session.post_json("messages", payload)
            raw = next(
                (
                    blk.get("text", "")
                    for blk in resp.get("content", [])
                    if blk.get("type") == "text"
                ),
                "",
            )
        else:
            # OpenAI-compatible chat (OpenAI / Mistral / OpenRouter share
            # the shape; they differ in base URL + key env + model names)
            messages = []
            if self.system:
                messages.append({"role": "system", "content": self.system})
            messages.append({"role": "user", "content": prompt})
            resp = self.session.post_json(
                "chat/completions",
                {
                    "model": self.model,
                    "messages": messages,
                    "temperature": 0,
                },
            )
            raw = resp["choices"][0]["message"]["content"]
        return normalize_label(raw) or "No"

    def label(self, pairs: list[tuple[str, str]]) -> list[str]:
        from concurrent.futures import ThreadPoolExecutor

        self.calls += 1
        need = [
            (a, b)
            for a, b in dict.fromkeys(pairs)
            if (a, b) not in self.journal and a != b
        ]
        if need:
            with ThreadPoolExecutor(max_workers=self.parallelism) as pool:
                answers = list(pool.map(lambda p: self._ask(*p), need))
            for (a, b), ans in zip(need, answers):
                self.journal[(a, b)] = ans
                self.labels_spent += 1
        out = []
        for a, b in pairs:
            if a == b and (a, b) not in self.journal:
                # exact short-circuit: journaled like any answer (same
                # budget accounting as DeterministicOracle), no request
                self.journal[(a, b)] = "Yes"
                self.labels_spent += 1
            out.append(self.journal[(a, b)])
        return out


class HttpBatchOracle:
    """Legacy batched-completions labeling mode (Oracle protocol) —
    the reference's oldest provider path (R/check_match.R:71-119): up to
    ``max_prompts`` rendered prompts are packed into ONE ``POST
    {base}/completions`` request (``{"model", "prompt": [...],
    "max_tokens": 1, "temperature": 0}``) and the per-prompt answers come
    back as ``choices[i].text``. One request labels a whole active-learning
    batch, so rate limits bind on tokens, not request count.

    Deviations from the reference, by design: 429 handling goes through
    :class:`HttpSession`'s Retry-After/exponential backoff instead of
    scraping "Please try again in Ns" out of the error message (the modern
    header is authoritative; the scrape predates it), and answers map back
    by each choice's ``index`` field when present rather than by list
    position alone. Exact-match short-circuit, label normalization
    (strip + title-case first word, R/check_match.R:115-117) and journal
    idempotence match :class:`HttpOracle`."""

    def __init__(
        self,
        base_url: str,
        model: str = "gpt-3.5-turbo-instruct",
        record_type: str = "entity",
        instructions: str | None = None,
        api_key_env: str = "OPENAI_API_KEY",
        max_prompts: int = 1500,
        max_retries: int = 5,
        backoff: float = 0.5,
        timeout: float = 120.0,
    ):
        self.session = HttpSession(
            base_url, api_key_env, max_retries, backoff, timeout
        )
        self.model = model
        self.record_type = record_type
        self.instructions = instructions
        self.max_prompts = max_prompts
        self.journal: dict[tuple[str, str], str] = {}
        self.calls = 0
        self.labels_spent = 0

    def _ask_chunk(self, chunk: list[tuple[str, str]]) -> list[str]:
        prompts = [
            render_prompt(a, b, self.record_type, self.instructions)
            for a, b in chunk
        ]
        resp = self.session.post_json(
            "completions",
            {
                "model": self.model,
                "prompt": prompts,
                "max_tokens": 1,
                "temperature": 0,
            },
        )
        choices = resp["choices"]
        if len(choices) != len(prompts):
            # a truncated response must fail loudly — silently defaulting
            # the missing slots would journal permanent wrong labels
            raise ValueError(
                f"batch completions returned {len(choices)} choices "
                f"for {len(prompts)} prompts"
            )
        texts = [""] * len(prompts)
        for pos, ch in enumerate(choices):
            idx = int(ch.get("index", pos))
            if not 0 <= idx < len(prompts):
                raise ValueError(f"choice index {idx} out of range")
            texts[idx] = ch.get("text", "")
        return [normalize_label(t) or "No" for t in texts]

    def label(self, pairs: list[tuple[str, str]]) -> list[str]:
        self.calls += 1
        need = [
            (a, b)
            for a, b in dict.fromkeys(pairs)
            if (a, b) not in self.journal and a != b
        ]
        for i in range(0, len(need), self.max_prompts):
            chunk = need[i : i + self.max_prompts]
            for pair, ans in zip(chunk, self._ask_chunk(chunk)):
                self.journal[pair] = ans
                self.labels_spent += 1
        out = []
        for a, b in pairs:
            if a == b and (a, b) not in self.journal:
                self.journal[(a, b)] = "Yes"
                self.labels_spent += 1
            out.append(self.journal[(a, b)])
        return out
