"""BPE tokenizer: pinned merge/apply semantics, distributed-vs-local
training equivalence, DuckDB bracketed-replace replay of apply (the gate
mechanism), and pack_sequences over real token counts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.ops.bpe import (
    BpeApplier,
    _merge_seq,
    apply_bpe,
    bpe_vocab,
    encode_word,
    train_bpe,
    train_merges_from_table,
    word_frequencies,
)


def test_merge_seq_hand_cases():
    # adjacent repeats: non-overlapping left-to-right greedy
    assert _merge_seq(list("abab"), "a", "b", "ab") == ["ab", "ab"]
    assert _merge_seq(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    assert _merge_seq(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _merge_seq(["ab", "c", "ab"], "ab", "c", "abc") == ["abc", "ab"]
    assert _merge_seq(list("xyz"), "a", "b", "ab") == ["x", "y", "z"]


def test_train_merges_hand_values():
    # corpus: "low" x5, "lower" x2 -> classic Sennrich example (no </w>):
    # pairs: (l,o)=7, (o,w)=7 -> tie broken (a ASC): (l,o) first
    words = {"low": 5, "lower": 2}
    merges = train_merges_from_table(words, num_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")  # 'low' now [low]; 'lower' [low,e,r]
    assert merges[2] == ("e", "r") or merges[2] == ("low", "e")
    # count check for merge 3: (low,e)=2, (e,r)=2 -> tie -> 'e' < 'low'
    assert merges[2] == ("e", "r")


def test_encode_word_and_vocab():
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    vocab = bpe_vocab(merges)
    # alphabet {e,l,o,r,w} ids 0..4 sorted, then lo=5, low=6, er=7
    assert vocab["e"] == 0 and vocab["w"] == 4
    assert vocab["lo"] == 5 and vocab["low"] == 6 and vocab["er"] == 7
    # apply in order: l o w e r -> lo w e r -> low e r -> low er
    assert encode_word("lower", merges, vocab) == [vocab["low"], vocab["er"]]
    # unknown char -> -1
    assert encode_word("qéq", merges, vocab)[0] == -1


def test_distributed_train_matches_local_reference():
    rng = np.random.default_rng(11)
    base = ["banana", "bandana", "cabana", "antenna", "analog", "banal"]
    texts = [
        " ".join(rng.choice(base, rng.integers(1, 8)).tolist())
        for _ in range(200)
    ]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(5)
    merges = train_bpe(ds, num_merges=10, final_partitions=2)

    # independent local reference: single-process counting + same rules
    from collections import Counter
    import re

    wf: Counter = Counter()
    for t in texts:
        wf.update(re.findall(r"[0-9a-z_]+", t.lower()))
    seqs = {w: list(w) for w in wf}
    expect = []
    for _ in range(10):
        pc_: Counter = Counter()
        for w, c in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc_[(s[i], s[i + 1])] += c
        if not pc_:
            break
        (a, b), n = min(pc_.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < 2:
            break
        expect.append((a, b))
        for w in seqs:
            seqs[w] = _merge_seq(seqs[w], a, b, a + b)
    assert merges == expect


def _bracket_sql_apply(texts: list[str], merges: list[tuple[str, str]]) -> pd.DataFrame:
    """DuckDB replay of apply: bracketed chars + replace-fold over the
    frozen merges (the exact mechanism the bpe_tokenize oracle uses)."""
    con = duckdb.connect()
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con.register("documents", docs)
    mrows = ",".join(
        f"({i}, '({a})({b})', '({a}{b})')" for i, (a, b) in enumerate(merges)
    )
    vocab = bpe_vocab(merges)
    vrows = ",".join(f"('{s}', {i})" for s, i in vocab.items())
    nm = len(merges)
    sql = f"""
    WITH RECURSIVE m(idx, pat, rep) AS (VALUES {mrows}),
    vocab(sym, id) AS (VALUES {vrows}),
    words AS (
        SELECT doc_id, w.word AS word, w.wpos AS wpos FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       regexp_extract_all(lower(text), '[0-9a-z_]+'),
                       (x, i) -> struct_pack(word := x, wpos := i))) AS w
            FROM documents)
    ),
    folded(doc_id, wpos, s, i) AS (
        SELECT doc_id, wpos,
               array_to_string(
                   list_transform(regexp_extract_all(word, '.'),
                                  c -> '(' || c || ')'), ''),
               0
        FROM words
        UNION ALL
        SELECT f.doc_id, f.wpos, replace(f.s, m.pat, m.rep), f.i + 1
        FROM folded f JOIN m ON m.idx = f.i
    ),
    toks AS (
        SELECT doc_id, wpos, t.sym AS sym, t.spos AS spos FROM (
            SELECT doc_id, wpos,
                   unnest(list_transform(
                       regexp_extract_all(s, '\\(([0-9a-z_]+)\\)', 1),
                       -- 'ii': the fold counter column 'i' would shadow a
                       -- lambda parameter named 'i'
                       (x, ii) -> struct_pack(sym := x, spos := ii))) AS t
            FROM folded WHERE i = {nm})
    )
    SELECT doc_id,
           (row_number() OVER (PARTITION BY doc_id ORDER BY wpos, spos) - 1)::BIGINT AS pos,
           COALESCE(v.id, -1)::BIGINT AS token_id
    FROM toks LEFT JOIN vocab v ON v.sym = toks.sym
    ORDER BY doc_id, pos
    """
    return con.execute(sql).df()


def test_apply_matches_duckdb_bracket_replay():
    rng = np.random.default_rng(7)
    base = ["banana", "bandana", "cabana", "low", "lower", "lowest", "aaa", "abab"]
    texts = [
        " ".join(rng.choice(base, rng.integers(0, 6)).tolist())
        for _ in range(80)
    ]
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    ).repartition(4)
    merges = train_bpe(ds, num_merges=8, final_partitions=2)
    assert len(merges) >= 4
    tok = apply_bpe(ds, merges).to_pandas().sort_values("doc_id")
    got = []
    for _, r in tok.iterrows():
        for p, tid in enumerate(r["token_ids"]):
            got.append((int(r["doc_id"]), p, int(tid)))
    got_df = pd.DataFrame(got, columns=["doc_id", "pos", "token_id"])
    want = _bracket_sql_apply(texts, merges).astype(
        {"doc_id": np.int64, "pos": np.int64, "token_id": np.int64}
    )
    pd.testing.assert_frame_equal(
        got_df.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_applier_memo_and_n_tokens():
    merges = [("a", "b")]
    app = BpeApplier(merges)
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": ["ab ab zq", ""]})
    out = app(t)
    assert out.column("n_tokens").to_pylist() == [4, 0]  # [ab],[ab],[z? q?]
    v = bpe_vocab(merges)
    assert out.column("token_ids").to_pylist()[0] == [
        v["ab"], v["ab"], -1, -1  # z,q unseen at train time -> UNK
    ]
    assert "ab" in app.cache and "zq" in app.cache


def test_pack_sequences_on_real_token_counts():
    from raylink.ops.pack import pack_sequences

    texts = ["banana banana", "", "cab cab cab"]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array([0, 1, 2], dtype=np.int64), "text": texts})
    )
    merges = [("a", "n"), ("an", "an"), ("c", "a")]
    tok = apply_bpe(ds, merges)
    out = (
        pack_sequences(tok, budget=4, token_counts_col="n_tokens")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # banana -> b,anan,a = 3 ids; doc0 two words -> 6 tokens
    # cab -> ca,b = 2 ids; doc2 -> 6 tokens
    assert out["n_tokens"].tolist() == [6, 0, 6]
    assert out["start_tok"].tolist() == [0, 6, 6]
    assert out["chunk_first"].tolist() == [0, -1, 1]
    assert out["chunk_last"].tolist() == [1, -1, 2]
