"""Property tests (hypothesis) for the line-dedup family and funnel:
random corpora vs transparent pure-Python models of the documented
semantics. Few examples, one Ray job each — the suite stays fast; the
value is the adversarial corpora hypothesis finds (duplicate lines inside
one doc, all-boilerplate docs, empty lines, single-doc corpora).
"""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

_LINE = st.sampled_from(["a", "b", "c", "dd", "", "e e"])
_DOC = st.lists(_LINE, min_size=1, max_size=5).map("\n".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def _model_strip(texts, min_docs):
    c = Counter()
    for t in texts:
        c.update(set(t.split("\n")) - {""})
    drop = {l for l, n in c.items() if n >= min_docs}
    out = []
    for t in texts:
        parts = t.split("\n")
        kept = [p for p in parts if p == "" or p not in drop]
        out.append(("\n".join(kept), len(kept), len(parts) - len(kept)))
    return out


def _model_global(texts):
    owned = set()
    out = []
    for t in texts:  # doc_id order == list order
        parts = t.split("\n")
        kept = []
        for p in parts:
            if p == "":
                kept.append(p)
            elif p not in owned:
                owned.add(p)
                kept.append(p)
        out.append(("\n".join(kept), len(kept), len(parts) - len(kept)))
    return out


@settings(max_examples=6, deadline=None)
@given(texts=_CORPUS, min_docs=st.integers(min_value=1, max_value=4))
def test_strip_boilerplate_matches_model(texts, min_docs):
    from raylink.ops.lines import strip_boilerplate

    got = (
        strip_boilerplate(_ds(texts), min_docs=min_docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _model_strip(texts, min_docs)
    assert got["text_clean"].tolist() == [w[0] for w in want]
    assert got["n_kept"].tolist() == [w[1] for w in want]
    assert got["n_dropped"].tolist() == [w[2] for w in want]


@settings(max_examples=6, deadline=None)
@given(texts=_CORPUS)
def test_dedup_lines_global_matches_model(texts):
    from raylink.ops.lines import dedup_lines_global

    got = (
        dedup_lines_global(_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _model_global(texts)
    assert got["text_clean"].tolist() == [w[0] for w in want]
    assert got["n_kept"].tolist() == [w[1] for w in want]
    assert got["n_dropped"].tolist() == [w[2] for w in want]


_EVENT = st.tuples(
    st.integers(min_value=0, max_value=4),          # user
    st.integers(min_value=0, max_value=15),         # second
    st.sampled_from(["a", "b", "c", "x"]),          # type
)


def _model_funnel(rows, steps):
    counts = []
    conv = None  # user -> conversion time of previous step
    for i, s in enumerate(steps):
        nxt = {}
        for u, t, ty in rows:
            if ty != s:
                continue
            if i > 0 and (u not in conv or t <= conv[u]):
                continue
            if u not in nxt or t < nxt[u]:
                nxt[u] = t
        conv = nxt
        counts.append(len(conv))
    return counts


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(_EVENT, min_size=1, max_size=25))
def test_funnel_matches_model(rows):
    from raylink.ops.window import funnel_counts

    tbl = pa.table(
        {
            "user_id": pa.array(
                np.asarray([r[0] for r in rows], dtype=np.int64)
            ),
            "ts": pa.array(
                [
                    pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=r[1])
                    for r in rows
                ],
                type=pa.timestamp("us"),
            ),
            "event_type": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    got = (
        funnel_counts(rd.from_arrow(tbl), ["a", "b", "c"])
        .to_pandas()
        .sort_values("step_idx")["n_users"]
        .tolist()
    )
    assert got == _model_funnel(rows, ["a", "b", "c"])
