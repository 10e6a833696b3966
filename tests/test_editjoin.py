"""edit_distance_self_join: completeness + exactness vs brute force."""

import numpy as np
import pyarrow as pa

import ray.data

from raylink.features import levenshtein_distance
from raylink.ops.editjoin import _row_poly_hash, edit_distance_self_join


def _mutate(rng, s, n_edits):
    for _ in range(n_edits):
        p = int(rng.integers(0, max(len(s), 1)))
        op = int(rng.integers(0, 3))
        if op == 0 and len(s) > 1:
            s = s[:p] + s[p + 1 :]
        elif op == 1:
            s = s[:p] + chr(97 + int(rng.integers(0, 26))) + s[p:]
        else:
            s = s[:p] + chr(97 + int(rng.integers(0, 26))) + s[p + 1 :]
    return s


def _brute(names, d):
    want = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if abs(len(names[i]) - len(names[j])) <= d and (
                levenshtein_distance(names[i].lower(), names[j].lower()) <= d
            ):
                want.add((i, j))
    return want


def test_matches_brute_force_incl_short_strings():
    rng = np.random.default_rng(2)
    base = ["linen", "navy lavender", "burnished chocolate",
            "midnight rose gold", "x", "ab", "almond antique metallic", ""]
    names = [_mutate(rng, base[i % len(base)], int(rng.integers(0, 4)))
             for i in range(300)]
    ids = np.arange(len(names), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "name": pa.array(names)})
    ).repartition(5)
    for d in (1, 2):
        out = edit_distance_self_join(ds, "name", "id", d=d).to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert got == _brute(names, d)
        assert len(out) == len(got)  # no duplicate pairs
        # reported distances are exact
        for a, b, lev in out.itertuples(index=False):
            assert levenshtein_distance(
                names[a].lower(), names[b].lower()
            ) == lev


def test_case_insensitive():
    names = ["Alpha Beta", "alpha beta", "ALPHA BETA"]
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(3, dtype=np.int64)),
                  "name": pa.array(names)})
    )
    out = edit_distance_self_join(ds, "name", "id", d=1).to_pandas()
    assert len(out) == 3 and (out["lev"] == 0).all()


def test_poly_hash_matches_vector_path():
    # the scalar fallback and the uint64 array recurrence must agree
    s = "burnished chocolate"
    arr = np.zeros((1, 32), dtype=np.uint16)
    arr[0, : len(s)] = np.frombuffer(s.encode("utf-16-le"), dtype=np.uint16)
    B = np.uint64(1099511628211)
    H = np.zeros(1, dtype=np.uint64)
    for t in range(len(s)):
        H = H * B + (arr[:, t].astype(np.uint64) + np.uint64(1))
    assert int(H.view(np.int64)[0]) == _row_poly_hash(s)
