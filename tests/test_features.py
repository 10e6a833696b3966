"""Kernel unit tests (SURVEY.md §2.8 F1-F8) — hand-computed values and
cross-checks against DuckDB's implementations where they exist."""

import duckdb
import numpy as np
import pytest

from raylink.features import (
    dot,
    jaro_winkler_sim,
    lcs_distance,
    osa_distance,
    pair_features_batch,
    qgram_cosine_distance,
    qgram_count_distance,
    qgram_jaccard_distance,
    soundex,
    soundex_distance,
)

JW_CASES = [
    ("martha", "marhta"),
    ("dwayne", "duane"),
    ("dixon", "dicksonx"),
    ("joe biden", "joseph robinette biden"),
    ("string_utils", "str_utils"),
    ("abc", "abc"),
    ("abc", "xyz"),
]


@pytest.mark.parametrize("a,b", JW_CASES)
def test_jw_matches_duckdb_above_boost_threshold(a, b):
    """With boost_threshold=0.7 our JW is bit-equal to DuckDB's."""
    expected = duckdb.sql(
        f"select jaro_winkler_similarity('{a}', '{b}')"
    ).fetchone()[0]
    assert jaro_winkler_sim(a, b, boost_threshold=0.7) == pytest.approx(
        expected, abs=1e-12
    )


def test_jw_stringdist_semantics_unconditional_boost():
    # jaro = 0.4444, prefix 1: stringdist applies the boost regardless
    assert jaro_winkler_sim("aXXXXX", "aYYYYY") == pytest.approx(
        0.4444444444444444 + 0.1 * 1 * (1 - 0.4444444444444444)
    )
    # equal strings
    assert jaro_winkler_sim("abc", "abc") == 1.0
    assert jaro_winkler_sim("", "") == 1.0
    assert jaro_winkler_sim("a", "") == 0.0


def test_osa():
    assert osa_distance("ca", "abc") == 3  # classic restricted-DL example
    assert osa_distance("abcd", "acbd") == 1  # one transposition
    assert osa_distance("kitten", "sitting") == 3
    assert osa_distance("", "abc") == 3
    assert osa_distance("abc", "abc") == 0


def test_lcs():
    # stringdist lcs = insert/delete-only edit distance
    assert lcs_distance("abc", "abc") == 0
    assert lcs_distance("abc", "axc") == 2  # drop b, add x
    assert lcs_distance("leia", "leela") == 3  # LCS('leia','leela') = 'lea'? -> lel? compute: LCS=3 ('lea'), 4+5-6=3
    assert lcs_distance("", "ab") == 2


def test_qgram_kernels():
    # q=1 profiles: 'ab' vs 'ab'
    assert qgram_count_distance("ab", "ab") == 0
    assert qgram_count_distance("aab", "ab") == 1
    assert qgram_jaccard_distance("abc", "bcd") == pytest.approx(1 - 2 / 4)
    # cosine: 'aa' vs 'a' profiles are parallel -> distance 0
    assert qgram_cosine_distance("aa", "a") == pytest.approx(0.0)
    assert qgram_cosine_distance("ab", "cd") == pytest.approx(1.0)


def test_soundex():
    assert soundex("robert") == "R163"
    assert soundex("rupert") == "R163"
    assert soundex("ashcraft") == "A261"  # h/w skip rule
    assert soundex("tymczak") == "T522"
    assert soundex("pfister") == "P236"
    assert soundex_distance("robert", "rupert") == 0
    assert soundex_distance("robert", "smith") == 1


def test_dot():
    assert dot([0, 1], [1, 0]) == 0.0
    assert dot([1, 2, 3], [4, 5, 6]) == 32.0


def test_pair_features_batch():
    out = pair_features_batch(
        np.array(["Martha", "abc"], dtype=object),
        np.array(["MARHTA", "abc"], dtype=object),
        full=True,
    )
    # lowercased before kernels (R/fuzzylink.R:174)
    assert out["jw"][0] == pytest.approx(jaro_winkler_sim("martha", "marhta"))
    assert out["jw"][1] == 1.0
    assert out["osa"][1] == 0.0
    assert out["soundex"][0] == 0.0
    assert set(out) == {"jw", "osa", "cosine", "jaccard", "lcs", "qgram", "soundex"}


def test_monge_elkan_matches_scalar_reference():
    from raylink.features import jaro_winkler_sim, monge_elkan_sum_e6

    a = ["john r smith", "mary jane", "", "solo", "a a b"]
    b = ["jon smith jr", "maryjane doe", "x y", "solo", "a"]
    sums, ntok = monge_elkan_sum_e6(a, b)
    for i, (x, y) in enumerate(zip(a, b)):
        ta, tb = x.lower().split(), y.lower().split()
        exp = sum(
            round(
                1e6 * max((jaro_winkler_sim(t, u, 0.1, 0.7) for u in tb),
                          default=0.0)
            )
            for t in ta
        )
        assert sums[i] == exp
        assert ntok[i] == len(ta)
    # repeated token counts once per occurrence: "a a b" vs "a"
    assert sums[4] == 2_000_000 + round(1e6 * jaro_winkler_sim("b", "a", 0.1, 0.7))


def test_lev_cross_matches_scalar_and_duckdb():
    """Pair-axis vectorized Levenshtein == scalar DP == DuckDB, including
    empty strings, transposition cases (lev != OSA), and a long-string
    scalar-fallback row."""
    import random

    from raylink.features import lev_cross, levenshtein_distance

    rng = random.Random(11)
    alpha = "abcde #"
    A = ["", "ab", "ba"] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for _ in range(40)
    ] + ["x" * 80]  # > _JW_CAP → scalar fallback path
    B = ["", "ba"] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for _ in range(30)
    ]
    na, nb = len(A), len(B)
    ai = np.repeat(np.arange(na), nb)
    bi = np.tile(np.arange(nb), na)
    got = lev_cross(A, B, ai, bi)
    con = duckdb.connect()
    for k in range(len(ai)):
        a, b = A[ai[k]], B[bi[k]]
        exp = con.sql("select levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert got[k] == exp == levenshtein_distance(a, b), (a, b)
    # transposition: plain lev counts 2, OSA counts 1
    assert levenshtein_distance("ab", "ba") == 2
    assert osa_distance("ab", "ba") == 1


def test_charset_jaccard_cross_matches_duckdb():
    from raylink.features import charset_jaccard_cross

    A = ["night", "abc", "aab", "customer#0001"]
    B = ["nacht", "abd", "ab", "supplier#0009"]
    ai = np.repeat(np.arange(4), 4)
    bi = np.tile(np.arange(4), 4)
    got = charset_jaccard_cross(A, B, ai, bi)
    con = duckdb.connect()
    for k in range(len(ai)):
        a, b = A[ai[k]], B[bi[k]]
        exp = con.sql("select jaccard(?, ?)", params=[a, b]).fetchone()[0]
        assert got[k] == exp, (a, b)
    # empty-vs-empty is 1.0, empty-vs-nonempty 0.0 (DuckDB raises on these)
    assert charset_jaccard_cross([""], [""], np.array([0]), np.array([0]))[0] == 1.0
    assert charset_jaccard_cross([""], ["a"], np.array([0]), np.array([0]))[0] == 0.0


def test_damerau_cross_matches_scalar_and_duckdb():
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner): vectorized ==
    scalar == DuckDB, incl. the ca->abc=2 drifting-transposition case
    where OSA says 3, empty strings, and the scalar-fallback row."""
    import random

    from raylink.features import damerau_cross, damerau_distance

    rng = random.Random(29)
    alpha = "abcd #"
    A = ["", "ca", "ab", "x" * 80] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for _ in range(35)
    ]
    B = ["", "abc", "ba"] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for _ in range(30)
    ]
    na, nb = len(A), len(B)
    ai = np.repeat(np.arange(na), nb)
    bi = np.tile(np.arange(nb), na)
    got = damerau_cross(A, B, ai, bi, chunk=300)
    con = duckdb.connect()
    for k in range(len(ai)):
        a, b = A[ai[k]], B[bi[k]]
        exp = con.sql(
            "select damerau_levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert got[k] == exp == damerau_distance(a, b), (a, b)
    assert damerau_distance("ca", "abc") == 2
    assert osa_distance("ca", "abc") == 3


def test_token_sort_ratio_word_order_invariant():
    import numpy as np

    from raylink.features import token_sort_ratio_cross

    a = ["john doe", "red small widget", ""]
    b = ["doe john", "widget small red", ""]
    ai = np.arange(3)
    bi = np.arange(3)
    got = token_sort_ratio_cross(a, b, ai, bi)
    assert (got == 1_000_000).all()
    # differing strings score < 1e6 and match the manual formula
    g2 = token_sort_ratio_cross(["abc def"], ["abd def"], np.array([0]), np.array([0]))
    # canonical 'abc def' vs 'abd def': lev=1, maxlen=7 -> (7-1)*1e6//7
    assert g2[0] == 6 * 1_000_000 // 7


def test_trigram_similarity_padding_and_identity():
    import numpy as np

    from raylink.features import trigram_similarity_cross

    same = trigram_similarity_cross(["cat"], ["cat"], np.array([0]), np.array([0]))
    assert same[0] == 1_000_000
    # 'cat' padded '  cat ': grams {'  c',' ca','cat','at '}; 'cap' ->
    # {'  c',' ca','cap','ap '}; inter=2, union=6
    g = trigram_similarity_cross(["cat"], ["cap"], np.array([0]), np.array([0]))
    assert g[0] == 2 * 1_000_000 // 6
    none = trigram_similarity_cross(["cat"], ["dog"], np.array([0]), np.array([0]))
    assert none[0] < 350_000


def test_nw_cross_matches_scalar_and_classic_example():
    import numpy as np

    from raylink.features import nw_cross, nw_score

    assert nw_score("gattaca", "gcatgcu") == 0  # the textbook instance
    rng = np.random.default_rng(9)
    import string

    pool = string.ascii_lowercase[:6]
    A = ["".join(rng.choice(list(pool), rng.integers(0, 9))) for _ in range(30)]
    B = ["".join(rng.choice(list(pool), rng.integers(0, 9))) for _ in range(30)]
    ai = np.repeat(np.arange(30), 30)
    bi = np.tile(np.arange(30), 30)
    got = nw_cross(A, B, ai, bi, match=2, mismatch=-3, gap=-2)
    exp = np.array(
        [nw_score(A[i], B[j], 2, -3, -2) for i, j in zip(ai, bi)], dtype=np.int64
    )
    assert (got == exp).all()
