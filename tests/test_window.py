"""Window/as-of operator tests: each distributed kernel vs a plain-pandas
single-process replay of the declared semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylink.ops.window import asof_join, sessionize, window_aggregate


def _events(n=400, users=7, seed=3):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10 * 86400, size=n)), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, size=n).astype(np.int64),
            "ts": ts.astype("datetime64[us]"),
            "event_type": rng.choice(["click", "purchase", "view"], size=n),
            "value": np.round(rng.uniform(0, 200, size=n), 2),
        }
    )


def _sessionize_pandas(df, gap_s):
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    brk = df["user_id"].ne(df["user_id"].shift()) | (
        df["ts"].diff() > pd.Timedelta(seconds=gap_s)
    )
    sgrp = brk.cumsum()
    sess = df.groupby(sgrp)["event_id"].transform("min")
    return (
        pd.DataFrame(
            {"event_id": df["event_id"], "user_id": df["user_id"], "session_id": sess}
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def test_sessionize_matches_pandas():
    df = _events()
    got = (
        sessionize(rd.from_arrow(pa.Table.from_pandas(df)), 3600)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _sessionize_pandas(df, 3600))


def test_sessionize_gap_is_strict():
    # two events exactly gap apart stay in ONE session; gap+1us splits
    df = pd.DataFrame(
        {
            "event_id": np.array([0, 1, 2], dtype=np.int64),
            "user_id": np.array([5, 5, 5], dtype=np.int64),
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                 "2024-01-01 02:00:00.000001"], format="ISO8601"
            ).astype("datetime64[us]"),
        }
    )
    got = (
        sessionize(rd.from_arrow(pa.Table.from_pandas(df)), 3600)
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(got["session_id"]) == [0, 0, 2]


def test_window_aggregate_matches_pandas():
    df = _events()
    got = (
        window_aggregate(rd.from_arrow(pa.Table.from_pandas(df)), 86400)
        .to_pandas()
        .sort_values(["window_id", "event_type"])
        .reset_index(drop=True)
    )
    exp = (
        df.assign(
            window_id=df["ts"].astype("int64") // (86400 * 10**6),
            value_cents=np.rint(df["value"] * 100).astype(np.int64),
            n_events=1,
        )
        .groupby(["window_id", "event_type"], as_index=False)[
            ["n_events", "value_cents"]
        ]
        .sum()
        .sort_values(["window_id", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["window_id", "n_events", "value_cents"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    assert (got["event_type"].to_numpy() == exp["event_type"].to_numpy()).all()


def test_asof_join_matches_merge_asof():
    df = _events()
    right = df[df["event_type"] == "purchase"]
    got = (
        asof_join(
            rd.from_arrow(pa.Table.from_pandas(df[["event_id", "user_id", "ts"]])),
            rd.from_arrow(pa.Table.from_pandas(right)),
            "user_id",
            "ts",
            "ts",
            {"event_id": "prev_purchase_id"},
            allow_exact_matches=False,
            tie_cols=["event_id"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # global single-process replay of the same rule
    exp = pd.merge_asof(
        df[["event_id", "user_id", "ts"]].sort_values("ts", kind="stable"),
        right[["user_id", "ts", "event_id"]]
        .sort_values(["ts", "event_id"], kind="stable")
        .rename(columns={"event_id": "prev_purchase_id", "ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="user_id",
        direction="backward",
        allow_exact_matches=False,
    ).sort_values("event_id")
    a = got["prev_purchase_id"].fillna(-1).astype("int64").to_numpy()
    b = exp["prev_purchase_id"].fillna(-1).astype("int64").to_numpy()
    assert (a == b).all()
    # at least one matched and one unmatched row exercised
    assert (a == -1).any() and (a != -1).any()


def test_asof_join_forward_direction():
    df = _events(n=120, users=3)
    right = df[df["event_type"] == "click"]
    got = (
        asof_join(
            rd.from_arrow(pa.Table.from_pandas(df[["event_id", "user_id", "ts"]])),
            rd.from_arrow(pa.Table.from_pandas(right)),
            "user_id",
            "ts",
            "ts",
            {"event_id": "next_click_id"},
            direction="forward",
            allow_exact_matches=False,
            tie_cols=["event_id"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # brute-force: min-ts strictly-later click per user (ties -> pandas
    # forward rule keeps the FIRST row in (ts, id) order)
    def brute(row):
        c = right[(right["user_id"] == row.user_id) & (right["ts"] > row.ts)]
        if len(c) == 0:
            return -1
        c = c.sort_values(["ts", "event_id"], kind="stable")
        return int(c["event_id"].iloc[0])

    exp = [brute(r) for r in df[["event_id", "user_id", "ts"]].itertuples()]
    a = got["next_click_id"].fillna(-1).astype("int64").to_numpy()
    assert (a == np.array(exp)).all()


def test_hopping_window_matches_bruteforce():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raylink.ops.window import hopping_window_aggregate

    rng = np.random.default_rng(3)
    n = 500
    ts_us = rng.integers(0, 48 * 3600, n) * 1_000_000 + 1_700_000_000_000_000
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts_us, unit="us"),
            "event_type": rng.choice(["a", "b"], n),
            "value": rng.uniform(0, 10, n).round(2),
        }
    )
    width, hop = 7200, 1800  # 2h window hopping 30min -> 4 windows/event
    out = (
        hopping_window_aggregate(
            rd.from_pandas(df).repartition(4), width, hop
        )
        .to_pandas()
        .sort_values(["window_id", "event_type"])
        .reset_index(drop=True)
    )
    # brute force: explode each event into its windows
    rows = []
    for t, et, v in zip(ts_us, df["event_type"], df["value"]):
        hi = t // (hop * 1_000_000)
        lo = (t - width * 1_000_000) // (hop * 1_000_000) + 1
        for w in range(lo, hi + 1):
            rows.append((w, et, int(round(v * 100))))
    bf = (
        pd.DataFrame(rows, columns=["window_id", "event_type", "value_cents"])
        .groupby(["window_id", "event_type"], as_index=False)
        .agg(n_events=("value_cents", "size"), value_cents=("value_cents", "sum"))
    ).sort_values(["window_id", "event_type"]).reset_index(drop=True)
    assert (out["n_events"].to_numpy() == bf["n_events"].to_numpy()).all()
    assert (out["value_cents"].to_numpy() == bf["value_cents"].to_numpy()).all()
    assert len(out) == len(bf)


def test_hopping_window_rejects_non_divisible():
    import pytest
    import ray.data as rd

    from raylink.ops.window import hopping_window_aggregate

    with pytest.raises(ValueError):
        hopping_window_aggregate(rd.range(1), 100, 33)


def test_windowed_rank_million_rows():
    """ROW_NUMBER() semantics at 10^6 rows / 10^4 keys: one hash exchange,
    vectorized per-partition ranking; parity vs pandas groupby-cumcount."""
    from raylink.ops.window import windowed_rank

    n, n_users = 1_000_000, 10_000
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n) * 1_000_000, unit="us"
            ),
        }
    )
    out = (
        windowed_rank(
            rd.from_pandas(df).repartition(8), "user_id", ["ts", "event_id"]
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    want["rn"] = want.groupby("user_id", sort=False).cumcount() + 1
    want = want.sort_values("event_id").reset_index(drop=True)
    assert len(out) == n
    assert (out["rn"].to_numpy() == want["rn"].to_numpy()).all()
    assert (out["user_id"].to_numpy() == want["user_id"].to_numpy()).all()


def test_windowed_rank_string_keys():
    from raylink.ops.window import windowed_rank

    df = pd.DataFrame(
        {
            "k": ["a", "b", "a", "a", "b"],
            "v": np.array([3, 1, 1, 2, 2], dtype=np.int64),
        }
    )
    out = (
        windowed_rank(rd.from_pandas(df), "k", ["v"])
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert out["rn"].tolist() == [1, 2, 3, 1, 2]


def test_session_stats_matches_pandas_reference(ray_session):
    """session_stats (one-exchange per-entity roll-up) must equal the
    composition sessionize -> per-session agg -> per-user agg computed in
    pandas on the same events."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raylink.ops.window import session_stats

    rng = np.random.default_rng(11)
    n, n_users = 5000, 120
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 3 * 3600, n) * 1_000_000, unit="us"
            ),
        }
    )
    got = (
        session_stats(rd.from_arrow(pa.Table.from_pandas(df)), 600)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    # reference: same gap rule in plain pandas
    r = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    t = r["ts"].astype("int64") // 1000  # ns -> us
    brk = r["user_id"].ne(r["user_id"].shift()) | (
        t.diff() > 600 * 1_000_000
    )
    sgrp = brk.cumsum()
    per = r.assign(_t=t).groupby(sgrp).agg(
        u=("user_id", "first"), ne=("event_id", "size"),
        lo=("_t", "min"), hi=("_t", "max"),
    )
    per["dur"] = per["hi"] - per["lo"]
    want = (
        per.groupby("u")
        .agg(
            n_sessions=("ne", "size"),
            n_events=("ne", "sum"),
            total_duration_us=("dur", "sum"),
            max_session_events=("ne", "max"),
        )
        .reset_index()
        .rename(columns={"u": "user_id"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ["n_sessions", "n_events", "total_duration_us", "max_session_events"]:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert int(got["n_events"].sum()) == n


def test_range_join_matches_pandas_cross_filter():
    # hot keys on purpose: 40 users x 300 events each, so every (user,
    # band) group is dense and left rows straddle band boundaries
    rng = np.random.default_rng(5)
    n = 12_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime(rng.integers(0, 3_600_000, n), unit="ms"),
        }
    )
    from raylink.ops.window import range_join

    ds = rd.from_pandas(ev)
    got = (
        range_join(ds, ds, "user_id", "ts", "ts", 0.0, 60.0)
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    m = ev.merge(ev, on="user_id", suffixes=("_a", "_b"))
    dt = m.ts_b - m.ts_a
    keep = m[(dt > pd.Timedelta(0)) & (dt <= pd.Timedelta(seconds=60))]
    want = pd.DataFrame(
        {
            "left_id": keep.event_id_a,
            "user_id": keep.user_id,
            "right_id": keep.event_id_b,
            "dt_us": (keep.ts_b - keep.ts_a).astype("int64") // 1000,
        }
    ).sort_values(["left_id", "right_id"]).reset_index(drop=True)
    assert len(got) > 1000
    pd.testing.assert_frame_equal(got, want)


def test_range_join_bounds_and_ties():
    ev = pd.DataFrame(
        {
            "event_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "user_id": np.array([7, 7, 7, 7], dtype=np.int64),
            # 0s, 0s (tie), 1s, 61s
            "ts": pd.to_datetime([0, 0, 1000, 61_000], unit="ms"),
        }
    )
    from raylink.ops.window import range_join

    ds = rd.from_pandas(ev)
    got = (
        range_join(ds, ds, "user_id", "ts", "ts", 0.0, 60.0)
        .to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    # equal ts excluded (lower exclusive); 1->4 is exactly 60s (inclusive);
    # 0->61s excluded
    pairs = set(map(tuple, got[["left_id", "right_id"]].values.tolist()))
    assert pairs == {(1, 3), (2, 3), (3, 4)}


def test_sequence_agg_matches_duckdb_string_agg():
    import duckdb

    from raylink.ops.window import sequence_agg

    rng = np.random.default_rng(1)
    n = 20_000
    ev = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "user_id": rng.integers(0, 300, n),
            "ts": pd.to_datetime(rng.integers(0, 10_000_000, n), unit="ms"),
        }
    )
    got = (
        sequence_agg(rd.from_pandas(ev))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    got["user_id"] = got["user_id"].astype("int64")
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        """SELECT user_id, count(*)::BIGINT AS n,
                  string_agg(CAST(event_id AS VARCHAR), ','
                             ORDER BY ts, event_id) AS seq
           FROM events GROUP BY user_id ORDER BY user_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    assert int(got["n"].sum()) == n


def test_rolling_sum_matches_duckdb_window_frame():
    import duckdb

    from raylink.ops.window import rolling_sum

    rng = np.random.default_rng(41)
    n = 30_000
    ev = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "user_id": rng.integers(0, 200, n),
            "ts": pd.to_datetime(rng.integers(0, 10_000_000, n), unit="ms"),
            "value": rng.normal(0, 10, n),
        }
    )
    got = (
        rolling_sum(rd.from_pandas(ev), k=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got["user_id"] = got["user_id"].astype("int64")
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        """WITH q AS (SELECT event_id, user_id, ts,
                  CAST(ROUND(value*1000000) AS BIGINT) AS v6 FROM events)
           SELECT event_id, user_id,
                  COUNT(*) OVER w::BIGINT AS n_window,
                  SUM(v6) OVER w::BIGINT AS roll_sum_e6
           FROM q
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS 4 PRECEDING)
           ORDER BY event_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # head-of-entity windows shrink: n_window in [1, 5]
    assert got["n_window"].between(1, 5).all()


def test_basket_pairs_matches_bruteforce():
    from itertools import combinations

    from raylink.ops.window import basket_pairs

    rng = np.random.default_rng(5)
    n = 3000
    ts = pd.to_datetime(
        np.sort(rng.integers(0, 10**6, n)), unit="s"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "ts": ts,
            "event_type": rng.choice(list("abcdef"), n),
        }
    )
    got = (
        basket_pairs(rd.from_arrow(pa.Table.from_pandas(df)), 3600.0)
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    # brute force: sessionize per user, distinct items, pair count
    from collections import Counter

    c = Counter()
    for _, sub in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        brk = sub["ts"].diff() > pd.Timedelta(seconds=3600)
        for _, sess in sub.groupby(brk.cumsum()):
            for a, b in combinations(sorted(set(sess["event_type"])), 2):
                c[(a, b)] += 1
    exp = (
        pd.DataFrame(
            [(a, b, v) for (a, b), v in c.items()],
            columns=["item_a", "item_b", "n_sessions"],
        )
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_lead_lag_ntile_matches_duckdb():
    """LAG/LEAD/NTILE in one exchange vs DuckDB window functions, incl.
    NULLs at partition edges and the SQL NTILE uneven-bucket split."""
    import duckdb

    from raylink.ops.window import lead_lag

    rng = np.random.default_rng(13)
    n = 5000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 37, n).astype(np.int64),
            "t": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 10**6, n).astype(np.int64),
        }
    )
    got = (
        lead_lag(rd.from_pandas(df).repartition(4), "u", ["t"], "v",
                 lags=(1, 3), leads=(2,), ntile_n=5)
        .to_pandas()
        .sort_values(["u", "t"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        """
        SELECT u, t, v,
               LAG(v) OVER w AS lag_1, LAG(v, 3) OVER w AS lag_3,
               LEAD(v, 2) OVER w AS lead_2,
               CAST(NTILE(5) OVER w AS BIGINT) AS ntile
        FROM df WINDOW w AS (PARTITION BY u ORDER BY t)
        ORDER BY u, t
        """
    ).df()
    for c in ["lag_1", "lag_3", "lead_2"]:
        a = got[c].to_numpy(dtype=float)
        b = exp[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    assert (got["ntile"].to_numpy() == exp["ntile"].to_numpy()).all()
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()


def test_percent_rank_matches_pandas_windows():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raylink.ops.window import percent_rank

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 7, 200),
            "ts": rng.integers(0, 10_000, 200),
            "eid": np.arange(200, dtype=np.int64),
        }
    )
    got = (
        percent_rank(rd.from_pandas(df).repartition(4), "u", ["ts", "eid"])
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["u", "ts", "eid"]).copy()
    g = exp.groupby("u", sort=False)
    exp["rn"] = g.cumcount() + 1
    n = g["u"].transform("size")
    exp["pr_e6"] = np.where(n > 1, ((exp["rn"] - 1) * 1_000_000) // (n - 1).clip(lower=1), 0)
    exp["cd_e6"] = (exp["rn"] * 1_000_000) // n
    exp = exp.sort_values("eid").reset_index(drop=True)
    for c in ("rn", "pr_e6", "cd_e6"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    # singleton key edge: pr defined 0
    one = percent_rank(
        rd.from_pandas(pd.DataFrame({"u": [99], "ts": [1], "eid": [0]})),
        "u", ["ts", "eid"],
    ).to_pandas()
    assert one["pr_e6"].iloc[0] == 0 and one["cd_e6"].iloc[0] == 1_000_000
