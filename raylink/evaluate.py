"""Pairwise-F1 evaluation at a fixed blocking key (BASELINE.json metric).

Predicted = the engine's accepted (block, key_a, key_b) pairs; truth = the
fixture's labeled string pairs at the same blocking key. F1 is computed over
the 'Yes'-labeled truth pairs (positives) with the labeled 'No' pairs as
explicit hard negatives; accepted pairs outside the labeled set are ignored,
matching "F1 on labeled pairs" (BASELINE.md).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pairwise_f1(
    accepted: pd.DataFrame,
    truth: pa.Table,
    block_col: str = "lang",
) -> dict:
    tdf = truth.to_pandas()
    pos = {
        (b, a, c)
        for b, a, c in zip(tdf[block_col], tdf["key_a"], tdf["key_b"])
        if True
    }
    yes = {
        (r[block_col], r["key_a"], r["key_b"])
        for _, r in tdf[tdf["label"] == "Yes"].iterrows()
    }
    no = {
        (r[block_col], r["key_a"], r["key_b"])
        for _, r in tdf[tdf["label"] == "No"].iterrows()
    }
    pred = {
        (b, a, c)
        for b, a, c in zip(accepted["block"], accepted["key_a"], accepted["key_b"])
    }
    pred_labeled = pred & (yes | no)
    tp = len(pred_labeled & yes)
    fp = len(pred_labeled & no)
    fn = len(yes - pred)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (
        2 * precision * recall / (precision + recall) if precision + recall else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_truth_yes": len(yes),
        "n_pred": len(pred),
    }


def blocking_quality(
    candidates,
    truth,
    n_records: int,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Standard blocking-scheme evaluation (Christen 2012): REDUCTION
    RATIO ``1 − |candidates| / (n·(n−1)/2)`` (how much of the quadratic
    comparison space the blocker prunes) and PAIRS COMPLETENESS
    ``|truth ∩ candidates| / |truth|`` (how many true matches survive the
    pruning). Both Datasets hold ``(id_a, id_b)`` with ``id_a < id_b``.

    Distributed shape: two streaming counts plus ONE hash-partitioned
    shuffle join whose merge emits a single partial count per partition —
    the intersection itself never materializes anywhere. Ratios are
    reported in integer micro-units via FLOOR division ((10^6·x) // y),
    so a SQL gate replays them with integer arithmetic — no float
    rounding seam.

    Returns one row: (n_candidates, n_truth, n_covered, total_pairs,
    reduction_ratio_e6, pairs_completeness_e6).
    """
    import pyarrow as _pa

    from raylink.util import shuffle_merge

    n_cand = candidates.count()
    n_truth = truth.count()
    pair_schema = _pa.schema([("id_a", _pa.int64()), ("id_b", _pa.int64())])
    cnt_schema = _pa.schema([("n", _pa.int64())])

    def _count(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        n = len(ldf.merge(rdf, on=["id_a", "id_b"], how="inner"))
        return pd.DataFrame({"n": [n]})

    partials = shuffle_merge(
        candidates.select_columns(["id_a", "id_b"]),
        truth.select_columns(["id_a", "id_b"]),
        ["id_a", "id_b"], ["id_a", "id_b"],
        _count, cnt_schema,
        num_partitions=num_partitions,
        left_schema=pair_schema, right_schema=pair_schema,
    )
    n_covered = int(partials.to_pandas()["n"].sum())
    total = n_records * (n_records - 1) // 2
    return pd.DataFrame(
        {
            "n_candidates": [n_cand],
            "n_truth": [n_truth],
            "n_covered": [n_covered],
            "total_pairs": [total],
            "reduction_ratio_e6": [
                (1_000_000 * (total - n_cand)) // total if total else 0
            ],
            "pairs_completeness_e6": [
                (1_000_000 * n_covered) // n_truth if n_truth else 1_000_000
            ],
        },
        dtype="int64",
    )


def bcubed_evidence(
    assign: "ray.data.Dataset",
    cluster_col: str = "cluster_id",
    truth_col: str = "truth_id",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distributed B-cubed evaluation evidence for an entity-resolution
    assignment table ``(id, cluster, truth)``: per RECORD, the exact
    integer triple ``(n_both, n_cluster, n_truth)`` — the size of the
    record's (cluster ∩ truth-class) cell, its predicted cluster, and its
    truth class. B³ precision/recall are then driver-side means of the
    per-record rationals (``mean(n_both/n_cluster)``,
    ``mean(n_both/n_truth)``); emitting the integers instead of the means
    keeps the operator inside the bit-exact SQL gate (no float summation)
    and lets callers reweight (macro/micro) without a second pass.

    Two hash exchanges, no corpus-scale driver state:
    1. route by CLUSTER — a cluster's (cluster, truth) cells nest inside
       it, so one vectorized factorize per partition yields every
       record's ``n_both`` and ``n_cluster``;
    2. route by TRUTH — attaches ``n_truth`` the same way.
    Skew bound: the hottest cluster / truth class must fit a partition
    (the sessionize contract)."""
    import numpy as np
    import ray.data  # noqa: F401

    from raylink.ops.dedup import _default_partitions, _mix64
    from raylink.util import pa_type, sorted_partition_apply

    P = np.uint64(1 << 31)
    nparts = num_partitions or _default_partitions()
    schema = assign.schema()
    types = dict(zip(schema.names, (pa_type(t) for t in schema.types)))

    def _tag(col):
        def _t(batch: pa.Table) -> pa.Table:
            keys = batch.column(col).to_numpy(zero_copy_only=False)
            pid = (_mix64(keys.astype(np.uint64)) % P).astype(np.int64)
            # strip pandas metadata: blocks carrying the b'pandas' blob
            # defeat the executor's schema hash (unhashable-dict warning)
            return batch.append_column(
                "_pid", pa.array(pid)
            ).replace_schema_metadata(None)

        return _t

    def _cell_counts(part: pa.Table) -> pa.Table:
        cl = part.column(cluster_col).to_numpy(zero_copy_only=False)
        tr = part.column(truth_col).to_numpy(zero_copy_only=False)
        ccodes, _ = pd.factorize(cl, sort=False)
        tcodes, _ = pd.factorize(tr, sort=False)
        cell, _ = pd.factorize(
            ccodes.astype(np.int64) * (tcodes.max() + 1) + tcodes, sort=False
        )
        n_both = np.bincount(cell)[cell]
        n_cl = np.bincount(ccodes)[ccodes]
        return pa.table(
            {
                id_col: part.column(id_col),
                truth_col: part.column(truth_col),
                "n_both": pa.array(n_both.astype(np.int64)),
                "n_cluster": pa.array(n_cl.astype(np.int64)),
            }
        )

    def _truth_counts(part: pa.Table) -> pa.Table:
        tr = part.column(truth_col).to_numpy(zero_copy_only=False)
        tcodes, _ = pd.factorize(tr, sort=False)
        n_tr = np.bincount(tcodes)[tcodes]
        return pa.table(
            {
                id_col: part.column(id_col),
                "n_both": part.column("n_both"),
                "n_cluster": part.column("n_cluster"),
                "n_truth": pa.array(n_tr.astype(np.int64)),
            }
        )

    s1 = pa.schema(
        [
            (id_col, types[id_col]),
            (truth_col, types[truth_col]),
            ("n_both", pa.int64()),
            ("n_cluster", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            (id_col, types[id_col]),
            ("n_both", pa.int64()),
            ("n_cluster", pa.int64()),
            ("n_truth", pa.int64()),
        ]
    )
    stage1 = sorted_partition_apply(
        assign.map_batches(_tag(cluster_col), batch_format="pyarrow")
        .repartition(nparts),
        "_pid",
        _cell_counts,
        s1,
    )
    return sorted_partition_apply(
        stage1.map_batches(_tag(truth_col), batch_format="pyarrow")
        .repartition(nparts),
        "_pid",
        _truth_counts,
        out_schema,
    )


def pr_curve(
    pairs: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    thresholds: list[int],
    final_partitions: int | None = None,
) -> pd.DataFrame:
    """Precision/recall/F1 sweep over a scored pair table — the cutoff
    diagnostic behind the flagship's expected-F1 rule (`get_cutoff`,
    reference R/fuzzylink.R:344-371 picks ONE operating point; this
    operator reports the whole curve so a user can audit the trade-off).

    Input: a Dataset with an integer score column (micro-units, the repo
    convention) and a boolean truth column. ``thresholds`` is an
    ascending list of ints in the same units; at threshold ``t`` a pair
    is predicted positive iff ``score >= t``. Output: one pandas row per
    threshold with exact integer counts ``(n_pred, tp, fp, fn)`` and
    floor-division micro-unit metrics ``precision_e6 = tp*1e6 // n_pred``,
    ``recall_e6``, ``f1_e6 = 2*tp*1e6 // (n_pred + n_pos)`` — integer
    arithmetic end-to-end so a SQL oracle replays it bit-exact.

    Scale shape: ONE map-only pass — each batch bin-counts its scores
    into the ``len(thresholds)+1`` inter-threshold buckets (split by
    truth) via ``np.searchsorted`` + ``bincount`` — then a
    bucket-cardinality groupby-sum; the driver sees ≤ T+1 rows and
    finishes with suffix sums. No sort, no pair-scale exchange, nothing
    proportional to the input ever leaves the tasks."""
    import numpy as np
    from ray.data.aggregate import Sum

    thr = np.asarray(sorted(thresholds), dtype=np.int64)
    if len(thr) == 0:
        raise ValueError("need at least one threshold")
    nb = len(thr) + 1

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False)
        y = batch.column(label_col).to_numpy(zero_copy_only=False).astype(bool)
        b = np.searchsorted(thr, np.asarray(s, dtype=np.int64), side="right")
        n = np.bincount(b, minlength=nb).astype(np.int64)
        npos = np.bincount(b[y], minlength=nb).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(nb, dtype=np.int64)),
                "n": pa.array(n),
                "n_pos": pa.array(npos),
            }
        )

    agg = (
        pairs.map_batches(_partial, batch_format="pyarrow")
        .repartition(final_partitions or 1)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
        .to_pandas()
        .set_index("bucket")
        .reindex(range(nb), fill_value=0)
    )
    n = agg["n"].to_numpy(dtype=np.int64)
    npos = agg["n_pos"].to_numpy(dtype=np.int64)
    total_pos = int(npos.sum())
    # suffix sums: bucket b holds scores in [thr[b-1], thr[b]) — predicted
    # positive at threshold index i are exactly the buckets > i
    pred = np.cumsum(n[::-1])[::-1]
    tp = np.cumsum(npos[::-1])[::-1]
    rows = []
    for i, t in enumerate(thr.tolist()):
        p_, tp_ = int(pred[i + 1]), int(tp[i + 1])
        rows.append(
            {
                "thr": t,
                "n_pred": p_,
                "tp": tp_,
                "fp": p_ - tp_,
                "fn": total_pos - tp_,
                "precision_e6": (tp_ * 1_000_000) // p_ if p_ else 0,
                "recall_e6": (tp_ * 1_000_000) // total_pos if total_pos else 0,
                "f1_e6": (2 * tp_ * 1_000_000) // (p_ + total_pos)
                if (p_ + total_pos)
                else 0,
            }
        )
    return pd.DataFrame(rows)


def pairwise_cluster_metrics(
    assign: "ray.data.Dataset",
    cluster_col: str = "cluster_id",
    truth_col: str = "truth_id",
    final_partitions: int | None = None,
) -> "pd.DataFrame":
    """Pairwise precision/recall/F1 of a clustering against truth classes
    — THE metric the north rule scores the linkage on (pairwise F1 over
    labeled pairs), computed distributed and in exact integers:

    * ``tp``          = Σ over (cluster, truth) cells of C(n_ct, 2)
    * ``pred_pairs``  = Σ over clusters of C(n_c, 2)
    * ``truth_pairs`` = Σ over truth classes of C(n_t, 2)
    * precision/recall/f1 cross as e6 micro-units with the repo's floor
      convention (``f1_e6 = 2·tp·10⁶ // (pred_pairs + truth_pairs)``).

    Scale shape: ONE data pass builds per-batch (cluster, truth)
    value-count partials; one groupby-sum yields the contingency table
    (result-cardinality, ≤ #clusters × #classes rows); the two marginals
    re-aggregate THAT table, never the data (the cube_agg shape). The
    driver sees three int64 scalars. C(n,2) is computed in int64 — the
    same width (and the same overflow point) as the BIGINT oracle.
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "c": batch.column(cluster_col),
                "t": batch.column(truth_col),
            }
        ).to_pandas()
        g = df.groupby(["c", "t"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ct = assign.map_batches(_partial, batch_format="pyarrow")
    if final_partitions is not None:
        ct = ct.repartition(final_partitions)
    ct = ct.groupby(["c", "t"]).aggregate(Sum("n", alias_name="n")).materialize()

    def _pairs_of(col: str) -> int:
        if col == "":
            src = ct
        else:
            src = ct.groupby(col).aggregate(Sum("n", alias_name="n"))

        def _c2(t: pa.Table) -> pa.Table:
            n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"p": pa.array(n * (n - 1) // 2)})

        from raylink.util import skip_empty

        total = src.map_batches(skip_empty(_c2), batch_format="pyarrow").sum("p")
        return int(total or 0)

    tp = _pairs_of("")
    pred_pairs = _pairs_of("c")
    truth_pairs = _pairs_of("t")
    prec = (tp * 10**6) // pred_pairs if pred_pairs else 0
    rec = (tp * 10**6) // truth_pairs if truth_pairs else 0
    f1 = (
        (2 * tp * 10**6) // (pred_pairs + truth_pairs)
        if (pred_pairs + truth_pairs)
        else 0
    )
    return pd.DataFrame(
        {
            "tp": [tp],
            "pred_pairs": [pred_pairs],
            "truth_pairs": [truth_pairs],
            "precision_e6": [prec],
            "recall_e6": [rec],
            "f1_e6": [f1],
        }
    )


def adjusted_rand(
    assign: "ray.data.Dataset",
    cluster_col: str = "cluster_id",
    truth_col: str = "truth_id",
    final_partitions: int | None = None,
) -> "pd.DataFrame":
    """Adjusted Rand Index between a predicted clustering and truth
    classes, as EXACT integers (Hubert & Arabie 1985):

    ``ARI = (S_ij - S_a·S_b/T) / ((S_a+S_b)/2 - S_a·S_b/T)``

    with ``S_ij = Σ C(n_ij,2)`` over contingency cells, ``S_a``/``S_b``
    the marginal pair sums and ``T = C(n,2)``. Cleared of denominators it
    is the integer rational ``ari_num / ari_den`` with

    * ``ari_num = 2·(T·S_ij − S_a·S_b)``
    * ``ari_den = T·(S_a+S_b) − 2·S_a·S_b``

    computed in arbitrary-precision Python int on four int64 scalars (the
    products stay within BIGINT through ~50k rows, so the SQL oracle
    replays them exactly). ``ari_e6`` is the e6 fixed-point quotient with
    TRUNCATION toward zero — DuckDB's ``//`` convention, which differs
    from Python's floor for negative ARIs (independent clusterings can
    land epsilon-negative).

    Scale shape: identical to :func:`pairwise_cluster_metrics` — ONE data
    pass of (cluster, truth) value-count partials, one groupby-sum to the
    cell table, marginals re-aggregated from THAT table; the driver sees
    four integers. Rows with null in either column are excluded from n
    (document to callers: drop or impute upstream).
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    from raylink.util import skip_empty

    def _partial(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {"c": batch.column(cluster_col), "t": batch.column(truth_col)}
        ).to_pandas().dropna()
        g = df.groupby(["c", "t"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ct = assign.map_batches(skip_empty(_partial), batch_format="pyarrow")
    if final_partitions is not None:
        ct = ct.repartition(final_partitions)
    ct = ct.groupby(["c", "t"]).aggregate(Sum("n", alias_name="n")).materialize()

    def _c2_sum(src) -> int:
        def _c2(t: pa.Table) -> pa.Table:
            n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"p": pa.array(n * (n - 1) // 2)})

        return int(src.map_batches(skip_empty(_c2), batch_format="pyarrow").sum("p") or 0)

    s_ij = _c2_sum(ct)
    s_a = _c2_sum(ct.groupby("c").aggregate(Sum("n", alias_name="n")))
    s_b = _c2_sum(ct.groupby("t").aggregate(Sum("n", alias_name="n")))
    n_rows = int(ct.sum("n") or 0)
    total = n_rows * (n_rows - 1) // 2

    num = 2 * (total * s_ij - s_a * s_b)
    den = total * (s_a + s_b) - 2 * s_a * s_b
    if den:
        q, r = divmod(1_000_000 * num, den)
        ari_e6 = q + (1 if (r != 0 and q < 0) else 0)  # trunc toward zero
    else:
        # both clusterings are all-singletons or one cluster: ARI defined 1
        ari_e6 = 1_000_000
        num, den = 1, 1
    return pd.DataFrame(
        {
            "n_rows": [n_rows],
            "sum_pairs_cells": [s_ij],
            "pred_pairs": [s_a],
            "truth_pairs": [s_b],
            "total_pairs": [total],
            "ari_num": [num],
            "ari_den": [den],
            "ari_e6": [ari_e6],
        }
    ).astype(np.int64)
