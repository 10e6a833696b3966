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
