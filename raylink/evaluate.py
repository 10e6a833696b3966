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
