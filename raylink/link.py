"""Distributed scoring, acceptance filter and payload join-back
(SURVEY.md §2.2 M8/M9, §2.4 J7; reference ``R/fuzzylink.R:378-391,461-481``).

The learner's exported state (glm coefficients) and the oracle-label dict
(bounded by ``max_labels``) are broadcast once via ``ray.put`` and applied in
stateless vectorized ``map_batches`` over the streamed pair set — the full
pair stream is scored and filtered without ever materializing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raylink.learner import predict_from_state


def score_pairs(
    pairs: ray.data.Dataset,
    model_state_ref: "ray.ObjectRef",
    labels_ref: "ray.ObjectRef",
    feature_cols: list[str],
) -> ray.data.Dataset:
    """Append ``match`` (broadcast oracle labels; exact pairs forced 'Yes',
    R/fuzzylink.R:193-199) and ``match_probability`` (model scores; exact
    pairs forced 1.0, R/fuzzylink.R:391)."""

    # Stateless task stage: model coefficients + label dict are broadcast
    # refs, read zero-copy from the object store per task.
    def _score(batch: pa.Table) -> pa.Table:
        state = ray.get(model_state_ref)
        labels: dict[tuple[str, str], str] = ray.get(labels_ref)
        n = len(batch)
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False) for c in feature_cols]
        )
        probs = predict_from_state(state, X)
        exact = pc.equal(batch.column("key_a"), batch.column("key_b"))
        exact_np = exact.to_numpy(zero_copy_only=False)
        probs = np.where(exact_np, 1.0, probs)
        if labels:
            ka = batch.column("key_a").to_pylist()
            kb = batch.column("key_b").to_pylist()
            match = [
                "Yes" if e else labels.get((a, b))
                for a, b, e in zip(ka, kb, exact_np)
            ]
            match_arr = pa.array(match, type=pa.string())
        else:
            # vectorized fast path: only exact pairs carry a label
            match_arr = pc.if_else(exact, pa.scalar("Yes"), pa.scalar(None, pa.string()))
        batch = batch.append_column("match", match_arr)
        return batch.append_column(
            "match_probability", pa.array(probs, type=pa.float64())
        )

    return pairs.map_batches(_score, batch_format="pyarrow", batch_size=16384)


def accept_filter(scored: ray.data.Dataset, cutoff: float) -> ray.data.Dataset:
    """M9 (R/fuzzylink.R:471-474): keep pairs labeled 'Yes', or unlabeled
    with probability above the cutoff."""

    def _acc(batch: pa.Table) -> pa.Table:
        match = batch.column("match")
        prob = batch.column("match_probability")
        is_yes = pc.equal(match, "Yes")
        is_yes = pc.fill_null(is_yes, False)
        unl_hi = pc.and_(pc.is_null(match), pc.greater(prob, cutoff))
        return batch.filter(pc.or_(is_yes, unl_hi))

    return scored.map_batches(_acc, batch_format="pyarrow")


def join_payloads(
    accepted_df: "pd.DataFrame",
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    by: str,
    a_cols: list[str],
    b_cols: list[str],
) -> ray.data.Dataset:
    """J7 (R/fuzzylink.R:475-480): ``right_join(dfA)`` then
    ``left_join(dfB)``, both many-to-many — expressed as two *broadcast*
    map-side joins keyed on the accepted pair set, streaming over dfA:

    1. the slim accepted pairs (post-filter, bounded by the label budget's
       reach) are broadcast via ``ray.put`` and pandas-merged into each dfA
       batch (left merge ⇒ every dfA row survives, NA-padded — the
       reference's ``right_join`` semantics);
    2. only the dfB rows actually referenced by an accepted pair are needed
       — a broadcast semi-join filters dfB down to that small subset, which
       is collected and merged in as the B payload (suffix ``_b`` on
       collisions).

    No shuffle touches the big tables. (``Dataset.join`` is avoided
    deliberately: Ray 2.49's hash join crashes on sparse sides — see
    ``util.hash_join``.)

    ``ds_a`` / ``ds_b`` must already carry their ``block`` column.
    """
    import pandas as pd

    pair_cols = list(accepted_df.columns)
    clash = (set(pair_cols) - {"block"}) & set(a_cols)
    if clash:
        raise ValueError(f"dfA column(s) {sorted(clash)} collide with pair columns")

    acc_ref = ray.put(accepted_df)

    # -- 2a. semi-join filter of dfB to referenced (key_b, block) ----------
    # composite "key\x1fblock" value set built ONCE, broadcast, matched with
    # the vectorized pc.is_in kernel (no per-row membership loop)
    needed_b = ray.put(
        pa.array(
            sorted(
                {
                    f"{k}\x1f{blk}"
                    for k, blk in zip(accepted_df["key_b"], accepted_df["block"])
                }
            )
        )
    )

    def _b_filter(batch: pa.Table) -> pa.Table:
        value_set: pa.Array = ray.get(needed_b)
        composite = pc.binary_join_element_wise(
            pc.cast(batch.column(by), pa.string()),
            pc.cast(batch.column("block"), pa.string()),
            "\x1f",
        )
        return batch.filter(pc.is_in(composite, value_set=value_set))

    b_subset = ds_b.map_batches(_b_filter, batch_format="pyarrow").to_pandas()
    b_subset = b_subset.drop_duplicates()
    rename = {c: f"{c}_b" for c in b_subset.columns if c not in (by, "block") and c in b_cols}
    b_subset = b_subset.rename(columns=rename)
    b_ref = ray.put(b_subset)

    def _attach(batch: pd.DataFrame) -> pd.DataFrame:
        acc: pd.DataFrame = ray.get(acc_ref)
        bpay: pd.DataFrame = ray.get(b_ref)
        out = batch.merge(
            acc, how="left", left_on=[by, "block"], right_on=["key_a", "block"]
        )
        if "key_a" in out.columns:
            out = out.drop(columns=["key_a"])
        out = out.merge(
            bpay,
            how="left",
            left_on=["key_b", "block"],
            right_on=[by, "block"],
            suffixes=("", "_bk"),
        )
        dup = [c for c in out.columns if c.endswith("_bk")]
        if dup:
            out = out.drop(columns=dup)
        return out

    return ds_a.map_batches(_attach, batch_format="pandas")


def join_payloads_distributed(
    accepted: ray.data.Dataset,
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    by: str,
    a_cols: list[str],
    b_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """J7 at scale: the same ``right_join(dfA)`` → ``left_join(dfB)``
    semantics as :func:`join_payloads`, but with the accepted pair set kept
    a **Dataset end-to-end** — no driver collection, no broadcast of the
    accepted table (which is cutoff-bounded, not label-budget-bounded, and
    reached 6.7M rows at bench scale).

    Two hash-partitioned shuffle joins (``util.shuffle_merge``; Ray 2.49's
    built-in join is unusable on sparse sides):

    1. ``ds_a ⟕ accepted`` on ``(by, block)=(key_a, block)`` — every dfA
       row survives (the reference's ``right_join`` means dfA-complete);
    2. result ``⟕ ds_b`` on ``(key_b, block)=(by, block)``, dfB payload
       columns suffixed ``_b``; duplicate full dfB rows collapse per
       partition exactly as the broadcast path's ``drop_duplicates``.

    Each join is ONE all-to-all exchange; per-partition merges are
    vectorized pandas hash joins. Output schema matches
    :func:`join_payloads` exactly.
    """
    import pyarrow as pa

    from raylink.util import shuffle_merge

    acc_schema = accepted.schema()
    pair_fields = [
        (n, t)
        for n, t in zip(acc_schema.names, acc_schema.types)
        if n not in ("key_a", "block")
    ]
    a_schema = ds_a.schema()
    a_fields = list(zip(a_schema.names, a_schema.types))

    s1_schema = pa.schema(a_fields + pair_fields)

    def _m1(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out = ldf.merge(
            rdf, how="left", left_on=[by, "block"], right_on=["key_a", "block"]
        )
        return out.drop(columns=["key_a"])

    stage1 = shuffle_merge(
        ds_a, accepted, [by, "block"], ["key_a", "block"], _m1, s1_schema,
        num_partitions=num_partitions,
        left_schema=a_schema, right_schema=acc_schema,
    )

    b_schema = ds_b.schema()
    b_fields = [
        (f"{c}_b" if c not in (by, "block") and c in b_cols else c, t)
        for c, t in zip(b_schema.names, b_schema.types)
    ]
    rename_b = {c: n for (c, _), (n, _) in zip(zip(b_schema.names, b_schema.types), b_fields) if n != c}
    ds_b_renamed = ds_b.rename_columns(rename_b) if rename_b else ds_b

    s2_schema = pa.schema(
        a_fields + pair_fields + [(n, t) for n, t in b_fields if n not in (by, "block")]
    )

    def _m2(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        rdf = rdf.drop_duplicates()
        out = ldf.merge(
            rdf,
            how="left",
            left_on=["key_b", "block"],
            right_on=[by, "block"],
            suffixes=("", "_bk"),
        )
        dup = [c for c in out.columns if c.endswith("_bk")]
        return out.drop(columns=dup) if dup else out

    return shuffle_merge(
        stage1, ds_b_renamed, ["key_b", "block"], [by, "block"], _m2, s2_schema,
        num_partitions=num_partitions,
        left_schema=s1_schema,
        right_schema=pa.schema([(n, t) for n, t in b_fields]),
    )
