"""Streaming-scale labeling phase: the same Steps 3-6 semantics as
``active.py`` expressed as distributed passes, for pair sets too large to
hold on the driver (``LinkConfig.driver_pair_cap`` exceeded).

Faithfulness vs. scale (SURVEY.md §3.1, §4):

* the driver still owns the oracle, the model fit and the loop control —
  they touch ≤ ``max_labels`` rows by construction, exactly like the
  reference (R/fuzzylink.R:157-459);
* everything that needs the full pair set becomes a streaming pass:
  - initial top-k selection → ``groupby(key_a)`` rank-with-ties, then a
    seeded hash-ordered global sample (K1/K2);
  - uncertainty sampling → Efraimidis-Spirakis weighted reservoir:
    weight = dnorm(qlogis(p), 0, kernel_sd), key = u^(1/w) with
    deterministic per-(pair, iteration) u; per-batch top-k partials reduce
    on the driver (K3);
  - gradient → distributed max |p_new − p_old|, FUSED into the next
    iteration's sampling pass (A7);
  - expected-F1 cutoff → mergeable fixed-width probability histograms +
    ``get_cutoff_histogram`` (A5 at scale);
  - unmatched-A detection → ``groupby(key_a, block).max(prob)`` once per
    recall phase, then driver-side frontier updates (A4).

Pass economy (the r2 VERDICT's top loop-phase debt): each loop iteration
streams the pair-scale data at most ONCE —

* labeled-pair features are cached on the driver as samples return (the
  sample pass already touches them), so the model refit never re-streams
  the train table;
* the convergence gradient rides the NEXT iteration's sampling pass (both
  need a fresh scoring of every row under the new model — one stream, two
  reductions);
* the recall phase scores the pair set exactly twice TOTAL (probability
  histogram + per-group max-probability) under its fixed model state; the
  per-iteration cutoff and unaccepted-group frontier are then pure driver
  arithmetic — only labeled-pair bins and yes-groups change between
  iterations, and those are incrementally updated from the (≤ max_labels)
  label cache. Each recall iteration costs one sampling pass.

``metrics["pair_passes"]`` records the actual per-phase pass counts so a
regression to multi-pass iterations is test-assertable.

Driver-memory contract: the label/feature cache is ≤ ``max_labels`` rows;
the recall group table is O(distinct (key_a, block) groups without an
exact match) — the same order as the unaccepted-group broadcast the
per-iteration recomputation already required.

The sampling *draws* differ from the in-memory path (different RNG
streams), so decisions can differ pair-by-pair near the margin; the
model/F1 behavior is equivalent and covered by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Max, Min, Unique

from raylink.active import _feature_cols, _kernel_weights
from raylink.config import LinkConfig
from raylink.learner import (
    get_cutoff_histogram,
    make_learner,
    predict_from_state,
)
from raylink.oracle import Oracle, check_match

_NB = 10_000  # cutoff histogram bins


def _hash01(*parts) -> np.ndarray:
    """Deterministic uniform(0,1) per row from string parts.

    Vectorized: parts are string-joined column-wise (pandas C string
    kernels) and hashed with the fixed-key SipHash behind
    ``pd.util.hash_array`` — this pass runs over the full train set every
    AL iteration, so a per-row Python crc32 loop was the hot spot."""
    s: pd.Series | None = None
    for p in parts:
        col = pd.Series(p).astype(str)
        s = col if s is None else s.str.cat(col.set_axis(s.index), sep="\x1f")
    h = pd.util.hash_array(s.to_numpy(dtype=object), hash_key="raylink_hash01!!")
    return (h.astype(np.float64) + 0.5) / 18446744073709551616.0


def distinct_train_pairs(pairs: ray.data.Dataset, full_feats: bool) -> ray.data.Dataset:
    """A3: distinct (key_a, key_b) rows. sim/jw depend only on the strings,
    so Min() reproduces 'keep first' exactly; ``block`` resolves to the
    minimum block key (deterministic under parallelism) and ``blocks``
    keeps the full set of blocks the pair occurs in — the pair's
    multiplicity in the raw pair table, which the driver-side histogram
    and frontier bookkeeping need to update labeled bins exactly.
    ``blocks`` is stored as a ``\\x1f``-joined string (not an Arrow list)
    so it survives the pandas round-trips in map_groups stages."""
    import pyarrow.compute as pc

    cols = ["sim", "jw"] + (
        ["osa", "cosine", "jaccard", "lcs", "qgram", "soundex"] if full_feats else []
    )
    aggs = (
        [Min(c, alias_name=c) for c in cols]
        + [Min("block", alias_name="block")]
        + [Unique("block", alias_name="blocks")]
    )
    agg = pairs.groupby(["key_a", "key_b"]).aggregate(*aggs)

    def _join_blocks(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("blocks")
        joined = pc.binary_join(
            pc.cast(t.column("blocks"), pa.list_(pa.string())), "\x1f"
        )
        return t.set_column(i, "blocks", joined)

    return agg.map_batches(_join_blocks, batch_format="pyarrow")


def _score_batch(state: dict, batch: pa.Table, feature_cols: list[str]) -> np.ndarray:
    X = np.column_stack(
        [batch.column(c).to_numpy(zero_copy_only=False) for c in feature_cols]
    )
    return predict_from_state(state, X)


def topk_initial_pool(
    train: ray.data.Dataset, n_t: int, seed: int
) -> pd.DataFrame:
    """K1+K2: per-A top-k by sim with ties (k = max(n_t/|uniq A|, 1)), then
    a seeded uniform sample of n_t from the pool via hash ordering.

    The sample is taken with per-batch partial top-n_t reductions (each
    batch forwards at most n_t rows to the driver) — identical result to a
    global ``sort('_u').limit(n_t)`` without the all-to-all sort."""
    n_uniq = train.groupby("key_a").aggregate(Min("sim", alias_name="_s")).count()
    k = max(n_t // max(n_uniq, 1), 1)

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        ranks = g["sim"].rank(method="min", ascending=False)
        return g[ranks <= k]

    pool = train.groupby("key_a").map_groups(_topk, batch_format="pandas")

    def _tag_partial(batch: pa.Table) -> pa.Table:
        u = _hash01(
            batch.column("key_a").to_pylist(),
            batch.column("key_b").to_pylist(),
            [seed] * len(batch),
        )
        t = batch.append_column("_u", pa.array(u))
        if len(t) > n_t:
            order = np.argsort(u, kind="stable")[:n_t]
            t = t.take(pa.array(np.sort(order)))
        return t

    parts = pool.map_batches(_tag_partial, batch_format="pyarrow").to_pandas()
    return (
        parts.nsmallest(n_t, "_u").drop(columns=["_u"]).reset_index(drop=True)
    )


def _empty_sample_table(carry_fields: list[tuple[str, pa.DataType]]) -> pa.Table:
    cols = {
        "key_a": pa.array([], type=pa.string()),
        "key_b": pa.array([], type=pa.string()),
        "_key": pa.array([], type=pa.float64()),
        "match_probability": pa.array([], type=pa.float64()),
        "_g": pa.array([], type=pa.float64()),
    }
    for name, typ in carry_fields:
        cols[name] = pa.array([], type=typ)
    return pa.table(cols)


def _sample_partial_fn(
    state_refs,
    labeled_ref,
    grp_ref,
    batch_size: int,
    kernel_sd: float,
    seed: int,
    iteration: int,
    feature_cols: list[str],
    carry_cols: list[str],
    gradient_exclude: bool,
):
    """Builds the per-batch kernel shared by the plain sampling pass and
    the fused gradient+sampling pass.

    ``state_refs`` is ``(old_state_ref | None, new_state_ref)``: when an
    old state is present, the batch also reports max |p_new − p_old| in a
    ``_g`` column (rows with a null ``_key`` are gradient-only carriers),
    restricted to unlabeled rows when ``gradient_exclude`` (the forest
    OOS convergence rule, R/fuzzylink.R:311-318)."""
    old_ref, new_ref = state_refs

    def _partial(batch: pa.Table) -> pa.Table:
        new_st = ray.get(new_ref)
        lab = ray.get(labeled_ref)
        grp = ray.get(grp_ref) if grp_ref is not None else None
        carry_fields = [
            (c, batch.schema.field(c).type) for c in carry_cols
        ]
        if len(batch) == 0:
            return _empty_sample_table(carry_fields)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        probs = _score_batch(new_st, batch, feature_cols)
        is_lab = np.fromiter(
            ((a, b) in lab for a, b in zip(ka, kb)), dtype=bool, count=len(ka)
        )

        g = None
        if old_ref is not None:
            po = _score_batch(ray.get(old_ref), batch, feature_cols)
            d = np.abs(po - probs)
            if gradient_exclude:
                d = d[~is_lab]
            g = float(d.max(initial=0.0))

        w = _kernel_weights(probs, kernel_sd)
        if grp is None:
            mask = ~is_lab
        else:
            blk = batch.column("block").to_pylist()
            mask = np.array(
                [
                    (not l) and (a, b_) in grp
                    for l, a, b_ in zip(is_lab, ka, blk)
                ]
            )
        w = np.where(mask, w, 0.0)
        pos = w > 0
        if not pos.any():
            out = _empty_sample_table(carry_fields)
        else:
            u = _hash01(ka, kb, [seed] * len(ka), [iteration] * len(ka))
            with np.errstate(divide="ignore"):
                keys = np.where(pos, u ** (1.0 / np.where(pos, w, 1.0)), -1.0)
            order = np.argsort(-keys, kind="stable")[: int(pos.sum())][:batch_size]
            idx = pa.array(order.astype(np.int64))
            cols = {
                "key_a": batch.column("key_a").take(idx),
                "key_b": batch.column("key_b").take(idx),
                "_key": pa.array(keys[order]),
                "match_probability": pa.array(probs[order]),
                "_g": pa.nulls(len(order), pa.float64()),
            }
            for name, typ in carry_fields:
                cols[name] = batch.column(name).take(idx)
            out = pa.table(cols)
        if g is not None:
            grow = {
                "key_a": pa.nulls(1, pa.string()),
                "key_b": pa.nulls(1, pa.string()),
                "_key": pa.nulls(1, pa.float64()),
                "match_probability": pa.nulls(1, pa.float64()),
                "_g": pa.array([g], type=pa.float64()),
            }
            for name, typ in carry_fields:
                grow[name] = pa.nulls(1, typ)
            out = pa.concat_tables([out, pa.table(grow).cast(out.schema)])
        return out

    return _partial


def weighted_sample_unlabeled(
    train: ray.data.Dataset,
    state: dict,
    labeled: set,
    batch_size: int,
    kernel_sd: float,
    seed: int,
    iteration: int,
    feature_cols: list[str],
    group_filter: set | None = None,
    carry_cols: list[str] | None = None,
) -> pd.DataFrame:
    """K3 at scale: Efraimidis-Spirakis weighted sampling without
    replacement — per-batch top-k partials of key = u^(1/w), reduced on the
    driver. ``labeled`` (≤ max_labels) and the optional unaccepted-group
    filter are broadcast. ``carry_cols`` ride along on the sampled rows so
    the driver can cache their features without another pass."""
    lab_ref = ray.put(labeled)
    grp_ref = ray.put(group_filter) if group_filter is not None else None
    st_ref = ray.put(state)
    fn = _sample_partial_fn(
        (None, st_ref), lab_ref, grp_ref, batch_size, kernel_sd,
        seed, iteration, feature_cols, carry_cols or [], False,
    )
    parts = train.map_batches(fn, batch_format="pyarrow").to_pandas()
    out_cols = ["key_a", "key_b", "match_probability"] + list(carry_cols or [])
    if len(parts) == 0:
        # an all-empty result can surface as a column-less frame
        return pd.DataFrame(columns=out_cols)
    parts = parts[parts["_key"].notna()]
    if len(parts) == 0:
        return pd.DataFrame(columns=out_cols)
    return parts.nlargest(batch_size, "_key").drop(columns=["_key", "_g"])


def gradient_and_next_sample(
    train: ray.data.Dataset,
    old_state: dict,
    new_state: dict,
    labeled: set,
    batch_size: int,
    kernel_sd: float,
    seed: int,
    iteration: int,
    feature_cols: list[str],
    carry_cols: list[str],
    gradient_exclude: bool,
) -> tuple[float, pd.DataFrame]:
    """A7 + K3 in ONE streaming pass: every AL iteration needs (a) the
    convergence gradient max |p_new − p_old| and (b) the next sampling
    draw under the new model — both score every row under ``new_state``,
    so they share one stream with two per-batch reductions."""
    lab_ref = ray.put(labeled)
    o_ref, n_ref = ray.put(old_state), ray.put(new_state)
    fn = _sample_partial_fn(
        (o_ref, n_ref), lab_ref, None, batch_size, kernel_sd,
        seed, iteration, feature_cols, carry_cols, gradient_exclude,
    )
    parts = train.map_batches(fn, batch_format="pyarrow").to_pandas()
    out_cols = ["key_a", "key_b", "match_probability"] + list(carry_cols)
    if len(parts) == 0:
        return 0.0, pd.DataFrame(columns=out_cols)
    grad = float(parts["_g"].max()) if parts["_g"].notna().any() else 0.0
    sample = parts[parts["_key"].notna()]
    if len(sample) == 0:
        return grad, pd.DataFrame(columns=out_cols)
    sample = sample.nlargest(batch_size, "_key")
    return grad, sample.drop(columns=["_key", "_g"]).reset_index(drop=True)


def histogram_pass(
    pairs: ray.data.Dataset,
    state: dict,
    feature_cols: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """A5 at scale, label-free base: mergeable per-batch probability
    histograms over the raw pair table → (counts, Σp, exact_yes, edges).
    Exact pairs (key_a == key_b) score 1.0 and count as labeled-Yes
    (R/fuzzylink.R:193-199); oracle labels are layered on by the driver
    (see :class:`_RecallState`) so this pass runs ONCE per model state."""
    st_ref = ray.put(state)
    edges = np.linspace(0.0, 1.0, _NB + 1)

    def _h(batch: pa.Table) -> pa.Table:
        st = ray.get(st_ref)
        probs = _score_batch(st, batch, feature_cols)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        exact = np.array([a == b for a, b in zip(ka, kb)])
        probs = np.where(exact, 1.0, probs)
        idx = np.clip(np.searchsorted(edges, probs, side="right") - 1, 0, _NB - 1)
        counts = np.bincount(idx, minlength=_NB).astype(np.float64)
        psums = np.bincount(idx, weights=probs, minlength=_NB)
        yes = np.bincount(idx[exact], minlength=_NB).astype(np.float64)
        nz = (counts > 0) | (yes > 0)
        return pa.table(
            {
                "bin": pa.array(np.flatnonzero(nz).astype(np.int64)),
                "c": pa.array(counts[nz]),
                "p": pa.array(psums[nz]),
                "y": pa.array(yes[nz]),
            }
        )

    parts = pairs.map_batches(_h, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bin").sum()
    counts = np.zeros(_NB)
    psums = np.zeros(_NB)
    yes0 = np.zeros(_NB)
    counts[agg.index] = agg["c"]
    psums[agg.index] = agg["p"]
    yes0[agg.index] = agg["y"]
    return counts, psums, yes0, edges


def group_max_prob(
    pairs: ray.data.Dataset,
    state: dict,
    feature_cols: list[str],
) -> pd.DataFrame:
    """A4 base: per-(key_a, block) max match probability over the raw pair
    table, one streaming pass + one slim shuffle, computed ONCE per model
    state. Groups containing an exact pair are accepted under any cutoff
    (exact rows score 1.0 and are labeled Yes) and are filtered out before
    the collect, so the returned frame is O(groups without an exact
    match) — the same order as the per-iteration unaccepted-group
    broadcast the recall search needs anyway."""
    st_ref = ray.put(state)

    def _g(batch: pa.Table) -> pa.Table:
        st = ray.get(st_ref)
        if len(batch) == 0:
            return pa.table(
                {
                    "key_a": pa.array([], type=pa.string()),
                    "block": pa.array([], type=pa.string()),
                    "p": pa.array([], type=pa.float64()),
                    "e": pa.array([], type=pa.int64()),
                }
            )
        probs = _score_batch(st, batch, feature_cols)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        exact = np.array([a == b for a, b in zip(ka, kb)])
        probs = np.where(exact, 1.0, probs)
        # per-batch partial groupby (vectorized) so the global shuffle
        # moves group partials, not pair rows
        df = pd.DataFrame(
            {
                "key_a": ka,
                "block": batch.column("block").to_pylist(),
                "p": probs,
                "e": exact.astype(np.int64),
            }
        )
        part = (
            df.groupby(["key_a", "block"], sort=False)
            .agg(p=("p", "max"), e=("e", "max"))
            .reset_index()
        )
        return pa.Table.from_pandas(part, preserve_index=False).replace_schema_metadata(None)

    grouped = (
        pairs.map_batches(_g, batch_format="pyarrow")
        .groupby(["key_a", "block"])
        .aggregate(Max("p", alias_name="max_prob"), Max("e", alias_name="any_exact"))
    )
    return grouped.filter(expr="any_exact == 0").to_pandas()


class _RecallState:
    """Driver-side incremental cutoff + frontier for the recall search.

    The model state is FIXED during recall (the reference never refits
    there, R/fuzzylink.R:336-459), so the probability histogram's counts
    and the per-group max probability are constants; only the labeled
    yes/no bins and the yes-labeled groups move as labels arrive. Both are
    exact driver updates given each labeled pair's probability (recomputed
    from the cached features under the recall state — bit-identical to the
    in-pass scoring) and its block multiplicity (the ``blocks`` column)."""

    def __init__(self, counts, psums, yes0, edges, groups: pd.DataFrame):
        self.counts, self.psums, self.yes0, self.edges = counts, psums, yes0, edges
        self.lab_yes = np.zeros(_NB)
        self.lab_no = np.zeros(_NB)
        self.yes_groups: set[tuple[str, str]] = set()
        # groups without an exact pair, as parallel arrays for a
        # vectorized cutoff filter per iteration
        self._gk = list(zip(groups["key_a"], groups["block"]))
        self._gp = groups["max_prob"].to_numpy(dtype=np.float64)

    def add_labels(self, items: list[tuple[str, str, str, float, list]]):
        """items: (key_a, key_b, label, probability, blocks)."""
        for a, b, lab, p, blocks in items:
            i = int(
                np.clip(
                    np.searchsorted(self.edges, p, side="right") - 1, 0, _NB - 1
                )
            )
            m = len(blocks)
            if lab == "Yes":
                self.lab_yes[i] += m
                for blk in blocks:
                    self.yes_groups.add((a, blk))
            elif lab == "No":
                self.lab_no[i] += m

    def cutoff(self) -> float:
        return get_cutoff_histogram(
            self.counts, self.psums, self.yes0 + self.lab_yes, self.lab_no,
            self.edges,
        )

    def frontier(self, cutoff: float) -> set:
        keep = self._gp <= cutoff
        return {
            g for g, k in zip(self._gk, keep) if k and g not in self.yes_groups
        }


def run_linkage_loops_streaming(
    pairs: ray.data.Dataset, oracle: Oracle, cfg: LinkConfig
):
    """Steps 3-6 with the pair set kept distributed. Returns
    (labels, model_state, cutoff, metrics)."""
    full_feats = cfg.learner in ("forest", "ranger")
    feature_cols = _feature_cols(cfg)
    metrics: dict = {}
    passes = {"setup": 0, "al": 0, "recall_base": 0, "recall": 0}

    # The distinct non-exact train table is pair-scale: it lands on
    # partitioned parquet (disk, re-streamable per loop pass) instead of
    # being pinned in the object store — no stage materializes a
    # pair-scale table in memory (exact pairs are labeled Yes without
    # oracle spend, R/fuzzylink.R:193-199, so they never enter the pool).
    from raylink.util import make_spill_dir, remove_spill_dir

    spill_dir = make_spill_dir("raylink_train_")
    try:
        distinct_train_pairs(pairs, full_feats).filter(
            expr="key_a != key_b"
        ).write_parquet(spill_dir)
        passes["setup"] += 1
        non_exact = ray.data.read_parquet(spill_dir)

        labels: dict[tuple[str, str], str] = {}
        # per labeled pair: feature vector + the blocks it occurs in —
        # filled from the sampling passes (which already touch these rows)
        # so the model refit and the recall bookkeeping never re-stream
        # the train table. ≤ max_labels entries.
        feat_cache: dict[tuple[str, str], np.ndarray] = {}
        blocks_cache: dict[tuple[str, str], list] = {}
        carry = list(feature_cols) + ["blocks"]

        def _cache_rows(df: pd.DataFrame) -> None:
            feats = df[feature_cols].to_numpy(dtype=np.float64)
            for i, (a, b) in enumerate(zip(df["key_a"], df["key_b"])):
                feat_cache[(a, b)] = feats[i]
                blocks_cache[(a, b)] = df["blocks"].iloc[i].split("\x1f")

        # ---- initial labels ----------------------------------------------
        pool = topk_initial_pool(non_exact, cfg.n_initial, cfg.seed)
        passes["setup"] += 2  # count + grouped-topk streams over the train table
        _cache_rows(pool)
        got = check_match(pool["key_a"].tolist(), pool["key_b"].tolist(), oracle)
        labels.update(zip(zip(pool["key_a"], pool["key_b"]), got))
        metrics["initial_labels"] = len(pool)

        def _fit() -> dict:
            # pure driver-side: features come from the cache, ordered by
            # (key_a, key_b) — the train table's groupby-sorted stream
            # order — so the float reductions are deterministic
            items = sorted(
                k for k, m in labels.items() if m in ("Yes", "No")
            )
            X = np.stack([feat_cache[k] for k in items]) if items else np.zeros((0, len(feature_cols)))
            y = np.array([1.0 if labels[k] == "Yes" else 0.0 for k in items])
            model = make_learner(cfg.learner, seed=cfg.seed)
            model.fit(X, y)
            return model.export_state()

        if cfg.verbose:
            import time as _t

            print(f"Fitting model ({_t.strftime('%X')})", flush=True)
        state = _fit()

        # ---- active-learning loop ----------------------------------------
        stop_threshold = (
            cfg.stop_threshold_forest if full_feats else cfg.stop_threshold
        )
        gradients: list[float] = []
        it = 0
        batch = weighted_sample_unlabeled(
            non_exact, state, set(labels), cfg.al_batch_size,
            cfg.kernel_sd, cfg.seed, it, feature_cols, carry_cols=carry,
        )
        passes["al"] += 1
        while True:
            if len(batch) == 0:
                break
            _cache_rows(batch)
            got = check_match(batch["key_a"].tolist(), batch["key_b"].tolist(), oracle)
            labels.update(zip(zip(batch["key_a"], batch["key_b"]), got))
            new_state = _fit()
            # ONE pass: gradient(old vs new) + the next iteration's draw
            grad, batch = gradient_and_next_sample(
                non_exact, state, new_state, set(labels), cfg.al_batch_size,
                cfg.kernel_sd, cfg.seed, it + 1, feature_cols, carry,
                gradient_exclude=full_feats,
            )
            passes["al"] += 1
            gradients.append(grad)
            state = new_state
            it += 1
            if cfg.verbose:
                g = (
                    f"{float(np.mean(gradients[-cfg.window_size:])):.4f}"
                    if it >= cfg.window_size
                    else "estimating..."
                )
                print(
                    f"\rRefining model (iteration {it}) | Gradient: {g}     ",
                    end="", flush=True,
                )
            if it >= cfg.window_size and float(np.mean(gradients[-cfg.window_size:])) < stop_threshold:
                break
            if it > 200:
                break
        if cfg.verbose and it:
            print("", flush=True)
        metrics["al_iterations"] = it

        # ---- recall search -----------------------------------------------
        # Base statistics under the (now frozen) model state: TWO passes
        # over the raw pair table, total — not per iteration.
        counts, psums, yes0, edges = histogram_pass(pairs, state, feature_cols)
        groups = group_max_prob(pairs, state, feature_cols)
        passes["recall_base"] += 2
        rs = _RecallState(counts, psums, yes0, edges, groups)
        lab_items = [
            (a, b, labels[(a, b)]) for (a, b) in sorted(labels)
        ]
        if lab_items:
            feats = np.stack([feat_cache[(a, b)] for a, b, _ in lab_items])
            probs = predict_from_state(state, feats)
            rs.add_labels(
                [
                    (a, b, m, float(p), blocks_cache[(a, b)])
                    for (a, b, m), p in zip(lab_items, probs)
                ]
            )

        recall_iters = 0
        while len(labels) < cfg.max_labels:
            cutoff = rs.cutoff()
            frontier = rs.frontier(cutoff)
            if not frontier:
                break
            batch = weighted_sample_unlabeled(
                non_exact, state, set(labels), cfg.al_batch_size,
                cfg.kernel_sd, cfg.seed, 10_000 + recall_iters, feature_cols,
                group_filter=frontier, carry_cols=carry,
            )
            passes["recall"] += 1
            if len(batch) == 0:
                break
            _cache_rows(batch)
            got = check_match(batch["key_a"].tolist(), batch["key_b"].tolist(), oracle)
            labels.update(zip(zip(batch["key_a"], batch["key_b"]), got))
            new_probs = predict_from_state(
                state, np.stack([feat_cache[(a, b)] for a, b in zip(batch["key_a"], batch["key_b"])])
            )
            rs.add_labels(
                [
                    (a, b, m, float(p), blocks_cache[(a, b)])
                    for a, b, m, p in zip(
                        batch["key_a"], batch["key_b"], got, new_probs
                    )
                ]
            )
            recall_iters += 1
            if recall_iters > 500:
                break
        metrics["recall_iterations"] = recall_iters
        metrics["labels_spent"] = len(labels)

        final_cutoff = rs.cutoff()
        metrics["cutoff"] = final_cutoff
        metrics["pair_passes"] = passes
        return labels, state, final_cutoff, metrics
    finally:
        remove_spill_dir(spill_dir)
