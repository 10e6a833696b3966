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
  - gradient → distributed max |p_new − p_old| with both coefficient
    vectors broadcast (A7);
  - expected-F1 cutoff → mergeable fixed-width probability histograms +
    ``get_cutoff_histogram`` (A5 at scale);
  - unmatched-A detection → ``groupby(key_a, block).max(accepted)`` and a
    broadcast set of unaccepted groups (A4).

The sampling *draws* differ from the in-memory path (different RNG
streams), so decisions can differ pair-by-pair near the margin; the
model/F1 behavior is equivalent and covered by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Min

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
    so Min() reproduces 'keep first' exactly; block resolves to the minimum
    block key (deterministic under parallelism)."""
    cols = ["sim", "jw"] + (
        ["osa", "cosine", "jaccard", "lcs", "qgram", "soundex"] if full_feats else []
    )
    aggs = [Min(c, alias_name=c) for c in cols] + [Min("block", alias_name="block")]
    return pairs.groupby(["key_a", "key_b"]).aggregate(*aggs)


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
) -> pd.DataFrame:
    """K3 at scale: Efraimidis-Spirakis weighted sampling without
    replacement — per-batch top-k partials of key = u^(1/w), reduced on the
    driver. ``labeled`` (≤ max_labels) and the optional unaccepted-group
    filter are broadcast."""
    lab_ref = ray.put(labeled)
    grp_ref = ray.put(group_filter)
    st_ref = ray.put(state)

    def _partial(batch: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        grp = ray.get(grp_ref)
        st = ray.get(st_ref)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        probs = _score_batch(st, batch, feature_cols)
        w = _kernel_weights(probs, kernel_sd)
        mask = np.array(
            [
                (a, b) not in lab
                and (grp is None or (a, blk) in grp)
                for a, b, blk in zip(ka, kb, batch.column("block").to_pylist())
            ]
        )
        w = np.where(mask, w, 0.0)
        pos = w > 0
        if not pos.any():
            return pa.table(
                {"key_a": pa.array([], type=pa.string()),
                 "key_b": pa.array([], type=pa.string()),
                 "_key": pa.array([], type=pa.float64()),
                 "match_probability": pa.array([], type=pa.float64())}
            )
        u = _hash01(ka, kb, [seed] * len(ka), [iteration] * len(ka))
        with np.errstate(divide="ignore"):
            keys = np.where(pos, u ** (1.0 / np.where(pos, w, 1.0)), -1.0)
        order = np.argsort(-keys, kind="stable")[: int(pos.sum())][:batch_size]
        idx = pa.array(order.astype(np.int64))
        return pa.table(
            {
                "key_a": batch.column("key_a").take(idx),
                "key_b": batch.column("key_b").take(idx),
                "_key": pa.array(keys[order]),
                "match_probability": pa.array(probs[order]),
            }
        )

    parts = train.map_batches(_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return parts
    return parts.nlargest(batch_size, "_key").drop(columns=["_key"])


def distributed_gradient(
    train: ray.data.Dataset,
    old_state: dict,
    new_state: dict,
    feature_cols: list[str],
    exclude: set | None = None,
) -> float:
    """A7: max |p_new − p_old| over the train set, one streaming pass.

    ``exclude`` (a broadcast set of labeled (key_a, key_b) pairs, ≤
    max_labels) restricts the gradient to out-of-sample rows — the
    reference's forest-learner convergence rule (R/fuzzylink.R:311-318),
    mirrored by the driver-mode loop in ``active.run_linkage_loops``."""
    o_ref, n_ref = ray.put(old_state), ray.put(new_state)
    ex_ref = ray.put(exclude) if exclude else None

    def _g(batch: pa.Table) -> pa.Table:
        po = _score_batch(ray.get(o_ref), batch, feature_cols)
        pn = _score_batch(ray.get(n_ref), batch, feature_cols)
        d = np.abs(po - pn)
        if ex_ref is not None:
            ex = ray.get(ex_ref)
            ka = batch.column("key_a").to_pylist()
            kb = batch.column("key_b").to_pylist()
            oos = np.fromiter(
                ((a, b) not in ex for a, b in zip(ka, kb)), dtype=bool, count=len(ka)
            )
            d = d[oos]
        return pa.table({"g": pa.array([float(d.max(initial=0.0))])})

    parts = train.map_batches(_g, batch_format="pyarrow").to_pandas()
    return float(parts["g"].max()) if len(parts) else 0.0


def histogram_cutoff(
    pairs: ray.data.Dataset,
    state: dict,
    labels: dict,
    feature_cols: list[str],
) -> float:
    """A5 at scale: mergeable per-batch probability histograms (count, Σp,
    labeled-yes, labeled-no per bin) → get_cutoff_histogram."""
    st_ref = ray.put(state)
    lab_ref = ray.put(labels)
    edges = np.linspace(0.0, 1.0, _NB + 1)

    def _h(batch: pa.Table) -> pa.Table:
        st = ray.get(st_ref)
        lab = ray.get(lab_ref)
        probs = _score_batch(st, batch, feature_cols)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        exact = np.array([a == b for a, b in zip(ka, kb)])
        probs = np.where(exact, 1.0, probs)
        idx = np.clip(np.searchsorted(edges, probs, side="right") - 1, 0, _NB - 1)
        counts = np.bincount(idx, minlength=_NB).astype(np.float64)
        psums = np.bincount(idx, weights=probs, minlength=_NB)
        lab_arr = np.array(
            ["Yes" if e else lab.get((a, b), "") for a, b, e in zip(ka, kb, exact)],
            dtype=object,
        )
        yes = np.bincount(idx[lab_arr == "Yes"], minlength=_NB).astype(np.float64)
        no = np.bincount(idx[lab_arr == "No"], minlength=_NB).astype(np.float64)
        return pa.table(
            {
                "bin": pa.array(np.arange(_NB, dtype=np.int64)),
                "c": pa.array(counts),
                "p": pa.array(psums),
                "y": pa.array(yes),
                "n": pa.array(no),
            }
        )

    parts = pairs.map_batches(_h, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bin").sum()
    counts = np.zeros(_NB)
    psums = np.zeros(_NB)
    yes = np.zeros(_NB)
    no = np.zeros(_NB)
    counts[agg.index] = agg["c"]
    psums[agg.index] = agg["p"]
    yes[agg.index] = agg["y"]
    no[agg.index] = agg["n"]
    return get_cutoff_histogram(counts, psums, yes, no, edges)


def unaccepted_groups(
    pairs: ray.data.Dataset,
    state: dict,
    labels: dict,
    cutoff: float,
    feature_cols: list[str],
) -> set:
    """A4: (key_a, block) groups with no accepted pair — the recall-search
    frontier. Broadcast-returned as a set (size ∝ unmatched A records)."""
    st_ref = ray.put(state)
    lab_ref = ray.put(labels)

    def _acc(batch: pa.Table) -> pa.Table:
        st = ray.get(st_ref)
        lab = ray.get(lab_ref)
        probs = _score_batch(st, batch, feature_cols)
        ka = batch.column("key_a").to_pylist()
        kb = batch.column("key_b").to_pylist()
        exact = np.array([a == b for a, b in zip(ka, kb)])
        probs = np.where(exact, 1.0, probs)
        is_yes = np.array(
            [e or lab.get((a, b)) == "Yes" for a, b, e in zip(ka, kb, exact)]
        )
        acc = (is_yes | (probs > cutoff)).astype(np.int64)
        return pa.table(
            {
                "key_a": batch.column("key_a"),
                "block": batch.column("block"),
                "acc": pa.array(acc),
            }
        )

    grouped = (
        pairs.map_batches(_acc, batch_format="pyarrow")
        .groupby(["key_a", "block"])
        .aggregate(Max("acc", alias_name="max_acc"))
    )
    df = grouped.filter(expr="max_acc == 0").to_pandas()
    return set(zip(df["key_a"], df["block"]))


def run_linkage_loops_streaming(
    pairs: ray.data.Dataset, oracle: Oracle, cfg: LinkConfig
):
    """Steps 3-6 with the pair set kept distributed. Returns
    (labels, model_state, cutoff, metrics)."""
    full_feats = cfg.learner in ("forest", "ranger")
    feature_cols = _feature_cols(cfg)
    metrics: dict = {}

    # The distinct non-exact train table is pair-scale: it lands on
    # partitioned parquet (disk, re-streamable per loop pass) instead of
    # being pinned in the object store — no stage materializes a
    # pair-scale table in memory (exact pairs are labeled Yes without
    # oracle spend, R/fuzzylink.R:193-199, so they never enter the pool).
    import tempfile

    spill_dir = tempfile.mkdtemp(prefix="raylink_train_", dir="/tmp")
    distinct_train_pairs(pairs, full_feats).filter(
        expr="key_a != key_b"
    ).write_parquet(spill_dir)
    non_exact = ray.data.read_parquet(spill_dir)

    labels: dict[tuple[str, str], str] = {}

    # ---- initial labels --------------------------------------------------
    pool = topk_initial_pool(non_exact, cfg.n_initial, cfg.seed)
    got = check_match(pool["key_a"].tolist(), pool["key_b"].tolist(), oracle)
    labels.update(zip(zip(pool["key_a"], pool["key_b"]), got))
    metrics["initial_labels"] = len(pool)

    def _fit() -> dict:
        items = [(a, b, m) for (a, b), m in labels.items() if m in ("Yes", "No")]
        lab_df = pd.DataFrame(items, columns=["key_a", "key_b", "match"])
        # features for labeled pairs come from the train table (broadcast
        # filter; labeled set ≤ max_labels)
        want = set(zip(lab_df["key_a"], lab_df["key_b"]))
        ref = ray.put(want)

        def _f(batch: pa.Table) -> pa.Table:
            w = ray.get(ref)
            ka = batch.column("key_a").to_pylist()
            kb = batch.column("key_b").to_pylist()
            mask = pa.array([(a, b) in w for a, b in zip(ka, kb)], type=pa.bool_())
            return batch.filter(mask)

        feats = non_exact.map_batches(_f, batch_format="pyarrow").to_pandas()
        merged = feats.merge(lab_df, on=["key_a", "key_b"], how="inner")
        model = make_learner(cfg.learner, seed=cfg.seed)
        X = merged[feature_cols].to_numpy(dtype=np.float64)
        y = (merged["match"] == "Yes").to_numpy(dtype=np.float64)
        model.fit(X, y)
        return model.export_state()

    if cfg.verbose:
        import time as _t

        print(f"Fitting model ({_t.strftime('%X')})", flush=True)
    state = _fit()

    # ---- active-learning loop -------------------------------------------
    stop_threshold = (
        cfg.stop_threshold_forest if full_feats else cfg.stop_threshold
    )
    gradients: list[float] = []
    it = 0
    while True:
        batch = weighted_sample_unlabeled(
            non_exact, state, set(labels), cfg.al_batch_size,
            cfg.kernel_sd, cfg.seed, it, feature_cols,
        )
        if len(batch) == 0:
            break
        got = check_match(batch["key_a"].tolist(), batch["key_b"].tolist(), oracle)
        labels.update(zip(zip(batch["key_a"], batch["key_b"]), got))
        new_state = _fit()
        gradients.append(
            distributed_gradient(
                non_exact, state, new_state, feature_cols,
                exclude=set(labels) if full_feats else None,
            )
        )
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

    # ---- recall search ---------------------------------------------------
    recall_iters = 0
    while len(labels) < cfg.max_labels:
        cutoff = histogram_cutoff(pairs, state, labels, feature_cols)
        frontier = unaccepted_groups(pairs, state, labels, cutoff, feature_cols)
        if not frontier:
            break
        batch = weighted_sample_unlabeled(
            non_exact, state, set(labels), cfg.al_batch_size,
            cfg.kernel_sd, cfg.seed, 10_000 + recall_iters, feature_cols,
            group_filter=frontier,
        )
        if len(batch) == 0:
            break
        got = check_match(batch["key_a"].tolist(), batch["key_b"].tolist(), oracle)
        labels.update(zip(zip(batch["key_a"], batch["key_b"]), got))
        recall_iters += 1
        if recall_iters > 500:
            break
    metrics["recall_iterations"] = recall_iters
    metrics["labels_spent"] = len(labels)

    final_cutoff = histogram_cutoff(pairs, state, labels, feature_cols)
    metrics["cutoff"] = final_cutoff
    return labels, state, final_cutoff, metrics
