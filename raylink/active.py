"""Driver-coordinated labeling phase: initial top-k labeling, model fit,
active-learning loop, recall search (SURVEY.md §3.1 Steps 3-6; reference
``R/fuzzylink.R:157-459``).

The loops touch at most ``max_labels`` (10⁴) oracle labels, so — exactly as
in the reference — they run as a *narrow*, driver-side phase between the two
wide distributed phases. They operate on the slim pair table
``(block, key_a, key_b, sim, jw[, …], exact)``; payload columns never reach
the driver. At corpus scale the slim table is gated by
``LinkConfig.driver_pair_cap`` (the wide path keeps streaming; see
pipeline.py for the cap check).

All randomness comes from one seeded ``numpy`` Generator: kernel-weighted
sampling without replacement mirrors R's ``sample(prob=)``
(R/fuzzylink.R:277-282), the Gaussian uncertainty kernel
``dnorm(qlogis(p), 0, 0.2)`` is closed-form numpy (F10).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from raylink.config import LinkConfig
from raylink.learner import get_cutoff, make_learner
from raylink.oracle import Oracle, check_match

_FULL_FEATS = ["sim", "jw", "osa", "cosine", "jaccard", "lcs", "qgram", "soundex"]


@dataclass
class LoopResult:
    labels: dict[tuple[str, str], str]
    model_state: dict
    cutoff: float
    train: pd.DataFrame
    pairs: pd.DataFrame  # slim pair table with match / match_probability
    metrics: dict = field(default_factory=dict)


def _kernel_weights(probs: np.ndarray, sd: float) -> np.ndarray:
    """dnorm(qlogis(p), 0, sd); qlogis(0/1) = ∓inf ⇒ weight 0
    (R/fuzzylink.R:268-271)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        x = np.log(probs / (1.0 - probs))
    w = np.exp(-0.5 * (x / sd) ** 2) / (sd * np.sqrt(2 * np.pi))
    return np.where(np.isfinite(w), w, 0.0)


def _weighted_sample(
    rng: np.random.Generator, n: int, size: int, w: np.ndarray
) -> np.ndarray:
    """Sequential weighted sampling without replacement (R ``sample(prob=)``
    semantics; numpy Generator.choice does the same draw scheme)."""
    p = w / w.sum()
    return rng.choice(n, size=size, replace=False, p=p)


def _feature_cols(cfg: LinkConfig) -> list[str]:
    return _FULL_FEATS if cfg.learner in ("forest", "ranger") else list(cfg.feature_cols)


def _fit(train: pd.DataFrame, cfg: LinkConfig):
    cols = _feature_cols(cfg)
    labeled = train[train["match"].isin(["Yes", "No"])]
    X = labeled[cols].to_numpy(dtype=np.float64)
    y = (labeled["match"] == "Yes").to_numpy(dtype=np.float64)
    model = make_learner(cfg.learner, seed=cfg.seed)
    model.fit(X, y)
    return model


def _predict(model, df: pd.DataFrame, cfg: LinkConfig) -> np.ndarray:
    return model.predict_proba(df[_feature_cols(cfg)].to_numpy(dtype=np.float64))


def run_linkage_loops(
    pairs_df: pd.DataFrame, oracle: Oracle, cfg: LinkConfig
) -> LoopResult:
    """Steps 3-6 of the reference lifecycle over the slim pair table.

    ``pairs_df`` carries every within-block pair (one row per
    (block, key_a, key_b)); mirrors the melted ``df`` of
    R/fuzzylink.R:165-171.
    """
    rng = np.random.default_rng(cfg.seed)
    metrics: dict = {}

    df = pairs_df.sort_values(["block", "key_a", "key_b"], kind="stable").reset_index(
        drop=True
    )
    df["match"] = None
    df["match"] = df["match"].astype(object)

    # ---- Step 3: train = distinct (A, B) pairs; exact split --------------
    train = df.drop_duplicates(["key_a", "key_b"], keep="first").copy()
    exact_mask = train["key_a"] == train["key_b"]
    train_exact = train[exact_mask].copy()
    train_exact["match"] = "Yes"
    train_exact["match_probability"] = 1.0
    train = train[~exact_mask].reset_index(drop=True)

    labels: dict[tuple[str, str], str] = {
        (a, b): "Yes" for a, b in zip(train_exact["key_a"], train_exact["key_b"])
    }

    if len(train) == 0:
        cutoff = 0.5
        df["match"] = [
            labels.get((a, b)) for a, b in zip(df["key_a"], df["key_b"])
        ]
        df["match_probability"] = np.where(df["key_a"] == df["key_b"], 1.0, 0.0)
        return LoopResult(labels, {"kind": "glm", "coef": [0.0, 0.0, 0.0]}, cutoff, train, df, metrics)

    # initial training set: grouped top-k by sim (ties kept, slice_max
    # semantics = rank <= k), then uniform sample of n_t (R/fuzzylink.R:201-224)
    n_uniq_a = train["key_a"].nunique()
    k = max(cfg.n_initial // max(n_uniq_a, 1), 1)
    ranks = train.groupby("key_a")["sim"].rank(method="min", ascending=False)
    pool_idx = train.index[ranks <= k].to_numpy()
    n_topk = cfg.n_initial // 2 if cfg.stratified_initial else cfg.n_initial
    n_pick = min(n_topk, len(pool_idx))
    picked = rng.choice(len(pool_idx), size=n_pick, replace=False)
    sel = pool_idx[picked]
    if cfg.stratified_initial:
        # spend the other half across similarity deciles so mid-sim
        # positives reach the oracle (see LinkConfig.stratified_initial)
        remaining = cfg.n_initial - n_pick
        chosen = set(sel.tolist())
        if remaining > 0 and len(train) > len(chosen):
            qs = np.quantile(train["sim"].to_numpy(), np.linspace(0, 1, 11))
            per_bin = max(remaining // 10, 1)
            extra: list[int] = []
            for lo, hi in zip(qs[:-1], qs[1:]):
                in_bin = train.index[
                    (train["sim"] >= lo) & (train["sim"] <= hi)
                ].to_numpy()
                in_bin = np.array([i for i in in_bin if i not in chosen])
                if len(in_bin) == 0:
                    continue
                take = min(per_bin, len(in_bin))
                got_idx = rng.choice(len(in_bin), size=take, replace=False)
                for i in in_bin[got_idx]:
                    if len(extra) < remaining:
                        extra.append(int(i))
                        chosen.add(int(i))
            sel = np.concatenate([sel, np.array(extra, dtype=sel.dtype)]) if extra else sel
    got = check_match(
        train.loc[sel, "key_a"].tolist(), train.loc[sel, "key_b"].tolist(), oracle
    )
    train.loc[sel, "match"] = got
    metrics["initial_labels"] = int(n_pick)

    # ---- Step 4: fit -----------------------------------------------------
    if cfg.verbose:
        import time as _t

        print(f"Fitting model ({_t.strftime('%X')})", flush=True)
    model = _fit(train, cfg)
    train["match_probability"] = _predict(model, train, cfg)

    # ---- Step 5: active-learning loop (R/fuzzylink.R:249-334) ------------
    is_forest = cfg.learner in ("forest", "ranger")
    stop_threshold = cfg.stop_threshold_forest if is_forest else cfg.stop_threshold
    gradient: list[float] = []
    al_iters = 0
    while True:
        unlabeled = train["match"].isna()
        w = np.where(
            unlabeled.to_numpy(),
            _kernel_weights(train["match_probability"].to_numpy(), cfg.kernel_sd),
            0.0,
        )
        n_pos = int((w > 0).sum())
        if n_pos == 0:
            break
        size = min(cfg.al_batch_size, n_pos)
        sel = _weighted_sample(rng, len(train), size, w)
        got = check_match(
            train.iloc[sel]["key_a"].tolist(), train.iloc[sel]["key_b"].tolist(), oracle
        )
        train.iloc[sel, train.columns.get_loc("match")] = got

        old = train["match_probability"].to_numpy().copy()
        model = _fit(train, cfg)
        train["match_probability"] = _predict(model, train, cfg)
        delta = np.abs(old - train["match_probability"].to_numpy())
        if is_forest:
            oos = train["match"].isna().to_numpy()
            gradient.append(float(delta[oos].max()) if oos.any() else 0.0)
        else:
            gradient.append(float(delta.max()))
        al_iters += 1
        if al_iters >= cfg.window_size:
            rolling = float(np.mean(gradient[-cfg.window_size :]))
            if cfg.verbose:
                # single-line refinement ticker (R/fuzzylink.R:319-326)
                print(
                    f"\rRefining model (iteration {al_iters}) | Gradient: "
                    f"{rolling:.4f} (threshold: {stop_threshold})     ",
                    end="", flush=True,
                )
            if rolling < stop_threshold:
                break
        elif cfg.verbose:
            print(
                f"\rRefining model (iteration {al_iters}) | Gradient: estimating...",
                end="", flush=True,
            )
        if al_iters > 500:  # safety: the reference has no bound but converges
            break
    if cfg.verbose and al_iters:
        print("", flush=True)  # commit the final \r line (R/fuzzylink.R:334)
    metrics["al_iterations"] = al_iters

    # record labels from train
    lab = train[train["match"].notna()]
    labels.update(
        {(a, b): m for a, b, m in zip(lab["key_a"], lab["key_b"], lab["match"])}
    )

    # ---- Step 6: recall search (R/fuzzylink.R:336-459) -------------------
    # merge train labels (incl. exact 'Yes') into the full pair table
    df["match"] = [labels.get((a, b)) for a, b in zip(df["key_a"], df["key_b"])]
    df["match_probability"] = _predict(model, df, cfg)
    df.loc[df["key_a"] == df["key_b"], "match_probability"] = 1.0

    recall_iters = 0
    while True:
        cutoff = get_cutoff(
            df["match_probability"].to_numpy(), df["match"].to_numpy(object)
        )
        # per reference: sum(match=='Yes' | match_probability > cutoff, na.rm)
        # per (A, block) group — prob>cutoff counts regardless of label state
        acc = (df["match"] == "Yes") | (df["match_probability"] > cutoff)
        grp_acc = acc.groupby([df["key_a"], df["block"]]).transform("sum")
        to_search = df[(grp_acc == 0) & df["match"].isna()].drop_duplicates(
            ["key_a", "key_b"], keep="first"
        )
        if len(to_search) == 0:
            break
        if cfg.verbose:
            # recall-search progress (R/fuzzylink.R:421)
            print(f"Record Pairs Remaining To Label: {len(to_search)}", flush=True)
        w = _kernel_weights(to_search["match_probability"].to_numpy(), cfg.kernel_sd)
        n_pos = int((w > 0).sum())
        if n_pos == 0:
            break
        size = min(cfg.al_batch_size, n_pos)
        sel = _weighted_sample(rng, len(to_search), size, w)
        rows = to_search.iloc[sel]
        got = check_match(rows["key_a"].tolist(), rows["key_b"].tolist(), oracle)
        new = {(a, b): m for a, b, m in zip(rows["key_a"], rows["key_b"], got)}
        labels.update(new)
        # coalesce(match.1, match.2) — existing labels win (R/fuzzylink.R:447-453)
        need = df["match"].isna()
        df.loc[need, "match"] = [
            new.get((a, b))
            for a, b in zip(df.loc[need, "key_a"], df.loc[need, "key_b"])
        ]
        recall_iters += 1
        if int(df["match"].notna().sum()) >= cfg.max_labels:
            break
        if recall_iters > 1000:
            break
    metrics["recall_iterations"] = recall_iters
    metrics["labels_spent"] = len(labels)

    final_cutoff = get_cutoff(
        df["match_probability"].to_numpy(), df["match"].to_numpy(object)
    )
    state = model.export_state()
    metrics["cutoff"] = final_cutoff

    train_out = pd.concat([train_exact, train], ignore_index=True)
    return LoopResult(labels, state, final_cutoff, train_out, df, metrics)
