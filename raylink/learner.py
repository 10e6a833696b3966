"""Match-probability learners + expected-F1 cutoff (SURVEY.md §2.3 T3, §2.5 A5).

* :class:`GLMLearner` — unpenalized logistic regression fit by IRLS
  (Fisher scoring), the same MLE ``stats::glm(family='binomial')`` computes
  (``R/fuzzylink.R:240-244``). No sklearn in this sandbox; IRLS is ~40 lines.
* :class:`ForestLearner` — random-forest probability learner standing in for
  ``ranger::ranger(probability=TRUE)`` (``R/fuzzylink.R:233-238``): bagged
  depth-limited CARTs over the full lexical feature suite.
* :func:`get_cutoff` — the expected-F1-maximizing probability cutoff scan,
  replicated step-for-step from ``get_cutoff`` (``R/fuzzylink.R:344-371``),
  including the NaN→0 guard and the empty→0.5 fallback. (Like the reference,
  the fitted model is not consulted — its ``fit`` arg is unused.)
* :func:`get_cutoff_histogram` — fixed-width-bin streaming variant for scale:
  identical decision up to bin resolution without a global sort.

Models are fit on the driver (the train set is bounded by the label budget)
and their coefficients broadcast into stateless scoring ``map_batches``.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


class GLMLearner:
    """Unpenalized logistic regression via IRLS (glm-family binomial MLE)."""

    def __init__(self, max_iter: int = 25, tol: float = 1e-8):
        self.max_iter = max_iter
        self.tol = tol
        self.coef_: np.ndarray | None = None  # includes intercept at [0]

    def fit(self, X: np.ndarray, y: np.ndarray) -> "GLMLearner":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, k = X.shape
        Xd = np.hstack([np.ones((n, 1)), X])
        beta = np.zeros(k + 1)
        for _ in range(self.max_iter):
            eta = Xd @ beta
            mu = _sigmoid(eta)
            w = np.clip(mu * (1.0 - mu), 1e-10, None)
            z = eta + (y - mu) / w
            wx = Xd * w[:, None]
            h = Xd.T @ wx
            g = wx.T @ z
            try:
                new = np.linalg.solve(h + 1e-10 * np.eye(k + 1), g)
            except np.linalg.LinAlgError:
                new = np.linalg.lstsq(h, g, rcond=None)[0]
            if np.max(np.abs(new - beta)) < self.tol:
                beta = new
                break
            beta = new
        self.coef_ = beta
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return _sigmoid(self.coef_[0] + X @ self.coef_[1:])

    # broadcastable scoring state
    def export_state(self) -> dict:
        return {"kind": "glm", "coef": self.coef_.tolist()}


class _Tree:
    """Depth-limited CART (gini) on a bootstrap sample; numpy, no recursion
    limit issues at the small train sizes the label budget allows."""

    def __init__(self, max_depth: int, min_leaf: int, max_features: int, rng: np.random.Generator):
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        self.max_features = max_features
        self.rng = rng
        self.nodes: list[tuple] = []  # (feat, thresh, left, right) or (-1, prob, 0, 0)

    def _build(self, X, y, depth) -> int:
        n = len(y)
        prob = float(y.mean()) if n else 0.5
        if depth >= self.max_depth or n < 2 * self.min_leaf or prob in (0.0, 1.0):
            self.nodes.append((-1, prob, 0, 0))
            return len(self.nodes) - 1
        feats = self.rng.choice(X.shape[1], size=min(self.max_features, X.shape[1]), replace=False)
        best = None  # (gini, feat, thresh)
        for f in feats:
            vals = X[:, f]
            order = np.argsort(vals, kind="stable")
            sv, sy = vals[order], y[order]
            cum = np.cumsum(sy)
            tot = cum[-1]
            idx = np.arange(1, n)
            valid = sv[1:] > sv[:-1]
            nl = idx[valid]
            if len(nl) == 0:
                continue
            yl = cum[nl - 1]
            pl, pr = yl / nl, (tot - yl) / (n - nl)
            g = nl * pl * (1 - pl) + (n - nl) * pr * (1 - pr)
            j = int(np.argmin(g))
            cand = (float(g[j]), int(f), float((sv[nl[j] - 1] + sv[nl[j]]) / 2.0))
            if best is None or cand[0] < best[0]:
                best = cand
        if best is None:
            self.nodes.append((-1, prob, 0, 0))
            return len(self.nodes) - 1
        _, f, t = best
        mask = X[:, f] <= t
        if mask.all() or not mask.any():
            self.nodes.append((-1, prob, 0, 0))
            return len(self.nodes) - 1
        me = len(self.nodes)
        self.nodes.append(None)  # placeholder
        left = self._build(X[mask], y[mask], depth + 1)
        right = self._build(X[~mask], y[~mask], depth + 1)
        self.nodes[me] = (f, t, left, right)
        return me

    def fit(self, X, y):
        self.nodes = []
        self._build(X, y, 0)
        return self

    def predict(self, X) -> np.ndarray:
        out = np.empty(len(X), dtype=np.float64)
        for i, row in enumerate(X):
            node = 0
            while True:
                f, t, l, r = self.nodes[node]
                if f == -1:
                    out[i] = t
                    break
                node = l if row[f] <= t else r
        return out


class ForestLearner:
    """Probability random forest (ranger stand-in, R/fuzzylink.R:233-238)."""

    def __init__(self, n_trees: int = 100, max_depth: int = 12, min_leaf: int = 2, seed: int = 42):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        self.seed = seed
        self.trees: list[_Tree] = []

    def fit(self, X: np.ndarray, y: np.ndarray) -> "ForestLearner":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, k = X.shape
        mtry = max(1, int(np.sqrt(k)))
        rng = np.random.default_rng(self.seed)
        self.trees = []
        for _ in range(self.n_trees):
            idx = rng.integers(0, n, size=n)
            t = _Tree(self.max_depth, self.min_leaf, mtry, rng)
            t.fit(X[idx], y[idx])
            self.trees.append(t)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        acc = np.zeros(len(X), dtype=np.float64)
        for t in self.trees:
            acc += t.predict(X)
        return acc / len(self.trees)

    def export_state(self) -> dict:
        return {"kind": "forest", "model": self}


def make_learner(kind: str, seed: int = 42):
    if kind == "glm":
        return GLMLearner()
    if kind in ("forest", "ranger"):
        return ForestLearner(seed=seed)
    raise ValueError(f"unknown learner {kind!r}")


def predict_from_state(state: dict, X: np.ndarray) -> np.ndarray:
    if state["kind"] == "glm":
        coef = np.asarray(state["coef"], dtype=np.float64)
        return _sigmoid(coef[0] + np.asarray(X, dtype=np.float64) @ coef[1:])
    return state["model"].predict_proba(X)


# --------------------------------------------------------------------------
# Expected-F1 cutoff (R/fuzzylink.R:344-371)


def get_cutoff(probs: np.ndarray, match: np.ndarray) -> float:
    """``match`` is an object array of 'Yes' / 'No' / None.

    Replicates the reference scan exactly: ascending cumulative expected /
    identified false negatives, descending cumulative expected / identified
    false positives and true positives, expected F1 per candidate cutoff,
    NaN→0 guard, empty→0.5 fallback."""
    n = len(probs)
    if n == 0:
        return 0.5
    probs = np.asarray(probs, dtype=np.float64)
    labeled = np.array([isinstance(m, str) for m in match])
    is_yes = np.array([m == "Yes" for m in match])

    asc = np.argsort(probs, kind="stable")
    p = probs[asc]
    yes_a = is_yes[asc].astype(np.float64)
    efn = np.cumsum(p)
    ifn = np.cumsum(yes_a)

    desc = np.argsort(-p, kind="stable")
    p_d = p[desc]
    yes_d = yes_a[desc]
    lab_d = labeled[asc][desc]
    efp = np.cumsum(1.0 - p_d)
    # identified fp: cumsum(1 - ifelse(is.na(match), 1, match=='Yes'))
    ifp = np.cumsum(1.0 - np.where(~lab_d, 1.0, yes_d))
    etp = np.cumsum(p_d)
    itp = np.cumsum(yes_d)

    total_labeled_true = float(is_yes.sum())
    tp = total_labeled_true + (etp - itp)
    fp = efp - ifp
    fn = efn[desc] - ifn[desc]

    with np.errstate(divide="ignore", invalid="ignore"):
        recall = tp / (tp + fn)
        precision = tp / (tp + fp)
        f1 = 2.0 * recall * precision / (recall + precision)
    f1 = np.where(np.isnan(f1), 0.0, f1)
    best = int(np.argmax(f1))
    return float(p_d[best])


def get_cutoff_histogram(
    hist_counts: np.ndarray,
    hist_prob_sums: np.ndarray,
    hist_yes: np.ndarray,
    hist_no: np.ndarray,
    bin_edges: np.ndarray,
) -> float:
    """Streaming-scale variant of :func:`get_cutoff` over fixed-width
    probability bins (counts, Σp, labeled-yes, labeled-no per bin) — the
    same expected-F1 scan evaluated at bin boundaries. Matches the exact
    scan to bin resolution; aggregates are mergeable across partitions."""
    nb = len(hist_counts)
    mids = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    # ascending cumulatives per bin
    efn = np.cumsum(hist_prob_sums)
    ifn = np.cumsum(hist_yes)
    # descending (from the top bin down)
    c_d = hist_counts[::-1]
    ps_d = hist_prob_sums[::-1]
    yes_d = hist_yes[::-1]
    no_d = hist_no[::-1]
    unl_d = c_d - yes_d - no_d
    del unl_d  # unlabeled rows contribute 0 identified-FP (ifelse(na,1,·) trick)
    efp = np.cumsum(c_d - ps_d)
    ifp = np.cumsum(no_d)  # only labeled-No rows count (R/fuzzylink.R:350)
    etp = np.cumsum(ps_d)
    itp = np.cumsum(yes_d)
    total_yes = float(hist_yes.sum())
    tp = total_yes + (etp - itp)
    fp = efp - ifp
    fn = efn[::-1] - ifn[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        rec = tp / (tp + fn)
        prec = tp / (tp + fp)
        f1 = 2 * rec * prec / (rec + prec)
    f1 = np.where(np.isnan(f1), 0.0, f1)
    if nb == 0:
        return 0.5
    best = int(np.argmax(f1))
    return float(mids[::-1][best])
