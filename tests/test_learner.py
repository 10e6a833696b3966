"""IRLS glm, forest, and the expected-F1 cutoff scan (R/fuzzylink.R:344-371)."""

import numpy as np
import pytest

from raylink.learner import (
    ForestLearner,
    GLMLearner,
    get_cutoff,
    get_cutoff_histogram,
    predict_from_state,
)


def test_glm_recovers_known_coefficients():
    rng = np.random.default_rng(0)
    n = 5000
    X = rng.normal(size=(n, 2))
    true_beta = np.array([0.5, 2.0, -1.0])  # intercept, b1, b2
    p = 1 / (1 + np.exp(-(true_beta[0] + X @ true_beta[1:])))
    y = (rng.random(n) < p).astype(float)
    m = GLMLearner().fit(X, y)
    assert np.allclose(m.coef_, true_beta, atol=0.15)
    probs = m.predict_proba(X)
    assert probs.min() >= 0 and probs.max() <= 1


def test_glm_separation_does_not_crash():
    X = np.array([[0.0], [0.1], [0.9], [1.0]])
    y = np.array([0.0, 0.0, 1.0, 1.0])
    m = GLMLearner().fit(X, y)
    p = m.predict_proba(X)
    assert p[0] < 0.5 < p[3]


def test_predict_from_state_glm_roundtrip():
    X = np.random.default_rng(1).normal(size=(100, 2))
    y = (X[:, 0] > 0).astype(float)
    m = GLMLearner().fit(X, y)
    assert np.allclose(predict_from_state(m.export_state(), X), m.predict_proba(X))


def test_forest_learns_separable():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(400, 3))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    m = ForestLearner(n_trees=30, seed=7).fit(X, y)
    p = m.predict_proba(X)
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.9


def test_cutoff_simple_separation():
    # clear separation: cutoff should land between the groups
    probs = np.array([0.01, 0.02, 0.05, 0.95, 0.97, 0.99])
    match = np.array([None] * 6, dtype=object)
    c = get_cutoff(probs, match)
    assert 0.05 <= c <= 0.95


def test_cutoff_labels_override():
    probs = np.array([0.1, 0.2, 0.8, 0.9])
    match = np.array(["No", None, None, "Yes"], dtype=object)
    c = get_cutoff(probs, match)
    assert 0.0 <= c <= 1.0


def test_cutoff_empty_fallback():
    assert get_cutoff(np.array([]), np.array([], dtype=object)) == 0.5


def test_cutoff_all_zero_probs_nan_guard():
    # all-zero probabilities -> NaN F1 everywhere -> guard returns a prob
    probs = np.zeros(4)
    match = np.array([None] * 4, dtype=object)
    c = get_cutoff(probs, match)
    assert np.isfinite(c)


def test_cutoff_histogram_agrees_with_exact():
    rng = np.random.default_rng(3)
    probs = np.concatenate([rng.beta(1, 8, 600), rng.beta(8, 1, 120)])
    match = np.array([None] * len(probs), dtype=object)
    exact = get_cutoff(probs, match)

    edges = np.linspace(0, 1, 10_001)
    idx = np.clip(np.searchsorted(edges, probs, side="right") - 1, 0, 9999)
    counts = np.bincount(idx, minlength=10_000).astype(float)
    psums = np.bincount(idx, weights=probs, minlength=10_000)
    zero = np.zeros(10_000)
    approx = get_cutoff_histogram(counts, psums, zero, zero, edges)
    # near-tied expected-F1 plateaus can move the argmax bin; what matters
    # is that the acceptance decision is near-identical
    n_exact = int((probs > exact).sum())
    n_approx = int((probs > approx).sum())
    assert abs(n_exact - n_approx) <= max(3, 0.01 * len(probs))
    assert abs(approx - exact) < 0.05
