"""Verification-metric tests: closed forms + brute-force cross-checks.

The reference ships no skill metrics; these implement the paper's
evaluation (CRPS grid/pooled, CSI, neighborhood CSI) — see
``skillful_nowcasting_tpu/metrics.py``.
"""

import jax.numpy as jnp
import numpy as np

from skillful_nowcasting_tpu.metrics import (
    crps_ensemble,
    csi,
    ensemble_mean_mse,
    pooled_crps,
    pooled_csi,
)


def _crps_brute(x, y, fair):
    s = x.shape[0]
    skill = np.mean([np.abs(xi - y) for xi in x], axis=0)
    spread = sum(np.abs(xi - xj) for xi in x for xj in x)
    denom = s * (s - 1) if fair else s * s
    return skill - 0.5 * spread / denom


def test_crps_deterministic_ensemble_is_mae():
    """All members identical -> CRPS == |x - y| exactly (spread term 0)."""
    rng = np.random.default_rng(0)
    member = rng.random((2, 4, 4, 1)).astype(np.float32)
    obs = rng.random((2, 4, 4, 1)).astype(np.float32)
    samples = np.repeat(member[None], 5, axis=0)
    out = np.asarray(crps_ensemble(jnp.asarray(samples), jnp.asarray(obs)))
    np.testing.assert_allclose(out, np.abs(member - obs), rtol=1e-6, atol=1e-6)


def test_crps_matches_bruteforce():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 3, 5)).astype(np.float32)
    y = rng.standard_normal((3, 5)).astype(np.float32)
    for fair in (True, False):
        out = np.asarray(crps_ensemble(jnp.asarray(x), jnp.asarray(y), fair=fair))
        np.testing.assert_allclose(out, _crps_brute(x, y, fair), rtol=1e-5, atol=1e-6)


def test_crps_fair_gaussian_analytic():
    """Fair CRPS of a large N(0,1) ensemble approaches the analytic value.

    CRPS(N(0,1), y) = y(2*Phi(y)-1) + 2*phi(y) - 1/sqrt(pi).
    """
    from math import erf, exp, pi, sqrt

    rng = np.random.default_rng(2)
    x = rng.standard_normal((4000, 1)).astype(np.float64)
    y = 0.7
    phi = exp(-y * y / 2) / sqrt(2 * pi)
    big_phi = 0.5 * (1 + erf(y / sqrt(2)))
    analytic = y * (2 * big_phi - 1) + 2 * phi - 1 / sqrt(pi)
    out = float(crps_ensemble(jnp.asarray(x), jnp.asarray([y]))[0])
    np.testing.assert_allclose(out, analytic, atol=0.02)


def test_csi_hand_case():
    # pred events: [1, 1, 0, 0]; obs events: [1, 0, 1, 0]
    pred = np.array([5.0, 5.0, 0.0, 0.0], np.float32)
    obs = np.array([5.0, 0.0, 5.0, 0.0], np.float32)
    # hits=1, false alarms=1, misses=1 -> CSI = 1/3
    np.testing.assert_allclose(float(csi(pred, obs, 1.0)), 1 / 3, rtol=1e-6)
    # Multi-threshold: at 6.0 nothing exceeds -> 0/eps -> 0.
    out = np.asarray(csi(pred, obs, [1.0, 6.0]))
    np.testing.assert_allclose(out, [1 / 3, 0.0], rtol=1e-6)


def test_pooled_csi_credits_near_misses():
    """An event displaced by 1 pixel scores 0 at pool=1 but 1 at pool=4."""
    obs = np.zeros((1, 8, 8, 1), np.float32)
    pred = np.zeros((1, 8, 8, 1), np.float32)
    obs[0, 2, 2, 0] = 10.0
    pred[0, 3, 3, 0] = 10.0
    assert float(pooled_csi(pred, obs, 1.0, pool=1)) == 0.0
    assert float(pooled_csi(pred, obs, 1.0, pool=4)) == 1.0


def test_pooled_crps_pool1_identity_and_smoothing():
    rng = np.random.default_rng(3)
    x = rng.random((4, 2, 8, 8, 1)).astype(np.float32)
    y = rng.random((2, 8, 8, 1)).astype(np.float32)
    p1 = np.asarray(pooled_crps(jnp.asarray(x), jnp.asarray(y), pool=1))
    np.testing.assert_array_equal(p1, np.asarray(crps_ensemble(jnp.asarray(x), jnp.asarray(y))))
    p4 = np.asarray(pooled_crps(jnp.asarray(x), jnp.asarray(y), pool=4))
    assert p4.shape == (2, 2, 2, 1)
    # Pooling white noise shrinks both error and spread: mean CRPS decreases.
    assert p4.mean() < p1.mean()


def test_ensemble_mean_mse():
    x = np.stack([np.zeros((2, 2)), np.full((2, 2), 2.0)]).astype(np.float32)
    y = np.zeros((2, 2), np.float32)
    np.testing.assert_allclose(float(ensemble_mean_mse(jnp.asarray(x), jnp.asarray(y))), 1.0)
