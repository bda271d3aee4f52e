"""Nowcast verification metrics: ensemble CRPS, CSI, pooled variants.

The reference repo trains DGMR but ships no skill metrics; the paper it
implements ("Skilful precipitation nowcasting using deep generative models
of radar", Ravuri et al., Nature 597, 2021 — cited at
``/root/reference/README.md:95-102``) evaluates with CRPS (grid and pooled)
and CSI at rain-rate thresholds.  This module provides those metrics as
pure-JAX functions over the framework's NTHWC ensembles so evaluation runs
jitted on the chip next to generation (e.g. on the output of
:func:`skillful_nowcasting_tpu.inference.make_generate`).

Conventions: ``samples`` is an ensemble ``(S, ...)`` stacked over leading
axis; observations broadcast against ``samples[0]``.  All reductions are in
float32 regardless of input dtype (bf16 ensembles are fine).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def crps_ensemble(
    samples: jnp.ndarray, observation: jnp.ndarray, *, fair: bool = True
) -> jnp.ndarray:
    """Per-point ensemble CRPS via the energy form.

    ``CRPS = E|X - y| - 0.5 E|X - X'|`` with the spread term estimated over
    all ordered member pairs.  ``fair=True`` uses the unbiased ``S(S-1)``
    pair normalization (the "fair CRPS" of Ferro 2014, standard for small
    ensembles like DGMR's S=6); ``fair=False`` uses the plain ``S^2`` form.

    Args:
        samples: ``(S, ...)`` ensemble members.
        observation: ``...`` (broadcastable against one member).

    Returns:
        CRPS field of shape ``...`` (float32).  Averages to the scalar score.
    """
    x = samples.astype(jnp.float32)
    y = jnp.asarray(observation, jnp.float32)
    s = x.shape[0]
    skill = jnp.mean(jnp.abs(x - y[None]), axis=0)
    # Pairwise member spread WITHOUT the naive (S, S, ...) broadcast — that
    # materializes S^2 full fields and OOMs on-chip at validation scale
    # (S=6, B=16, 18x256^2 -> 16 GB).  For paper-sized ensembles, an
    # unrolled sum over the S(S-1)/2 pairs: one field-sized accumulator,
    # layout-neutral (an ``(S, ..., C=1)`` sort along axis 0 made XLA:TPU
    # pick a {C,S}-minor T(8,128) layout padded 170x -> a 72 GB allocation).
    if s <= 16:
        acc = jnp.zeros(x.shape[1:], jnp.float32)
        for i in range(s):
            for j in range(i + 1, s):
                acc = acc + jnp.abs(x[i] - x[j])
        spread = 2.0 * acc
    else:
        # Large ensembles: order-statistics identity
        #   sum_{i,j} |x_i - x_j| = 2 * sum_k (2k - S + 1) * x_(k)
        # on an (S, N) reshape (sublane-only padding).
        flat = x.reshape(s, -1)
        xs = jnp.sort(flat, axis=0)
        w = (2.0 * jnp.arange(s, dtype=jnp.float32) - s + 1.0)[:, None]
        spread = (2.0 * jnp.sum(w * xs, axis=0)).reshape(x.shape[1:])
    denom = s * (s - 1) if (fair and s > 1) else s * s
    return skill - 0.5 * spread / denom


def pooled_crps(
    samples: jnp.ndarray,
    observation: jnp.ndarray,
    pool: int,
    *,
    fair: bool = True,
) -> jnp.ndarray:
    """CRPS of ``pool x pool`` average-pooled fields (paper's pooled CRPS).

    Spatial axes are the last three ``(..., H, W, C)``; fields are mean-pooled
    with stride = window (VALID) before the CRPS, measuring skill at the
    ``pool``-gridlength scale (the paper reports 1/4/16 km pools).
    """
    if pool <= 1:
        return crps_ensemble(samples, observation, fair=fair)

    def avg_pool(v):
        f = v.astype(jnp.float32)
        shape = f.shape
        flat = f.reshape((-1,) + shape[-3:])
        pooled = jax.lax.reduce_window(
            flat, 0.0, jax.lax.add, (1, pool, pool, 1), (1, pool, pool, 1), "VALID"
        ) / (pool * pool)
        return pooled.reshape(shape[:-3] + pooled.shape[1:])

    return crps_ensemble(avg_pool(samples), avg_pool(jnp.asarray(observation)), fair=fair)


def csi(
    prediction: jnp.ndarray,
    observation: jnp.ndarray,
    threshold: Union[float, Sequence[float]],
    *,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Critical Success Index ``hits / (hits + misses + false alarms)``.

    Events are ``value >= threshold``.  ``threshold`` may be a scalar or a
    sequence (returns one CSI per threshold; the paper uses precipitation
    rates such as 1/4/8 mm/h).  All non-threshold axes are reduced.
    """
    c = csi_counts(prediction, observation, threshold)
    out = c[:, 0] / jnp.maximum(jnp.sum(c, axis=1), eps)
    return out[0] if np.ndim(threshold) == 0 else out


def csi_counts(
    prediction: jnp.ndarray,
    observation: jnp.ndarray,
    threshold: Union[float, Sequence[float]],
) -> jnp.ndarray:
    """Contingency counts ``(n_thresholds, 3)``: hits, misses, false alarms.

    CSI is a ratio of event counts, so dataset-level scores must pool the
    counts across batches and divide once — macro-averaging per-batch CSI
    biases the score (batches with no events at a threshold contribute 0 and
    drag the mean down).  :func:`evaluate_nowcast` accumulates these counts.
    """
    thr = jnp.atleast_1d(jnp.asarray(threshold, jnp.float32))
    p = jnp.asarray(prediction, jnp.float32).reshape(-1)
    o = jnp.asarray(observation, jnp.float32).reshape(-1)
    pe = p[None, :] >= thr[:, None]
    oe = o[None, :] >= thr[:, None]
    hits = jnp.sum(pe & oe, axis=1)
    misses = jnp.sum(~pe & oe, axis=1)
    false_alarms = jnp.sum(pe & ~oe, axis=1)
    return jnp.stack([hits, misses, false_alarms], axis=1).astype(jnp.float32)


def pooled_csi(
    prediction: jnp.ndarray,
    observation: jnp.ndarray,
    threshold: Union[float, Sequence[float]],
    pool: int,
) -> jnp.ndarray:
    """CSI on ``pool x pool`` max-pooled event fields (neighborhood CSI).

    Max-pooling the *binary* exceedance field credits a forecast that puts
    the event within ``pool`` gridlengths of the observed location — the
    standard neighborhood verification used for high thresholds.
    Spatial axes are the last three ``(..., H, W, C)``.
    """
    thr = jnp.atleast_1d(jnp.asarray(threshold, jnp.float32))

    def max_pool_events(v):
        f = jnp.asarray(v, jnp.float32)
        ev = (f[None] >= thr.reshape((-1,) + (1,) * f.ndim)).astype(jnp.float32)
        flat = ev.reshape((-1,) + f.shape[-3:])
        if pool > 1:
            flat = jax.lax.reduce_window(
                flat, -jnp.inf, jax.lax.max, (1, pool, pool, 1), (1, pool, pool, 1), "VALID"
            )
        return flat.reshape((thr.shape[0], -1))

    pe = max_pool_events(prediction) > 0.5
    oe = max_pool_events(observation) > 0.5
    hits = jnp.sum(pe & oe, axis=1)
    misses = jnp.sum(~pe & oe, axis=1)
    false_alarms = jnp.sum(pe & ~oe, axis=1)
    out = hits / jnp.maximum(hits + misses + false_alarms, 1e-12)
    return out[0] if np.ndim(threshold) == 0 else out


def ensemble_mean_mse(samples: jnp.ndarray, observation: jnp.ndarray) -> jnp.ndarray:
    """MSE of the ensemble mean (deterministic-skill summary)."""
    mean = jnp.mean(samples.astype(jnp.float32), axis=0)
    return jnp.mean(jnp.square(mean - jnp.asarray(observation, jnp.float32)))
