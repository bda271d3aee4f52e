"""Attention einsum ops: reference-bug-compatible and corrected variants.

The reference's ``attention_einsum`` (``/root/reference/dgmr/layers/
Attention.py:9-20``) documents "[h, w, c]" inputs but is fed per-batch conv
outputs in **(C, H, W)** layout (``Attention.py:74-81``).  The resulting
computation — SURVEY.md quirk Q1 — attends over tokens indexed by (channel,
row) pairs with the *width* axis as the feature dimension:

    beta[c, h, L]  = softmax_L( sum_w q[c, h, w] * kflat[L, w] ),  L = c'*H + h'
    out[c, h, w]   = sum_L beta[c, h, L] * vflat[L, w]

The pretrained ``openclimatefix/dgmr`` weights were trained *with* this
behavior, so ``mode="torch_compat"`` (default) reproduces it exactly;
``mode="fixed"`` implements the intended spatial attention over (h, w) tokens
with channel features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_torch_compat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bug-compatible attention on NHWC inputs ``(B, H, W, C)``.

    Internally reproduces the reference's (C, H)-token computation and
    returns NHWC output of shape ``(B, H, W, Cv)``.
    """
    b, h, w, cq = q.shape
    cv = v.shape[-1]
    # To torch layout (B, C, H, W).
    qt = jnp.transpose(q, (0, 3, 1, 2))
    kt = jnp.transpose(k, (0, 3, 1, 2)).reshape(b, cq * h, w)  # (B, L, w)
    vt = jnp.transpose(v, (0, 3, 1, 2)).reshape(b, cv * h, w)  # (B, L, w)

    logits = jnp.einsum("bchw,blw->bchl", qt, kt)  # contract width axis
    beta = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bchl,blw->bchw", beta, vt)  # (B, Cq, H, W)
    return jnp.transpose(out, (0, 2, 3, 1))


def attention_fixed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Intended spatial attention: tokens = (h, w), features = channels."""
    b, h, w, cq = q.shape
    cv = v.shape[-1]
    qf = q.reshape(b, h * w, cq)
    kf = k.reshape(b, h * w, cq)
    vf = v.reshape(b, h * w, cv)
    logits = jnp.einsum("bqc,bkc->bqk", qf, kf)
    beta = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", beta, vf)
    return out.reshape(b, h, w, cv)
