"""Fused ConvGRU recurrence as one Pallas TPU kernel.

The GRU rollout is the generator's sequential bottleneck: 18 steps x 4
levels of small 3x3 convs.  Under XLA each scan step launches several
kernels and round-trips the hidden state through HBM; at the 8x8-to-32x32
levels the work is latency-bound (measured 20 ms for the 8x8 level alone at
batch 16 — more than the level's FLOPs justify by ~10x).

This kernel runs the ENTIRE recurrence for one batch element inside one
``pallas_call``:

* grid ``(B, T)`` — the TPU grid is a sequential loop, so scratch memory
  persists across ``t``: the hidden state lives in VMEM for all 18 steps
  (zero HBM round-trips between steps);
* per-step inputs ``gx[t]`` (the precomputed input-part gate activations,
  see ``layers/convgru.py``) are streamed per grid step by the Pallas
  pipeline (automatic double-buffering against compute);
* each 3x3 conv is 9 shifted ``(H*W, C) @ (C, C')`` MXU matmuls over a
  zero-padded VMEM image, accumulated in f32;
* gate math (sigmoid/relu/lerp) fuses into the same kernel on the VPU.

Math (reference ``/root/reference/dgmr/layers/ConvGRU.py:57-85``):
    r = sigmoid(gx_r + conv(h, k_r));  u = sigmoid(gx_u + conv(h, k_u))
    c = relu(gx_c + conv(r*h, k_c));   h' = u*h + (1-u)*c

Eval path only (spectral-norm sigmas are folded into the kernels by the
caller); the training path keeps the lax.scan formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(gx_ref, h0_ref, kru_ref, kc_ref, bias_ref, out_ref, hpad, rpad):
    """One (b, t) grid step: one GRU update with h resident in VMEM."""
    t = pl.program_id(1)
    h_dim = h0_ref.shape[1]
    w_dim = h0_ref.shape[2]
    c = h0_ref.shape[3]

    @pl.when(t == 0)
    def _init():
        hpad[:] = jnp.zeros_like(hpad)
        rpad[:] = jnp.zeros_like(rpad)
        hpad[1 : h_dim + 1, 1 : w_dim + 1, :] = h0_ref[0].astype(jnp.float32)

    gx = gx_ref[0, 0].astype(jnp.float32)  # (H, W, 3C)
    h = hpad[1 : h_dim + 1, 1 : w_dim + 1, :]  # (H, W, C) f32

    # conv(h, k_ru): 9 shifted matmuls accumulated in f32 -> (H*W, 2C)
    acc_ru = jnp.zeros((h_dim * w_dim, 2 * c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = hpad[dy : dy + h_dim, dx : dx + w_dim, :].reshape(h_dim * w_dim, c)
            acc_ru = acc_ru + jnp.dot(
                patch,
                kru_ref[dy, dx].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
    acc_ru = acc_ru.reshape(h_dim, w_dim, 2 * c)

    bias = bias_ref[0].astype(jnp.float32)
    read = jax.nn.sigmoid(gx[:, :, :c] + acc_ru[:, :, :c] + bias[:c])
    update = jax.nn.sigmoid(gx[:, :, c : 2 * c] + acc_ru[:, :, c:] + bias[c : 2 * c])

    rpad[1 : h_dim + 1, 1 : w_dim + 1, :] = read * h
    acc_c = jnp.zeros((h_dim * w_dim, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = rpad[dy : dy + h_dim, dx : dx + w_dim, :].reshape(h_dim * w_dim, c)
            acc_c = acc_c + jnp.dot(
                patch,
                kc_ref[dy, dx].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
    cand = jax.nn.relu(gx[:, :, 2 * c :] + acc_c.reshape(h_dim, w_dim, c) + bias[2 * c :])

    new_h = update * h + (1.0 - update) * cand
    hpad[1 : h_dim + 1, 1 : w_dim + 1, :] = new_h
    out_ref[0, 0] = new_h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_steps", "interpret"))
def convgru_rollout(
    gx_seq: jnp.ndarray,
    h0: jnp.ndarray,
    k_ru: jnp.ndarray,
    k_c: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    n_steps: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the full fused recurrence.

    Args:
        gx_seq: ``(T, B, H, W, 3C)`` input-part gate activations
            (order: read, update, candidate), spectral norm already applied.
            A leading axis of 1 with ``n_steps > 1`` is the static-input fast
            path (the Sampler's bottom level): the single block is reused
            every step without materializing T copies.
        h0: ``(B, H, W, C)`` initial hidden state.
        k_ru: ``(3, 3, C, 2C)`` fused read+update hidden kernels (normalized).
        k_c: ``(3, 3, C, C)`` candidate hidden kernel (normalized).
        bias: ``(3C,)`` gate biases (read, update, candidate).
        n_steps: number of steps (defaults to ``gx_seq.shape[0]``).
        interpret: run in interpreter mode (for CPU tests).

    Returns:
        ``(n_steps, B, H, W, C)`` stacked hidden states, dtype of ``gx_seq``.
    """
    t_in, b, h, w, c3 = gx_seq.shape
    t = n_steps if n_steps is not None else t_in
    static = t_in == 1 and t > 1
    c = c3 // 3
    dtype = gx_seq.dtype

    # Batch-major so the sequential (t) axis is innermost in the grid.
    gx_bt = jnp.swapaxes(gx_seq, 0, 1)  # (B, T_in, H, W, 3C)
    gx_index = (
        (lambda bb, tt: (bb, 0, 0, 0, 0)) if static else (lambda bb, tt: (bb, tt, 0, 0, 0))
    )

    out = pl.pallas_call(
        _gru_kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, h, w, c3), gx_index),
            pl.BlockSpec((1, h, w, c), lambda bb, tt: (bb, 0, 0, 0)),
            pl.BlockSpec((3, 3, c, 2 * c), lambda bb, tt: (0, 0, 0, 0)),
            pl.BlockSpec((3, 3, c, c), lambda bb, tt: (0, 0, 0, 0)),
            pl.BlockSpec((1, c3), lambda bb, tt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w, c), lambda bb, tt: (bb, tt, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), jnp.float32),
            pltpu.VMEM((h + 2, w + 2, c), jnp.float32),
        ],
        interpret=interpret,
    )(gx_bt, h0, k_ru, k_c, bias.reshape(1, c3))
    return jnp.swapaxes(out, 0, 1)  # (T, B, H, W, C)
