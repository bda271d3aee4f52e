"""Generator: ConvGRU sampler pyramid + composition wrapper.

Reference: ``/root/reference/dgmr/generators.py`` (behavioral spec).  The
reference unrolls each of the 4 ConvGRU levels with Python lists and applies
the per-timestep conv pyramid in list comprehensions
(``generators.py:149-178``).  Here each level is:

* one ``lax.scan`` ConvGRU (hidden-part convs sequential, input-part convs
  batched over all T on the MXU — see ``layers/convgru.py``), then
* the 1x1 conv / GBlock / UpsampleGBlock applied to all T timesteps at once
  (T folded into the conv batch), with ``sequential=True`` preserving the
  reference's per-timestep train-mode BN/SN statistics.

The bottom level's input is the *same* latent tensor at every step
(``generators.py:149``), so it uses the ConvGRU static-input fast path: the
latent's gate contributions are computed once, not 18 times.

Layout: conditioning states and latent are NHWC; output is
``(B, T, H, W, C)``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..hub.pretrained import HubMixin
from ..layers.convgru import ConvGRU
from ..ops import Conv, TorchBatchNorm, depth_to_space
from .common import GBlock, UpsampleGBlock

from ..remat_names import tag as _name  # noqa: E402 — save_names remat tags


class Sampler(nn.Module, HubMixin):
    """Recurrent decoder from conditioning states + latent (``generators.py:20-182``).

    ``train_t_chunks``: in train mode the per-timestep conv pyramids (1x1 +
    GBlock + UpsampleGBlock per level, plus the output head) are applied in
    that many T-chunks, each under ``nn.remat`` — the backward pass then
    holds one chunk's activations instead of all 18 timesteps'.  This is
    EXACT, not an approximation: the only cross-timestep coupling in these
    blocks is (a) the spectral-norm power-iteration sequence, which depends
    only on the weights and the carried u/v state, and (b) the BatchNorm
    running-stat EMA, whose closed-form chunk updates compose to the full
    sequential update.  Both collections thread through the chunk calls in
    order (equality asserted in ``tests/test_training.py``).  Memory is what
    gates the paper config (batch 16, 6 samples) on a 16 GB chip.
    """

    forecast_steps: int = 18
    latent_channels: int = 768
    context_channels: int = 384
    output_channels: int = 1
    train_t_chunks: int = 6

    @nn.compact
    def __call__(
        self,
        conditioning_states: Sequence[jnp.ndarray],
        latent_dim: jnp.ndarray,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        lc, cc = self.latent_channels, self.context_channels
        init_states = conditioning_states
        batch = init_states[0].shape[0]

        # Quirk Q2: latent has batch 1; repeat across the real batch
        # (reference ``generators.py:146-148``).
        latent_dim = jnp.tile(latent_dim, (batch // latent_dim.shape[0], 1, 1, 1))

        t = self.forecast_steps
        n_chunks = (
            self.train_t_chunks
            if train
            and self.train_t_chunks > 1
            and t % self.train_t_chunks == 0
            and not self.is_initializing()
            else 1
        )

        def chunked(apply_fn, x):
            """Apply ``apply_fn(self, x_chunk)`` over T-chunks with remat.

            ``nn.scan`` with ``variable_carry`` threads the mutable
            collections (BN running stats, spectral u/v) through the chunks
            in order — each chunk's power-iteration sequence continues from
            the previous chunk's final state, which is exactly the
            full-sequence semantics.  The rematted body bounds the backward
            pass's live activations to one chunk.
            """
            if n_chunks == 1:
                return apply_fn(self, x)
            size = x.shape[0] // n_chunks
            xs = x.reshape((n_chunks, size) + x.shape[1:])

            def body(mdl, _carry, xc):
                return _carry, apply_fn(mdl, xc)

            scan = nn.scan(
                nn.remat(body, prevent_cse=False),
                variable_broadcast="params",
                variable_carry=("batch_stats", "spectral"),
                split_rngs={},
            )
            _, out = scan(self, None, xs)
            return out.reshape((x.shape[0],) + out.shape[2:])

        def level(h_seq, init_state, gru_name, conv_name, g_name, up_name, level_idx):
            div = 2 ** level_idx
            gru = ConvGRU(
                input_channels=lc // div + cc // div,
                output_channels=cc // div,
                kernel_size=3,
                name=gru_name,
            )
            if level_idx == 0:
                out = gru(
                    h_seq,
                    init_state,
                    n_steps=self.forecast_steps,
                    update_stats=train,
                    x_static=True,
                )
            else:
                out = gru(h_seq, init_state, update_stats=train)
            # Saveable under the "save_names" remat policy: with the GRU
            # output sequences kept, the post conv towers' forward is pruned
            # from the rollout's backward recompute (their backward
            # rematerializes chunk bodies from these saved inputs).  Saving
            # the per-step carries INSIDE the scan ("convgru_carry") instead
            # measured SLOWER (0.253 vs 0.262 steps/s, B=16 bf16): the extra
            # ~1.3 GB of saved stacks costs more HBM traffic than the pruned
            # GRU re-run saves.
            out = _name(out, "sampler_gru_seq")

            def post(mdl, xc):
                # Modules are created inside the (possibly lifted) body so
                # the transform tracks their variables; names are stable, so
                # the chunked and unchunked paths share parameters.
                del mdl  # children scope to self via the compact context
                xc = Conv(lc // div, kernel_size=1, spectral_norm=True, name=conv_name)(
                    xc, update_stats=train, sequential=True
                )
                xc = GBlock(lc // div, lc // div, name=g_name)(
                    xc, train=train, sequential=True
                )
                return UpsampleGBlock(lc // div, lc // (div * 2), name=up_name)(
                    xc, train=train, sequential=True
                )

            return chunked(post, out)

        # Level order: smallest scale first (quirk Q6) — conditioning state 4
        # feeds the first GRU (``generators.py:152``).  Inter-level outputs
        # (the next GRU's input sequence) are save_names-saveable; the last
        # level's (largest, 4x the others combined) is deliberately NOT — the
        # output head is cheap to rematerialize.
        h = level(latent_dim, init_states[3], "convGRU1", "gru_conv_1x1", "g1", "up_g1", 0)
        h = _name(h, "sampler_level_seq")
        h = level(h, init_states[2], "convGRU2", "gru_conv_1x1_2", "g2", "up_g2", 1)
        h = _name(h, "sampler_level_seq")
        h = level(h, init_states[1], "convGRU3", "gru_conv_1x1_3", "g3", "up_g3", 2)
        h = _name(h, "sampler_level_seq")
        h = level(h, init_states[0], "convGRU4", "gru_conv_1x1_4", "g4", "up_g4", 3)

        # Output head, per timestep (``generators.py:176-178``).
        def head(mdl, xc):
            del mdl
            xc = TorchBatchNorm(name="bn")(xc, train=train, sequential=True)
            xc = jax.nn.relu(xc)
            xc = Conv(
                4 * self.output_channels,
                kernel_size=1,
                spectral_norm=True,
                name="conv_1x1",
            )(xc, update_stats=train, sequential=True)
            return depth_to_space(xc, 2)

        h = chunked(head, h)  # (T, B, H, W, C)
        return jnp.swapaxes(h, 0, 1)  # (B, T, H, W, C)


def ensemble_forward(mdl, x: jnp.ndarray, num_samples: int, z=None) -> jnp.ndarray:
    """S-sample ensemble sharing ONE conditioning-stack pass (eval only).

    The reference generates an ensemble by S independent full forwards
    (``dgmr.py:175-178``), recomputing the deterministic conditioning stack
    every time.  Here the context states are computed once and the S samples
    are folded into the batch axis of a single sampler call (bigger MXU
    matmuls, no redundant context compute).  Exact per-sample semantics:
    every sample draws its own batch-1 latent shared across the batch
    (quirk Q2), and all eval ops are batch-independent, so the result equals
    S separate forwards with the same latents.

    Args:
        mdl: module exposing ``conditioning_stack``/``latent_stack``/``sampler``.
        x: NTHWC context frames ``(B, T_in, H, W, C)``.
        num_samples: ensemble size S.
        z: optional fixed latents ``(S, H/32, W/32, 8C)``; drawn from the
            ``"latent"`` rng stream if omitted.

    Returns:
        ``(S, B, T_out, H, W, C)`` ensemble.
    """
    s = num_samples
    b = x.shape[0]
    states = mdl.conditioning_stack(x, train=False)
    if z is None:
        key = mdl.make_rng("latent")
        c, h, w = mdl.latent_stack.shape
        z = jax.random.normal(key, (s, h, w, c), jnp.float32).astype(x.dtype)
    latent = mdl.latent_stack(x, z=z, train=False)  # (S, h, w, latent_channels)
    latent = jnp.repeat(latent, b, axis=0)  # sample-major (S*B, ...)
    states = tuple(jnp.tile(st, (s,) + (1,) * (st.ndim - 1)) for st in states)
    out = mdl.sampler(states, latent, train=False)  # (S*B, T, H, W, C)
    return out.reshape((s, b) + out.shape[1:])


class Generator(nn.Module, HubMixin):
    """``sampler(conditioning_stack(x), latent_stack(x))`` (``generators.py:185-212``)."""

    conditioning_stack: nn.Module
    latent_stack: nn.Module
    sampler: nn.Module

    def __call__(self, x: jnp.ndarray, *, train: bool = False, z=None) -> jnp.ndarray:
        conditioning_states = self.conditioning_stack(x, train=train)
        latent_dim = self.latent_stack(x, z=z, train=train)
        return self.sampler(conditioning_states, latent_dim, train=train)

    def generate_ensemble(self, x: jnp.ndarray, num_samples: int, *, z=None) -> jnp.ndarray:
        """Shared-context S-sample ensemble; see :func:`ensemble_forward`."""
        return ensemble_forward(self, x, num_samples, z=z)
