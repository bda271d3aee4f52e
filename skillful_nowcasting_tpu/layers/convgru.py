"""Convolutional GRU: TPU-native scan formulation with exact reference math.

Reference: ``/root/reference/dgmr/layers/ConvGRU.py`` — a cell of three
spectrally-normalized 3x3 convs (read gate, update gate, candidate) unrolled
over time by a Python loop.  Step math (``ConvGRU.py:57-85``):

    r  = sigmoid(conv_r([x; h]))
    u  = sigmoid(conv_u([x; h]))
    c  = relu(conv_c([x; r * h]))
    h' = u * h + (1 - u) * c

TPU-first design decisions:

* The time recurrence is a single ``jax.lax.scan`` — compiled once, no
  Python unrolling.
* Because conv is linear over the channel concat, each gate conv splits into
  an input part and a hidden part: ``conv([x; h]) = conv_x(x) + conv_h(h)``.
  The input parts for *all* timesteps are computed up front as one big
  batched conv (T folded into the batch → large MXU matmuls); only the
  hidden-part convs stay inside the sequential scan.  For DGMR's bottom
  level the input channels (latent, 768) dominate the hidden channels (384),
  so ~2/3 of the GRU conv FLOPs move out of the sequential loop.
* Train-mode spectral norm runs its per-timestep power iteration inside the
  scan (torch iterates u/v once per cell forward), dividing activations by
  the per-step sigma — numerically identical to torch's per-step
  ``W / sigma_t`` since conv is linear.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import initializers as tinit
from ..ops import spectral_norm as sn
from ..remat_names import tag as _remat_tag


class _SNConvParams(nn.Module):
    """Declares (kernel, bias, spectral u/v) without applying the conv."""

    features: int
    kernel_size: int
    sn_eps: float

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = self.param(
            "kernel", tinit.torch_conv_kernel_init, (k, k, in_features, self.features)
        )
        bias = self.param(
            "bias", tinit.torch_bias_init(in_features * k * k), (self.features,)
        )
        uv = self.variable(
            "spectral",
            "uv",
            lambda: sn.init_uv(
                self.make_rng("params") if self.has_rng("params") else jax.random.key(0),
                sn.kernel_to_weight_mat(kernel),
                self.sn_eps,
            ),
        )
        return kernel, bias, uv


def _conv2d(x, kernel):
    """3x3/SAME (padding 1) NHWC conv used by all GRU gate convs."""
    pad = (kernel.shape[0] - 1) // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(pad, pad), (pad, pad)], dimension_numbers=dn
    )


def _conv_batched(x_seq, kernel):
    """Conv over (T, B, H, W, C) by folding T into the batch."""
    t, b = x_seq.shape[:2]
    y = _conv2d(x_seq.reshape((t * b,) + x_seq.shape[2:]), kernel)
    return y.reshape((t, b) + y.shape[1:])


class ConvGRUCell(nn.Module):
    """Single ConvGRU step (standalone API parity with the reference cell).

    ``input_channels`` is the *total* concatenated channel count (x + h), as
    in the reference (``ConvGRU.py:29-37``; see ``tests/test_model.py:51-58``).
    """

    input_channels: int
    output_channels: int
    kernel_size: int = 3
    sn_eps: float = 1e-4

    def setup(self):
        self.read_gate_conv = _SNConvParams(
            self.output_channels, self.kernel_size, self.sn_eps, name="read_gate_conv"
        )
        self.update_gate_conv = _SNConvParams(
            self.output_channels, self.kernel_size, self.sn_eps, name="update_gate_conv"
        )
        self.output_conv = _SNConvParams(
            self.output_channels, self.kernel_size, self.sn_eps, name="output_conv"
        )

    def _raw(self):
        xc = self.input_channels - self.output_channels
        out = []
        for mod in (self.read_gate_conv, self.update_gate_conv, self.output_conv):
            kernel, bias, uv = mod(self.input_channels)
            out.append((kernel, bias, uv))
        return xc, out

    def __call__(
        self, x: jnp.ndarray, h: jnp.ndarray, *, update_stats: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One step on NHWC inputs; returns (out, new_state) like the reference."""
        _, raws = self._raw()
        kernels = []
        for kernel, bias, uv in raws:
            u, v = uv.value
            kernel_n, nu, nv = sn.normalize_kernel(kernel, u, v, self.sn_eps, update_stats)
            if update_stats and not self.is_initializing():
                uv.value = (nu, nv)
            kernels.append((kernel_n, bias))

        (kr, br), (ku, bu), (kc, bc) = kernels
        dtype = x.dtype
        kr, ku, kc = kr.astype(dtype), ku.astype(dtype), kc.astype(dtype)
        br, bu, bc = br.astype(dtype), bu.astype(dtype), bc.astype(dtype)
        h = h.astype(dtype)
        xh = jnp.concatenate([x, h], axis=-1)
        read = jax.nn.sigmoid(_conv2d(xh, kr) + br)
        update = jax.nn.sigmoid(_conv2d(xh, ku) + bu)
        gated = jnp.concatenate([x, read * h], axis=-1)
        c = jax.nn.relu(_conv2d(gated, kc) + bc)
        out = update * h + (1.0 - update) * c
        return out, out


class ConvGRU(nn.Module):
    """Unrolls a shared :class:`ConvGRUCell` over time with ``lax.scan``.

    Reference API parity (``ConvGRU.py:88-111``): input sequence of shape
    ``(T, B, H, W, Cx)`` (or ``(B, H, W, Cx)`` with ``x_static=True`` when
    every step receives the same tensor — the Sampler's bottom level,
    ``/root/reference/dgmr/generators.py:149``), initial hidden state
    ``(B, H, W, Ch)``; returns stacked outputs ``(T, B, H, W, Ch)``.
    """

    input_channels: int
    output_channels: int
    kernel_size: int = 3
    sn_eps: float = 1e-4
    # Fused Pallas rollout (ops/pallas_gru.py). Measured at parity with the
    # XLA scan on v5e (lvl1 3.5->3.8 ms, lvl2 8.4->7.8 ms at B=16), so it is
    # opt-in; None currently means off.
    use_pallas: Optional[bool] = None

    def setup(self):
        self.cell = ConvGRUCell(
            self.input_channels,
            self.output_channels,
            self.kernel_size,
            self.sn_eps,
            name="cell",
        )

    def __call__(
        self,
        x_seq: jnp.ndarray,
        hidden_state: jnp.ndarray,
        *,
        n_steps: Optional[int] = None,
        update_stats: bool = False,
        x_static: bool = False,
    ) -> jnp.ndarray:
        xc, raws = self.cell._raw()
        (kr, br, uv_r), (ku, bu, uv_u), (kc, bc, uv_c) = raws
        if x_static:
            assert n_steps is not None, "x_static requires n_steps"
            t = n_steps
        else:
            t = x_seq.shape[0]

        # Split kernels into input / hidden channel slabs (concat order [x; h]).
        kr_x, kr_h = kr[:, :, :xc, :], kr[:, :, xc:, :]
        ku_x, ku_h = ku[:, :, :xc, :], ku[:, :, xc:, :]
        kc_x, kc_h = kc[:, :, :xc, :], kc[:, :, xc:, :]

        train = update_stats and not self.is_initializing()

        oc = self.output_channels

        if train:
            # Mixed precision: convs/gates run in the activation dtype; the
            # power iteration + sigma estimates stay on the raw f32 kernels.
            dtype = x_seq.dtype

            # Input-part convs with RAW kernels, batched over all timesteps
            # AND fused across the three gates (one conv, 3C outputs — one
            # big MXU matmul); per-step sigma applied inside the scan.
            k_x_all = jnp.concatenate([kr_x, ku_x, kc_x], axis=-1).astype(dtype)
            if x_static:
                gx = _conv2d(x_seq, k_x_all)
                gxr, gxu, gxc = gx[..., :oc], gx[..., oc : 2 * oc], gx[..., 2 * oc :]
                xs = None
            else:
                gx = _conv_batched(x_seq, k_x_all)
                gxr, gxu, gxc = gx[..., :oc], gx[..., oc : 2 * oc], gx[..., 2 * oc :]
                xs = (gxr, gxu, gxc)

            wm_r = sn.kernel_to_weight_mat(kr)
            wm_u = sn.kernel_to_weight_mat(ku)
            wm_c = sn.kernel_to_weight_mat(kc)
            sg = jax.lax.stop_gradient

            k_h_ru = jnp.concatenate([kr_h, ku_h], axis=-1).astype(dtype)
            kc_h = kc_h.astype(dtype)
            br_c, bu_c, bc_c = br.astype(dtype), bu.astype(dtype), bc.astype(dtype)
            hidden_state = hidden_state.astype(dtype)

            # Remat the step body: scan AD otherwise stacks every per-step
            # intermediate (gates, gated hidden, conv outputs) over T — a
            # dozen (T, B, H, W, C) tensors at the 64x64 level.  With remat
            # the saved residuals collapse to the carried h and the gx
            # slices (which the scan keeps anyway); the two hidden convs are
            # recomputed during backward.
            @partial(jax.checkpoint, prevent_cse=False)
            def step(carry, xt):
                h, (ur, vr), (uu, vu), (uc, vc) = carry
                ur, vr = sn.power_iteration(sg(wm_r), ur, vr, self.sn_eps)
                uu, vu = sn.power_iteration(sg(wm_u), uu, vu, self.sn_eps)
                uc, vc = sn.power_iteration(sg(wm_c), uc, vc, self.sn_eps)
                sig_r = sn.spectral_sigma(wm_r, sg(ur), sg(vr))
                sig_u = sn.spectral_sigma(wm_u, sg(uu), sg(vu))
                sig_c = sn.spectral_sigma(wm_c, sg(uc), sg(vc))
                if x_static:
                    gr, gu, gc = gxr, gxu, gxc
                else:
                    gr, gu, gc = xt
                gh = _conv2d(h, k_h_ru)
                read = jax.nn.sigmoid((gr + gh[..., :oc]) / sig_r.astype(dtype) + br_c)
                update = jax.nn.sigmoid((gu + gh[..., oc:]) / sig_u.astype(dtype) + bu_c)
                c = jax.nn.relu(
                    (gc + _conv2d(read * h, kc_h)) / sig_c.astype(dtype) + bc_c
                )
                out = update * h + (1.0 - update) * c
                # save_names remat policy (remat_names.py): with the carry
                # chain saved per step, the sequential scan forward is pruned
                # from the rollout's backward recompute entirely.
                out = _remat_tag(out, "convgru_carry")
                uvs = tuple(
                    tuple(_remat_tag(w, "convgru_uv") for w in uv)
                    for uv in ((ur, vr), (uu, vu), (uc, vc))
                )
                return (out,) + uvs, out

            carry0 = (hidden_state, uv_r.value, uv_u.value, uv_c.value)
            (h_f, uvr_f, uvu_f, uvc_f), outputs = jax.lax.scan(
                step, carry0, xs, length=t if x_static else None
            )
            uv_r.value = uvr_f
            uv_u.value = uvu_f
            uv_c.value = uvc_f
            return outputs

        # Eval: sigma is constant across steps — fold into the kernels once.
        # Sigma math stays f32; normalized kernels are cast to the activation
        # dtype so bf16 inputs run the whole recurrence in bf16.
        dtype = x_seq.dtype

        def norm(kernel, uv):
            u, v = uv.value
            k = kernel / sn.spectral_sigma(sn.kernel_to_weight_mat(kernel), u, v)
            return k.astype(dtype)

        kr_n, ku_n, kc_n = norm(kr, uv_r), norm(ku, uv_u), norm(kc, uv_c)
        kr_xn, kr_hn = kr_n[:, :, :xc, :], kr_n[:, :, xc:, :]
        ku_xn, ku_hn = ku_n[:, :, :xc, :], ku_n[:, :, xc:, :]
        kc_xn, kc_hn = kc_n[:, :, :xc, :], kc_n[:, :, xc:, :]

        br, bu, bc = br.astype(dtype), bu.astype(dtype), bc.astype(dtype)
        hidden_state = hidden_state.astype(dtype)

        # Gate fusion: one 3C-output conv for the input parts, one 2C-output
        # conv for the r+u hidden parts — bigger matmuls on the MXU.
        k_xn_all = jnp.concatenate([kr_xn, ku_xn, kc_xn], axis=-1)
        k_hn_ru = jnp.concatenate([kr_hn, ku_hn], axis=-1)
        if x_static:
            gx = _conv2d(x_seq, k_xn_all)
        else:
            gx = _conv_batched(x_seq, k_xn_all)

        # Fused Pallas recurrence: the whole rollout in one kernel, hidden
        # state VMEM-resident across steps (ops/pallas_gru.py).  The hidden
        # kernels stay VMEM-resident, so auto mode only fires when they fit
        # the ~16 MB budget alongside the streamed gx/out blocks.
        use_pallas = bool(self.use_pallas)
        if use_pallas:
            kernel_bytes = (k_hn_ru.size + kc_hn.size) * dtype.itemsize
            block_bytes = (
                3 * x_seq.shape[-3] * x_seq.shape[-2] * 4 * self.output_channels * 4
            )
            if self.kernel_size != 3 or kernel_bytes + block_bytes > 12 * 1024 * 1024:
                use_pallas = False  # would exceed the VMEM budget
        if use_pallas:
            from ..ops.pallas_gru import convgru_rollout

            gx_seq = gx[None] if x_static else gx
            bias_all = jnp.concatenate([br, bu, bc])
            return convgru_rollout(
                gx_seq,
                hidden_state,
                k_hn_ru.astype(dtype),
                kc_hn.astype(dtype),
                bias_all,
                n_steps=t,
                interpret=jax.default_backend() != "tpu",
            )

        if x_static:
            gxr, gxu, gxc = gx[..., :oc], gx[..., oc : 2 * oc], gx[..., 2 * oc :]
            xs = None
        else:
            gxr, gxu, gxc = gx[..., :oc], gx[..., oc : 2 * oc], gx[..., 2 * oc :]
            xs = (gxr, gxu, gxc)

        def step_eval(h, xt):
            if x_static:
                gr, gu, gc = gxr, gxu, gxc
            else:
                gr, gu, gc = xt
            gh = _conv2d(h, k_hn_ru)
            read = jax.nn.sigmoid(gr + gh[..., :oc] + br)
            update = jax.nn.sigmoid(gu + gh[..., oc:] + bu)
            c = jax.nn.relu(gc + _conv2d(read * h, kc_hn) + bc)
            out = update * h + (1.0 - update) * c
            return out, out

        _, outputs = jax.lax.scan(step_eval, hidden_state, xs, length=t if x_static else None)
        return outputs
