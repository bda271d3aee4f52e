"""Fused eval-mode GBlock as one Pallas TPU kernel.

GBlock (reference ``/root/reference/dgmr/common.py:17-84``) in eval mode is

    sc  = x                     (or conv1x1(x) when channels change)
    y   = conv2( relu(a2 * conv1( relu(a1*x + b1) ) + b2) )
    out = y + sc

XLA fuses the elementwise pieces into the convs, but each conv still
round-trips its input/output through HBM — for the sampler's large-spatial
levels that traffic (not FLOPs) is the bound (docs/DESIGN.md "Performance
analysis").  This kernel chains BOTH convs and all elementwise math over an
H-tile held in VMEM: HBM sees one read of x and one write of out.

Implementation notes:

* BN is pre-folded by the caller into the per-channel affine ``a = scale /
  sqrt(var+eps)``, ``b = bias - mean*a`` (eval-mode BN is affine);
  spectral-norm sigmas are pre-folded into the conv kernels.
* Two chained 3x3 convs need a 2-row halo; Pallas BlockSpecs are disjoint,
  so ``x`` is zero-padded by HALO rows host-side and each tile DMAs its
  (TH + 2*HALO)-row window from HBM — always aligned and in-bounds, and the
  zero padding reproduces SAME conv semantics exactly.  W is zero-padded in
  VMEM.
* Convs run as 9 shifted ``(rows*W, C) @ (C, C')`` MXU matmuls with f32
  accumulation.

Eval/inference only — the training path keeps the XLA formulation (and its
autodiff).  Exactness vs the lax path is pinned by
``tests/test_pallas.py::test_pallas_gblock_matches_lax``.

STATUS: experimental, NOT integrated.  Measured on v5e at the sampler's
192ch/64^2/288-batch shape: 5.08 ms vs XLA's 3.71 ms — XLA's conv pipeline
(with its own fusion + layout machinery) beats this hand fusion; the
channel padding required by Mosaic's 128-lane HBM-slice alignment erodes
the HBM-traffic savings.  Kept as a verified-exact substrate and a record
of the measured result (docs/DESIGN.md "Performance analysis").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 2  # two chained 3x3 convs


def _conv3x3_slab(slab, kernel, rows_out, w):
    """VALID 3x3 conv over a zero-W-padded slab ``(rows_out+2, w+2, Cin)``."""
    cin = slab.shape[-1]
    cout = kernel.shape[-1]
    acc = jnp.zeros((rows_out * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = slab[dy : dy + rows_out, dx : dx + w, :].reshape(rows_out * w, cin)
            acc = acc + jnp.dot(
                patch, kernel[dy, dx].astype(jnp.float32), preferred_element_type=jnp.float32
            )
    return acc.reshape(rows_out, w, cout)


def _gblock_kernel(
    x_hbm,  # (N * (H + 2*HALO), W, Cpad) in ANY/HBM — pre-padded in H, N
    #         folded into rows (one dynamic slice index), channels padded to
    #         a 128 multiple (Mosaic requires lane-aligned HBM slices)
    k1_ref,  # (3, 3, Cin, Cin)
    k2_ref,  # (3, 3, Cin, Cout)
    ksc_ref,  # (1, 1, Cin, Cout) shortcut 1x1 (zeros if identity)
    aff_ref,  # (5, Cmax): a1, b1, a2, b2, b_out (channel-padded)
    out_ref,  # block (1, TH, W, Cout)
    raw,  # VMEM (TH + 2*HALO, W, Cpad): DMA landing buffer (no slicing)
    slab,  # VMEM (TH + 2*HALO, W + 2, Cin)
    mid,  # VMEM (TH + 2, W + 2, Cin): conv1 output staged for conv2
    sem,  # DMA semaphore
    *,
    th: int,
    w: int,
    cin: int,
    cout: int,
    use_sc_conv: bool,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * th  # in padded coordinates the window starts exactly here
    h_pad = pl.num_programs(1) * th + 2 * HALO
    base = n * h_pad + row0

    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(base, th + 2 * HALO), :, :],
        raw,
        sem,
    )
    copy.start()
    copy.wait()
    slab[:] = jnp.zeros_like(slab)
    slab[:, 1 : w + 1, :] = raw[:, :, :cin].astype(jnp.float32)

    a1 = aff_ref[0, :cin]
    b1 = aff_ref[1, :cin]
    a2 = aff_ref[2, :cin]
    b2 = aff_ref[3, :cin]
    b_out = aff_ref[4, :cout]

    # Stage 1: relu(a1*x + b1).  The affine must NOT leak into the zero
    # padding (SAME conv sees zeros there), so re-zero pad rows/cols.  The
    # slab's first/last HALO rows are either true image rows or the host
    # zero-padding; the host padding is zero, and relu(a1*0 + b1) = relu(b1)
    # would corrupt it — mask all-zero rows/cols explicitly by applying the
    # affine only to the image interior region we copied (cols 1..w) and
    # rows that correspond to real image rows.  Zero rows stay zero through
    # relu iff we multiply the affine result by their mask.
    stage1 = jax.nn.relu(slab[:] * a1 + b1)
    colmask = (
        (jax.lax.broadcasted_iota(jnp.int32, (1, w + 2, 1), 1) >= 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (1, w + 2, 1), 1) <= w)
    ).astype(jnp.float32)
    # Row mask: padded rows hold zeros only where the host put them; inside
    # the image they are real rows. Track real-row range in padded coords:
    # real rows live at padded indices [HALO, HALO + H). This tile covers
    # padded rows [row0, row0 + TH + 2*HALO); a row r is real iff
    # HALO <= row0 + r < HALO + H  <=>  0 <= row0 + r - HALO < H.
    h_real = pl.num_programs(1) * th
    ridx = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * HALO, 1, 1), 0) + row0 - HALO
    rowmask = ((ridx >= 0) & (ridx < h_real)).astype(jnp.float32)
    stage1 = stage1 * colmask * rowmask

    # conv1 -> TH + 2 rows (one remaining halo row each side for conv2).
    mid[:] = jnp.zeros_like(mid)
    conv1_out = _conv3x3_slab(stage1, k1_ref[:], th + 2, w)
    stage2 = jax.nn.relu(conv1_out * a2 + b2)
    # conv1's SAME output at padded-row positions outside the real image is
    # NOT zero (it sees partial windows), but the dense reference computes
    # those rows the same way only *inside* the image; rows outside must be
    # zero for conv2's SAME semantics.  Mask them.
    midx = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + row0 - 1
    midmask = ((midx >= 0) & (midx < h_real)).astype(jnp.float32)
    # mid row m holds logical row (row0 - 1 + m): conv2's output row r is
    # then centered at mid row r+1 = logical row0 + r, i.e. this tile's rows.
    mid[0 : th + 2, 1 : w + 1, :] = stage2 * midmask

    y = _conv3x3_slab(mid[:], k2_ref[:], th, w)

    # Shortcut from the slab's interior rows.
    x_in = slab[HALO : HALO + th, 1 : w + 1, :]
    if use_sc_conv:
        sc = jnp.dot(
            x_in.reshape(th * w, cin),
            ksc_ref[0, 0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(th, w, cout)
    else:
        sc = x_in.astype(jnp.float32)
    out_ref[0] = (y + sc + b_out).astype(out_ref.dtype)


def fold_gblock_variables(variables, *, bn_eps: float = 1e-5):
    """Fold a GBlock's variables into the fused-kernel arguments.

    Returns ``(k1, k2, ksc, a1, b1, a2, b2, use_sc_conv)`` with spectral
    norm folded into the kernels (eval sigma) and BN folded to affines.
    """
    from . import spectral_norm as sn

    p = variables["params"]
    bs = variables["batch_stats"]
    sp = variables["spectral"]

    def norm_kernel(name):
        k = p[name]["kernel"]
        u, v = sp[name]["uv"]
        sigma = sn.spectral_sigma(sn.kernel_to_weight_mat(k), u, v)
        return k / sigma, p[name]["bias"]  # SN does not normalize the bias

    def bn_affine(name):
        scale, bias = p[name]["scale"], p[name]["bias"]
        mean, var = bs[name]["mean"], bs[name]["var"]
        a = scale / jnp.sqrt(var + bn_eps)
        return a, bias - mean * a

    k1, c1b = norm_kernel("first_conv_3x3")
    k2, c2b = norm_kernel("last_conv_3x3")
    ksc, scb = norm_kernel("conv_1x1")
    a1, b1 = bn_affine("bn1")
    a2, b2 = bn_affine("bn2")
    # conv1's bias folds into the bn2 affine offset: relu(a2*(conv1+c1b)+b2).
    b2 = a2 * c1b + b2
    use_sc_conv = k1.shape[2] != k2.shape[3]  # Cin != Cout
    # conv2's bias (and the shortcut conv's, when used) is a flat output add.
    b_out = c2b + (scb if use_sc_conv else 0.0)
    return k1, k2, ksc, a1, b1, a2, b2, b_out, use_sc_conv


@functools.partial(jax.jit, static_argnames=("use_sc_conv", "tile_rows", "interpret"))
def gblock_fused(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    ksc: jnp.ndarray,
    a1: jnp.ndarray,
    b1: jnp.ndarray,
    a2: jnp.ndarray,
    b2: jnp.ndarray,
    b_out: jnp.ndarray,
    *,
    use_sc_conv: bool,
    tile_rows: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused eval GBlock.  ``x`` is ``(N, H, W, Cin)``; returns ``(N, H, W, Cout)``.

    ``k1``/``k2`` are spectral-norm-folded HWIO kernels; ``ksc`` the 1x1
    shortcut kernel (pass zeros with ``use_sc_conv=False`` for identity);
    ``a*/b*`` the folded BN affines.  ``H`` must be a multiple of
    ``tile_rows``.
    """
    n, h, w, cin = x.shape
    cout = k2.shape[-1]
    th = tile_rows
    if h % th or th < 2 * HALO:
        raise ValueError(f"H={h} must be a multiple of tile_rows={th} >= {2*HALO}")
    cmax = max(cin, cout)
    aff = jnp.zeros((5, cmax), jnp.float32)
    aff = (
        aff.at[0, :cin].set(a1).at[1, :cin].set(b1)
        .at[2, :cin].set(a2).at[3, :cin].set(b2)
        .at[4, :cout].set(jnp.broadcast_to(b_out, (cout,)))
    )
    cpad = ((cin + 127) // 128) * 128
    x_padded = jnp.pad(
        x, ((0, 0), (HALO, HALO), (0, 0), (0, cpad - cin))
    ).reshape(n * (h + 2 * HALO), w, cpad)

    kernel = functools.partial(
        _gblock_kernel, th=th, w=w, cin=cin, cout=cout, use_sc_conv=use_sc_conv
    )
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, cin, cin), lambda nn, ii: (0, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda nn, ii: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, cin, cout), lambda nn, ii: (0, 0, 0, 0)),
            pl.BlockSpec((5, cmax), lambda nn, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda nn, ii: (nn, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALO, w, cpad), x.dtype),
            pltpu.VMEM((th + 2 * HALO, w + 2, cin), jnp.float32),
            pltpu.VMEM((th + 2, w + 2, cin), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_padded, k1, k2, ksc, aff)
