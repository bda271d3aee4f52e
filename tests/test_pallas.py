"""Pallas fused ConvGRU kernel: parity vs the lax.scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skillful_nowcasting_tpu.layers.convgru import ConvGRU


@pytest.mark.parametrize("static", [False, True])
def test_pallas_convgru_matches_scan(static):
    t, b, hw, cin, cout = 4, 2, 8, 6, 4
    gru_ref = ConvGRU(cin + cout, cout, use_pallas=False)
    gru_pl = ConvGRU(cin + cout, cout, use_pallas=True)

    key = jax.random.key(0)
    if static:
        x = jax.random.normal(key, (b, hw, hw, cin))
        kw = dict(n_steps=t, x_static=True)
    else:
        x = jax.random.normal(key, (t, b, hw, hw, cin))
        kw = {}
    h0 = jax.random.normal(jax.random.key(1), (b, hw, hw, cout))

    variables = gru_ref.init(jax.random.key(2), x, h0, **kw)
    out_ref = gru_ref.apply(variables, x, h0, **kw)
    out_pl = gru_pl.apply(variables, x, h0, **kw)

    assert out_pl.shape == (t, b, hw, hw, cout)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("cin,cout", [(8, 8), (8, 12)])
def test_pallas_gblock_matches_lax(cin, cout):
    from skillful_nowcasting_tpu.models.common import GBlock
    from skillful_nowcasting_tpu.ops.pallas_gblock import (
        fold_gblock_variables,
        gblock_fused,
    )

    block = GBlock(input_channels=cin, output_channels=cout)
    x = jax.random.normal(jax.random.key(0), (3, 16, 12, cin))
    variables = block.init(jax.random.key(1), x)
    # Non-trivial BN stats so the affine folding is actually exercised.
    variables = jax.tree.map(
        lambda v: v + 0.1 * jnp.ones_like(v) if v.ndim == 1 else v, variables
    )
    out_ref = block.apply(variables, x, train=False)

    k1, k2, ksc, a1, b1, a2, b2, b_out, use_sc = fold_gblock_variables(variables)
    out = gblock_fused(
        x, k1, k2, ksc, a1, b1, a2, b2, b_out,
        use_sc_conv=use_sc, tile_rows=4, interpret=True,
    )
    assert use_sc == (cin != cout)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_convgru_rollout_direct():
    from skillful_nowcasting_tpu.ops.pallas_gru import convgru_rollout

    t, b, hw, c = 3, 2, 8, 4
    key = jax.random.key(3)
    gx = jax.random.normal(key, (t, b, hw, hw, 3 * c))
    h0 = jax.random.normal(jax.random.key(4), (b, hw, hw, c))
    k_ru = jax.random.normal(jax.random.key(5), (3, 3, c, 2 * c)) * 0.1
    k_c = jax.random.normal(jax.random.key(6), (3, 3, c, c)) * 0.1
    bias = jax.random.normal(jax.random.key(7), (3 * c,)) * 0.1

    out = convgru_rollout(gx, h0, k_ru, k_c, bias, interpret=True)
    assert out.shape == (t, b, hw, hw, c)

    # Reference step math in plain jax.
    def conv(x, k):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
        )

    h = h0
    for step in range(t):
        gh = conv(h, jnp.concatenate([k_ru[..., :c], k_ru[..., c:]], axis=-1))
        read = jax.nn.sigmoid(gx[step][..., :c] + gh[..., :c] + bias[:c])
        update = jax.nn.sigmoid(gx[step][..., c : 2 * c] + gh[..., c:] + bias[c : 2 * c])
        cand = jax.nn.relu(gx[step][..., 2 * c :] + conv(read * h, k_c) + bias[2 * c :])
        h = update * h + (1.0 - update) * cand
        np.testing.assert_allclose(
            np.asarray(out[step]), np.asarray(h), rtol=1e-5, atol=1e-5
        )
