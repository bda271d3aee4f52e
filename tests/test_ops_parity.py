"""Golden-value parity tests: ops vs torch primitives."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from skillful_nowcasting_tpu.ops import (
    Conv,
    Dense,
    TorchBatchNorm,
    avg_pool,
    depth_to_space,
    space_to_depth,
    upsample_nearest_2x,
)
from skillful_nowcasting_tpu.hub.convert import convert_torch_state_dict, merge_into_variables

RTOL = 1e-5
ATOL = 1e-5


def to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def test_conv2d_parity():
    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(5, 7, kernel_size=3, padding=1)
    x = torch.randn(2, 5, 16, 16)
    ref = tconv(x).detach().numpy()

    conv = Conv(features=7, kernel_size=3, padding=1)
    variables = conv.init(jax.random.key(0), to_nhwc(x))
    variables = merge_into_variables(
        variables, convert_torch_state_dict(tconv.state_dict())
    )
    out = conv.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=RTOL, atol=ATOL)


def test_conv3d_parity():
    torch.manual_seed(0)
    tconv = torch.nn.Conv3d(4, 6, kernel_size=3, padding=1)
    x = torch.randn(2, 4, 5, 8, 8)
    ref = tconv(x).detach().numpy()

    conv = Conv(features=6, kernel_size=3, ndim=3, padding=1)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # NCDHW -> NDHWC
    variables = conv.init(jax.random.key(0), xj)
    variables = merge_into_variables(
        variables, convert_torch_state_dict(tconv.state_dict())
    )
    out = conv.apply(variables, xj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref, rtol=RTOL, atol=1e-4
    )


@pytest.mark.parametrize("eps", [1e-4, 1e-12])
def test_spectral_norm_conv_eval_parity(eps):
    torch.manual_seed(1)
    tconv = torch.nn.utils.parametrizations.spectral_norm(
        torch.nn.Conv2d(5, 7, kernel_size=3, padding=1), eps=eps
    )
    tconv.eval()
    x = torch.randn(2, 5, 12, 12)
    with torch.no_grad():
        ref = tconv(x).numpy()

    conv = Conv(features=7, kernel_size=3, padding=1, spectral_norm=True, sn_eps=eps)
    variables = conv.init(jax.random.key(0), to_nhwc(x))
    variables = merge_into_variables(
        variables, convert_torch_state_dict(tconv.state_dict())
    )
    out = conv.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=RTOL, atol=ATOL)


def test_spectral_norm_conv_train_parity():
    """Two train-mode forwards: u/v updates and sigma must track torch."""
    torch.manual_seed(2)
    tconv = torch.nn.utils.parametrizations.spectral_norm(
        torch.nn.Conv2d(3, 4, kernel_size=3, padding=1), eps=1e-4
    )
    tconv.train()
    x = torch.randn(2, 3, 8, 8)

    conv = Conv(features=4, kernel_size=3, padding=1, spectral_norm=True, sn_eps=1e-4)
    variables = conv.init(jax.random.key(0), to_nhwc(x))
    variables = merge_into_variables(
        variables, convert_torch_state_dict(tconv.state_dict())
    )

    for _ in range(3):
        with torch.no_grad():
            ref = tconv(x).numpy()
        out, mutated = conv.apply(
            variables, to_nhwc(x), update_stats=True, mutable=["spectral"]
        )
        variables = {**variables, **mutated}
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-4)

    # Final u/v buffers should match too.
    u_t = tconv.parametrizations.weight[0]._u.numpy()
    v_t = tconv.parametrizations.weight[0]._v.numpy()
    u_j, v_j = jax.tree.leaves(variables["spectral"])
    np.testing.assert_allclose(np.asarray(u_j), u_t, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_j), v_t, rtol=1e-3, atol=1e-4)


def test_spectral_norm_sequential_matches_loop():
    """sequential=True must equal torch's per-step loop over timesteps."""
    torch.manual_seed(3)
    tconv = torch.nn.utils.parametrizations.spectral_norm(
        torch.nn.Conv2d(3, 3, kernel_size=1), eps=1e-4
    )
    tconv.train()
    steps = 5
    xs = [torch.randn(2, 3, 4, 4) for _ in range(steps)]
    refs = []
    for xt in xs:
        with torch.no_grad():
            refs.append(tconv(xt).numpy())

    conv = Conv(features=3, kernel_size=1, spectral_norm=True, sn_eps=1e-4)
    x_seq = jnp.stack([to_nhwc(xt) for xt in xs])  # (S, B, H, W, C)
    variables = conv.init(jax.random.key(0), x_seq)
    # Note: init consumed the same state dict u/v (pre-loop).
    torch.manual_seed(3)
    tconv2 = torch.nn.utils.parametrizations.spectral_norm(
        torch.nn.Conv2d(3, 3, kernel_size=1), eps=1e-4
    )
    variables = merge_into_variables(
        variables, convert_torch_state_dict(tconv2.state_dict())
    )
    out, mutated = conv.apply(
        variables, x_seq, update_stats=True, sequential=True, mutable=["spectral"]
    )
    for s in range(steps):
        np.testing.assert_allclose(
            from_nhwc(out[s]), refs[s], rtol=1e-4, atol=1e-4
        )
    u_t = tconv.parametrizations.weight[0]._u.numpy()
    u_j = np.asarray(mutated["spectral"]["uv"][0])
    np.testing.assert_allclose(u_j, u_t, rtol=1e-3, atol=1e-4)


def test_linear_spectral_norm_parity():
    torch.manual_seed(4)
    tfc = torch.nn.utils.parametrizations.spectral_norm(torch.nn.Linear(9, 1))
    tfc.eval()
    x = torch.randn(3, 9)
    with torch.no_grad():
        ref = tfc(x).numpy()
    fc = Dense(features=1, spectral_norm=True)
    variables = fc.init(jax.random.key(0), jnp.asarray(x.numpy()))
    variables = merge_into_variables(variables, convert_torch_state_dict(tfc.state_dict()))
    out = fc.apply(variables, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_batchnorm_eval_parity():
    torch.manual_seed(5)
    tbn = torch.nn.BatchNorm2d(6)
    # Randomize running stats
    tbn.running_mean.data = torch.randn(6)
    tbn.running_var.data = torch.rand(6) + 0.5
    tbn.weight.data = torch.randn(6)
    tbn.bias.data = torch.randn(6)
    tbn.eval()
    x = torch.randn(2, 6, 8, 8)
    with torch.no_grad():
        ref = tbn(x).numpy()

    bn = TorchBatchNorm()
    variables = bn.init(jax.random.key(0), to_nhwc(x))
    variables = merge_into_variables(variables, convert_torch_state_dict(tbn.state_dict()))
    out = bn.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=RTOL, atol=ATOL)


def test_batchnorm_train_parity():
    torch.manual_seed(6)
    tbn = torch.nn.BatchNorm2d(4)
    tbn.train()
    x1 = torch.randn(3, 4, 5, 5)
    x2 = torch.randn(3, 4, 5, 5)

    bn = TorchBatchNorm()
    variables = bn.init(jax.random.key(0), to_nhwc(x1))
    variables = merge_into_variables(variables, convert_torch_state_dict(tbn.state_dict()))

    for x in (x1, x2):
        ref = tbn(x).detach().numpy()
        out, mutated = bn.apply(
            variables, to_nhwc(x), train=True, mutable=["batch_stats"]
        )
        variables = {**variables, **mutated}
        np.testing.assert_allclose(from_nhwc(out), ref, rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_batchnorm_sequential_matches_loop():
    """sequential=True must equal torch's per-timestep BN loop."""
    torch.manual_seed(7)
    tbn = torch.nn.BatchNorm2d(4)
    tbn.train()
    steps = 6
    xs = [torch.randn(3, 4, 5, 5) for _ in range(steps)]
    refs = [tbn(xt).detach().numpy() for xt in xs]

    bn = TorchBatchNorm()
    x_seq = jnp.stack([to_nhwc(xt) for xt in xs])
    variables = bn.init(jax.random.key(0), x_seq[0])
    out, mutated = bn.apply(
        variables, x_seq, train=True, sequential=True, mutable=["batch_stats"]
    )
    for s in range(steps):
        np.testing.assert_allclose(from_nhwc(out[s]), refs[s], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_pixel_unshuffle_parity():
    torch.manual_seed(8)
    x = torch.randn(2, 3, 8, 8)
    ref = torch.nn.PixelUnshuffle(2)(x).numpy()
    out = space_to_depth(to_nhwc(x), 2)
    np.testing.assert_array_equal(from_nhwc(out), ref)


def test_pixel_shuffle_parity():
    torch.manual_seed(9)
    x = torch.randn(2, 12, 4, 4)
    ref = torch.nn.PixelShuffle(2)(x).numpy()
    out = depth_to_space(to_nhwc(x), 2)
    np.testing.assert_array_equal(from_nhwc(out), ref)


def test_avg_pool2d_parity():
    x = torch.randn(2, 3, 7, 9)  # odd sizes: floor behavior
    ref = torch.nn.AvgPool2d(2)(x).numpy()
    out = avg_pool(to_nhwc(x), 2, ndim=2)
    np.testing.assert_allclose(from_nhwc(out), ref, rtol=RTOL, atol=ATOL)


def test_avg_pool3d_parity():
    x = torch.randn(2, 3, 5, 7, 9)
    ref = torch.nn.AvgPool3d(2, 2)(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out = avg_pool(xj, 2, ndim=3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref, rtol=RTOL, atol=ATOL
    )


def test_avg_pool3d_122_parity():
    x = torch.randn(2, 8, 1, 32, 32)  # (B, T, C, H, W) as used by TemporalDiscriminator
    ref = torch.nn.AvgPool3d((1, 2, 2), (1, 2, 2))(x).numpy()
    xj = jnp.asarray(x.numpy())  # treat as raw 5-D with trailing "C"=W? No — use ndim=3
    # Layout here: pool over last three dims (C, H, W) with window (1, 2, 2):
    # move to (..., C, H, W, dummy)? Simpler: treat (B, T) as batch, (C,H,W) spatial.
    xj = jnp.moveaxis(xj, 2, -1)  # (B, T, H, W, C) — pool H, W only
    out = avg_pool(xj, (2, 2), ndim=2)
    out = np.moveaxis(np.asarray(out), -1, 2)
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


def test_upsample_nearest_parity():
    x = torch.randn(2, 3, 5, 5)
    ref = torch.nn.Upsample(scale_factor=2, mode="nearest")(x).numpy()
    out = upsample_nearest_2x(to_nhwc(x))
    np.testing.assert_array_equal(from_nhwc(out), ref)
