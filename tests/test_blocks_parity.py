"""Golden-value parity tests: composite blocks and stacks vs the reference.

Reference torch modules (PUBLIC, untrusted; used as numerical oracle only)
are instantiated, their weights converted into our NHWC/Flax modules, and
outputs compared in eval mode (and train mode where noted).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from skillful_nowcasting_tpu.hub.convert import convert_torch_state_dict, merge_into_variables
from skillful_nowcasting_tpu.layers import AttentionLayer, ConvGRU, ConvGRUCell
from skillful_nowcasting_tpu.models import (
    ContextConditioningStack,
    DBlock,
    GBlock,
    LatentConditioningStack,
    LBlock,
    UpsampleGBlock,
)

from ref_loader import load_reference

ref = load_reference()

RTOL = 2e-4
ATOL = 2e-5


def to_nhwc(t):
    return jnp.asarray(np.array(t.detach().numpy()).transpose(0, 2, 3, 1))


def from_nhwc(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def sync(module, tmodule, x, **init_kwargs):
    """Init our module on x and overlay the torch module's weights."""
    variables = module.init(jax.random.key(0), x, **init_kwargs)
    return merge_into_variables(variables, convert_torch_state_dict(tmodule.state_dict()))


def test_gblock_eval_parity():
    torch.manual_seed(0)
    tblock = ref.common.GBlock(input_channels=8, output_channels=16)
    tblock.eval()
    x = torch.randn(2, 8, 16, 16)
    with torch.no_grad():
        out_ref = tblock(x).numpy()

    block = GBlock(input_channels=8, output_channels=16)
    variables = sync(block, tblock, to_nhwc(x))
    out = block.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=ATOL)


def test_gblock_same_channels_eval_parity():
    """Shortcut conv unused when channels match; params still round-trip."""
    torch.manual_seed(1)
    tblock = ref.common.GBlock(input_channels=8, output_channels=8)
    tblock.eval()
    x = torch.randn(2, 8, 16, 16)
    with torch.no_grad():
        out_ref = tblock(x).numpy()

    block = GBlock(input_channels=8, output_channels=8)
    variables = sync(block, tblock, to_nhwc(x))
    out = block.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=ATOL)


def test_gblock_train_parity():
    """Train mode: batch stats + SN power iteration must track torch."""
    torch.manual_seed(2)
    tblock = ref.common.GBlock(input_channels=6, output_channels=12)
    tblock.train()
    x = torch.randn(3, 6, 8, 8)

    block = GBlock(input_channels=6, output_channels=12)
    variables = sync(block, tblock, to_nhwc(x))

    for _ in range(2):
        with torch.no_grad():
            out_ref = tblock(x).numpy()
        out, mutated = block.apply(
            variables,
            to_nhwc(x),
            train=True,
            mutable=["batch_stats", "spectral"],
        )
        variables = {**variables, **mutated}
        np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=1e-3, atol=1e-4)


def test_upsample_gblock_eval_parity():
    torch.manual_seed(3)
    tblock = ref.common.UpsampleGBlock(input_channels=8, output_channels=4)
    tblock.eval()
    x = torch.randn(2, 8, 16, 16)
    with torch.no_grad():
        out_ref = tblock(x).numpy()

    block = UpsampleGBlock(input_channels=8, output_channels=4)
    variables = sync(block, tblock, to_nhwc(x))
    out = block.apply(variables, to_nhwc(x))
    assert out.shape == (2, 32, 32, 4)
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize(
    "in_ch,out_ch,first_relu,keep_same",
    [(8, 16, True, False), (8, 16, False, False), (8, 8, True, True), (8, 16, True, True)],
)
def test_dblock_eval_parity(in_ch, out_ch, first_relu, keep_same):
    torch.manual_seed(4)
    tblock = ref.common.DBlock(
        input_channels=in_ch,
        output_channels=out_ch,
        first_relu=first_relu,
        keep_same_output=keep_same,
    )
    tblock.eval()
    x = torch.randn(2, in_ch, 16, 16)
    with torch.no_grad():
        out_ref = tblock(x).numpy()

    block = DBlock(
        input_channels=in_ch,
        output_channels=out_ch,
        first_relu=first_relu,
        keep_same_output=keep_same,
    )
    variables = sync(block, tblock, to_nhwc(x))
    out = block.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=ATOL)


def test_dblock_3d_eval_parity():
    torch.manual_seed(5)
    tblock = ref.common.DBlock(input_channels=4, output_channels=8, conv_type="3d")
    tblock.eval()
    x = torch.randn(2, 4, 6, 16, 16)  # (B, C, D, H, W)
    with torch.no_grad():
        out_ref = tblock(x).numpy()

    block = DBlock(input_channels=4, output_channels=8, conv_type="3d")
    xj = jnp.asarray(np.array(x.numpy()).transpose(0, 2, 3, 4, 1))  # NDHWC
    variables = sync(block, tblock, xj)
    out = block.apply(variables, xj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), out_ref, rtol=RTOL, atol=1e-4
    )


def test_lblock_eval_parity():
    torch.manual_seed(6)
    tblock = ref.common.LBlock(input_channels=8, output_channels=24)
    tblock.eval()
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        out_ref = tblock(x).numpy()

    block = LBlock(input_channels=8, output_channels=24)
    variables = sync(block, tblock, to_nhwc(x))
    out = block.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=ATOL)


def test_attention_layer_bugcompat_parity():
    torch.manual_seed(7)
    tlayer = ref.layers.AttentionLayer(input_channels=192, output_channels=192)
    # gamma init is zero -> output == input; randomize to exercise the path.
    tlayer.gamma.data = torch.tensor([0.7])
    tlayer.eval()
    x = torch.randn(2, 192, 8, 8)
    with torch.no_grad():
        out_ref = tlayer(x).numpy()

    layer = AttentionLayer(input_channels=192, output_channels=192)
    variables = sync(layer, tlayer, to_nhwc(x))
    out = layer.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=1e-4)


def test_conv_gru_cell_eval_parity():
    torch.manual_seed(8)
    import sys

    tcell = sys.modules["dgmr.layers.ConvGRU"].ConvGRUCell(
        input_channels=24 + 12, output_channels=12, kernel_size=3
    )
    tcell.eval()
    x = torch.randn(2, 24, 8, 8)
    h = torch.randn(2, 12, 8, 8)
    with torch.no_grad():
        out_ref, _ = tcell(x, h)
    out_ref = out_ref.numpy()

    cell = ConvGRUCell(input_channels=36, output_channels=12)
    variables = cell.init(jax.random.key(0), to_nhwc(x), to_nhwc(h))
    variables = merge_into_variables(variables, convert_torch_state_dict(tcell.state_dict()))
    out, _ = cell.apply(variables, to_nhwc(x), to_nhwc(h))
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("train", [False, True])
def test_conv_gru_parity(train):
    """Full unroll vs the reference Python loop, eval and train modes."""
    torch.manual_seed(9)
    tgru = ref.layers.ConvGRU(input_channels=24 + 12, output_channels=12, kernel_size=3)
    tgru.train(train)
    steps = 5
    xs = [torch.randn(2, 24, 8, 8) for _ in range(steps)]
    h0 = torch.randn(2, 12, 8, 8)
    with torch.no_grad():
        out_ref = tgru(xs, h0).numpy()  # (T, B, C, H, W)

    gru = ConvGRU(input_channels=36, output_channels=12)
    x_seq = jnp.stack([to_nhwc(xt) for xt in xs])
    variables = gru.init(jax.random.key(0), x_seq, to_nhwc(h0))

    torch.manual_seed(9)
    tgru_fresh = ref.layers.ConvGRU(input_channels=36, output_channels=12, kernel_size=3)
    variables = merge_into_variables(
        variables, convert_torch_state_dict(tgru_fresh.state_dict())
    )
    out, mutated = gru.apply(
        variables,
        x_seq,
        to_nhwc(h0),
        update_stats=train,
        mutable=["spectral"] if train else [],
    )
    out_np = np.stack([from_nhwc(out[t]) for t in range(steps)])
    np.testing.assert_allclose(out_np, out_ref, rtol=1e-3 if train else RTOL, atol=1e-4)


def test_conv_gru_static_input_matches_repeated():
    """x_static fast path == feeding the same tensor T times."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 24), jnp.float32)
    h0 = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 12), jnp.float32)
    gru = ConvGRU(input_channels=36, output_channels=12)
    x_seq = jnp.broadcast_to(x, (4,) + x.shape)
    variables = gru.init(jax.random.key(0), x_seq, h0)
    out_seq = gru.apply(variables, x_seq, h0)
    out_static = gru.apply(variables, x, h0, n_steps=4, x_static=True)
    np.testing.assert_allclose(np.asarray(out_seq), np.asarray(out_static), rtol=1e-6, atol=1e-6)


def test_context_conditioning_stack_eval_parity():
    torch.manual_seed(10)
    tstack = ref.common.ContextConditioningStack(
        input_channels=1, output_channels=96, num_context_steps=4
    )
    tstack.eval()
    x = torch.randn(2, 4, 1, 64, 64)
    with torch.no_grad():
        refs = [o.numpy() for o in tstack(x)]

    stack = ContextConditioningStack(input_channels=1, output_channels=96)
    xj = jnp.asarray(np.array(x.numpy()).transpose(0, 1, 3, 4, 2))  # (B,T,H,W,C)
    variables = sync(stack, tstack, xj)
    outs = stack.apply(variables, xj)
    assert len(outs) == 4
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(from_nhwc(o), r, rtol=RTOL, atol=1e-4)


def test_latent_conditioning_stack_eval_parity():
    torch.manual_seed(11)
    tstack = ref.common.LatentConditioningStack(shape=(8, 8, 8), output_channels=384)
    tstack.eval()
    x = torch.randn(2, 4, 1, 256, 256)

    # Pin the latent draw on the torch side.
    z_t = torch.randn(8, 8, 8, 1)

    class _FixedDist:
        def sample(self, shape):
            return z_t

    tstack.distribution = _FixedDist()
    with torch.no_grad():
        out_ref = tstack(x).numpy()

    stack = LatentConditioningStack(shape=(8, 8, 8), output_channels=384)
    # torch permutes z to (1, C, H, W); ours is NHWC.
    z_j = jnp.asarray(
        np.array(z_t.numpy()).transpose(3, 0, 1, 2).transpose(0, 2, 3, 1)
    )
    variables = stack.init(jax.random.key(0), z=z_j)
    variables = merge_into_variables(variables, convert_torch_state_dict(tstack.state_dict()))
    out = stack.apply(variables, z=z_j)
    assert out.shape == (1, 8, 8, 384)
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=1e-4)


@pytest.mark.parametrize("with_r", [False, True])
def test_coord_conv_parity(with_r):
    from skillful_nowcasting_tpu.layers import CoordConv

    torch.manual_seed(5)
    tcc = ref.layers.CoordConv(3, 5, with_r=with_r, kernel_size=3, padding=1)
    tcc.eval()
    x = torch.randn(2, 3, 12, 10)
    with torch.no_grad():
        out_ref = tcc(x).numpy()

    cc = CoordConv(5, with_r=with_r, conv_kwargs=dict(kernel_size=3, padding=1))
    variables = cc.init(jax.random.key(0), to_nhwc(x))
    variables = merge_into_variables(
        variables, {"params": {"conv": convert_torch_state_dict(tcc.conv.state_dict())["params"]}}
    )
    out = cc.apply(variables, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(out), out_ref, rtol=RTOL, atol=ATOL)
