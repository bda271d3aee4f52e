"""Shape-contract smoke tests at the reference's test configs.

Mirrors ``/root/reference/tests/test_model.py``'s exact output-shape
assertions (conditioning scales :95-107, discriminator scores :110-140) —
the parity suites check values; these pin the public shape contracts.
"""

import jax
import jax.numpy as jnp
import pytest

from skillful_nowcasting_tpu import (
    ContextConditioningStack,
    Discriminator,
    LatentConditioningStack,
    SpatialDiscriminator,
    TemporalDiscriminator,
)


def test_context_stack_scale_shapes():
    # Reference test_model.py:95-107 (defaults, 128-input): scales at
    # H/4..H/32 with channels oc/8..oc.
    ctz = ContextConditioningStack(input_channels=1, output_channels=384)
    x = jnp.zeros((2, 4, 128, 128, 1))
    variables = jax.jit(ctz.init)(jax.random.key(0), x)
    scales = ctz.apply(variables, x)
    assert [tuple(s.shape) for s in scales] == [
        (2, 32, 32, 48),
        (2, 16, 16, 96),
        (2, 8, 8, 192),
        (2, 4, 4, 384),
    ]
    for s in scales:
        assert not bool(jnp.isnan(s).any())


def test_latent_stack_shape():
    # Reference test_model.py:84-92: (1, 768, 8, 8) -> ours NHWC.
    lat = LatentConditioningStack(shape=(8, 8, 8), output_channels=768)
    variables = jax.jit(lat.init)(jax.random.key(0))
    z = lat.apply(variables, rngs={"latent": jax.random.key(1)})
    assert z.shape == (1, 8, 8, 768)
    assert not bool(jnp.isnan(z).any())


@pytest.mark.parametrize(
    "cls,score_dim",
    [(SpatialDiscriminator, 1), (TemporalDiscriminator, 1), (Discriminator, 2)],
)
def test_discriminator_score_shapes(cls, score_dim):
    # Reference test_model.py:110-140: (B, 1, 1) per branch, (B, 2, 1) combined.
    disc = cls(input_channels=1)
    x = jnp.zeros((2, 8, 128, 128, 1))
    variables = jax.jit(disc.init, static_argnames=())(
        {"params": jax.random.key(0), "frames": jax.random.key(1)}, x
    )
    out = disc.apply(variables, x, rngs={"frames": jax.random.key(2)})
    assert out.shape == (2, score_dim, 1)
    assert not bool(jnp.isnan(out).any())


def test_discriminator_shrunk_towers_64():
    """Tower depths are configurable (reference fixes 4/3, discriminators.py:158,55);
    2/2 towers admit 64² inputs — the multichip dryrun's config."""
    disc = Discriminator(input_channels=1, num_spatial_layers=2, num_temporal_layers=2)
    x = jnp.zeros((2, 8, 64, 64, 1))
    variables = jax.jit(disc.init)(
        {"params": jax.random.key(0), "frames": jax.random.key(1)}, x
    )
    out = disc.apply(variables, x, rngs={"frames": jax.random.key(2)})
    assert out.shape == (2, 2, 1)
    assert not bool(jnp.isnan(out).any())
