"""AOT serving artifact tests: export -> save -> load -> exact replay.

The reference's deploy story is model code + checkpoint in every process
(``/root/reference/README.md:57-69``); ours is a serialized StableHLO
artifact (``serving.py``).  These tests pin the contract: the loaded
artifact reproduces the in-process ``make_generate`` bit-for-bit, with no
``skillful_nowcasting_tpu`` model code on the load path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.hub.pretrained import abstract_variables
from skillful_nowcasting_tpu.inference import make_generate
from skillful_nowcasting_tpu.serving import load_exported, save_exported
from skillful_nowcasting_tpu.utils import random_fill_variables

TINY = dict(
    forecast_steps=2,
    input_channels=1,
    output_shape=128,
    latent_channels=256,
    context_channels=32,
    generation_steps=1,
    num_samples=2,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = DGMR(**TINY)
    variables = random_fill_variables(abstract_variables(model), jax.random.key(0))
    return model, variables


def test_export_roundtrip_exact(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = str(tmp_path / "tiny.dgmrx")
    meta = save_exported(path, model, variables, batch_size=2, microbatch=None)
    assert meta["artifact_version"] == 1
    assert meta["config"]["output_shape"] == 128
    assert meta["output_shape"] == [2, 2, 2, 128, 128, 1]
    # No-cast export records a real JSON null, not the string "None".
    assert meta["compute_dtype"] is None
    # PRNG contract is recorded for serving hosts with a different default.
    assert meta["prng_impl"] == str(jax.config.jax_default_prng_impl)
    assert meta["key_data_shape"] == list(
        jax.random.key_data(jax.random.key(0)).shape
    )

    server = load_exported(path).place()
    rng = np.random.default_rng(11)
    x = rng.random((2, 4, 128, 128, 1), np.float32)
    out = server.generate(x, seed=7)
    assert out.shape == tuple(meta["output_shape"])
    assert bool(jnp.isfinite(out).all())

    # Bit-exact vs the in-process jitted path (same program, same platform).
    direct = make_generate(model, microbatch=None)(
        variables, jnp.asarray(x), jax.random.key(7)
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(direct))


def test_export_microbatch_and_weight_update(model_and_vars, tmp_path):
    """Microbatched program exports; fresh weights feed in without re-export."""
    model, variables = model_and_vars
    path = str(tmp_path / "tiny_mb.dgmrx")
    save_exported(path, model, variables, batch_size=4, microbatch=2)
    server = load_exported(path).place()

    rng = np.random.default_rng(3)
    x = rng.random((4, 4, 128, 128, 1), np.float32)
    out = server.generate(x, seed=1)
    assert out.shape == (2, 4, 2, 128, 128, 1)

    # Weights are program ARGUMENTS: perturb one leaf, output must change.
    # Pick a GENERATOR-path leaf — discriminator leaves ride along in the
    # artifact (full-tree contract) but are dead in the generate program.
    names = server.meta["param_names"]
    gen_idx = [i for i, n in enumerate(names) if "sampler" in n.lower()]
    assert gen_idx, f"no sampler leaves among {names[:5]}..."
    w2 = [np.asarray(w) for w in server.weights]
    idx = max(gen_idx, key=lambda i: w2[i].size)
    w2[idx] = w2[idx] + 0.05
    server.weights = w2
    out2 = server.generate(x, seed=1)
    assert float(np.max(np.abs(np.asarray(out) - np.asarray(out2)))) > 0


def test_prng_impl_recorded_and_enforced(model_and_vars, tmp_path):
    """generate() builds the key with the EXPORT-time impl; a corrupted /
    mismatched record fails with a format message, not a shape error."""
    model, variables = model_and_vars
    path = str(tmp_path / "tiny_prng.dgmrx")
    save_exported(path, model, variables, batch_size=1, microbatch=None)
    server = load_exported(path).place()
    x = np.zeros((1, 4, 128, 128, 1), np.float32)

    # Happy path: impl comes from meta, not the host default.
    assert server.generate(x, seed=0).shape == (2, 1, 2, 128, 128, 1)

    # A meta whose impl disagrees with the exported key shape (e.g. a hand-
    # edited artifact): rbg key data is (4,) uint32 vs the exported
    # threefry (2,) — the guard raises a format message, not a shape error.
    server.meta["prng_impl"] = "rbg"
    with pytest.raises(ValueError, match="jax_default_prng_impl"):
        server.generate(x, seed=0)


def test_export_bf16_compute(model_and_vars, tmp_path):
    """compute_dtype=bf16 artifact: f32 interface, finite, close to f32."""
    model, variables = model_and_vars
    path = str(tmp_path / "tiny_bf16.dgmrx")
    meta = save_exported(
        path, model, variables, batch_size=1, microbatch=None,
        compute_dtype=jnp.bfloat16,
    )
    assert meta["compute_dtype"] == "bfloat16"
    server = load_exported(path).place()
    x = np.random.default_rng(5).random((1, 4, 128, 128, 1), np.float32)
    out = np.asarray(server.generate(x, seed=2))
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
