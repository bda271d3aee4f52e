"""Multi-device DP tests on the 8-virtual-CPU-device mesh (SURVEY.md §4).

The default DP mode is shard_map (torch-DDP semantics: per-replica batch
stats and latent draws, pmean-ed gradients) because XLA's GSPMD partitioner
is an order of magnitude slower to compile on this GAN graph; the pjit
global-batch mode stays available (``mode="pjit"``) and is exercised on the
cheap generate path here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.parallel import (
    make_dp_eval_step,
    make_dp_generate,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from skillful_nowcasting_tpu.training import init_train_state, split_params

TINY = dict(
    forecast_steps=2,
    input_channels=1,
    output_shape=128,
    latent_channels=256,
    context_channels=32,
    generation_steps=1,
    num_samples=1,
)


@pytest.fixture(scope="module")
def setup():
    model = DGMR(**TINY)
    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((8, 4, 128, 128, 1), np.float32))
    future = jnp.asarray(rng.random((8, 2, 128, 128, 1), np.float32))
    state = init_train_state(model, jax.random.key(0), images[:1], future[:1])
    return model, mesh, images, future, state


def test_mesh_shape():
    mesh = make_mesh(n_data=4, n_space=2)
    assert mesh.shape == {"data": 4, "space": 2}
    assert make_mesh().shape["data"] == 8


def test_dp_train_step_runs(setup):
    model, mesh, images, future, state = setup
    step = make_dp_train_step(model, mesh, logging_forward=False, donate_state=False)
    sharded = shard_batch((images, future), mesh)
    new_state, metrics = step(state, *sharded, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1

    # Gradient pmean -> replicated params actually moved, and the returned
    # state is replica-consistent (fully addressable as one logical array).
    g0, _ = split_params(state.params)
    g1, _ = split_params(new_state.params)
    delta = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
    )
    assert delta > 0


def test_dp_single_device_fast_path(setup):
    """mesh.size == 1 -> plain jitted step (no shard_map/pjit wrapper).

    The single-chip CLI path goes through make_dp_train_step with a 1-device
    mesh; the fast path must keep the same contract (finite metrics, step
    increments, params move)."""
    model, _, images, future, state = setup
    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])
    assert mesh1.size == 1
    step = make_dp_train_step(model, mesh1, logging_forward=False, donate_state=False)
    images1, future1 = images[:1], future[:1]
    new_state, metrics = step(state, images1, future1, jax.random.key(4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    from skillful_nowcasting_tpu.parallel import make_dp_eval_step

    eval_step = make_dp_eval_step(model, mesh1)
    m = eval_step(new_state, images1, future1, jax.random.key(5))
    assert all(np.isfinite(float(v)) for v in m.values())


def test_dp_eval_step_runs(setup):
    model, mesh, images, future, state = setup
    eval_step = make_dp_eval_step(model, mesh)
    sharded = shard_batch((images, future), mesh)
    metrics = eval_step(state, *sharded, jax.random.key(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_dp_generate(setup):
    model, mesh, images, _, state = setup
    gen = make_dp_generate(model, mesh, num_samples=2)
    variables = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "spectral": state.spectral,
    }
    samples = gen(variables, shard_batch(images, mesh), jax.random.key(3))
    assert samples.shape == (2, 8, 2, 128, 128, 1)
    assert bool(jnp.isfinite(samples).all())
    # Different latent draws per sample.
    assert float(jnp.max(jnp.abs(samples[0] - samples[1]))) > 0


def test_halo_conv_matches_dense():
    """H-sharded conv with halo exchange is exact vs the unsharded conv."""
    from skillful_nowcasting_tpu.parallel import make_spatial_conv

    mesh = make_mesh(n_data=1, n_space=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 32, 5), np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.1)

    sharded_conv = make_spatial_conv(mesh)
    y_sharded = sharded_conv(x, k)

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y_dense = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
    )
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_dense), rtol=1e-5, atol=1e-6
    )


def test_halo_conv_5x5():
    from skillful_nowcasting_tpu.parallel import make_spatial_conv

    mesh = make_mesh(n_data=1, n_space=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 32, 16, 3), np.float32))
    k = jnp.asarray(rng.standard_normal((5, 5, 3, 4)).astype(np.float32) * 0.1)
    y_sharded = make_spatial_conv(mesh, padding=2)(x, k)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y_dense = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn
    )
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_dense), rtol=1e-5, atol=1e-6
    )


def test_graft_dryrun():
    """The driver's multichip dryrun must pass on the 8-device CPU mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), os.pardir, "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_dryrun_driver_invocation():
    """Simulate the driver exactly: fresh subprocess, NO conftest platform setup.

    Round-1 regression (MULTICHIP_r01.json rc=1): the driver imports
    ``__graft_entry__`` and calls ``dryrun_multichip(8)`` in a process whose
    environment does not force the CPU platform — the function must
    self-configure before any device query.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # Strip everything conftest/harness set so the child looks like the driver.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = flags.replace("--xla_force_host_platform_device_count=8", "")
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, sys.argv[1]);"
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
            repo,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr}\nstdout:\n{proc.stdout}"
    assert "dryrun_multichip(8): OK" in proc.stdout
