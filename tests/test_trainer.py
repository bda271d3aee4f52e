"""Trainer loop + Orbax checkpoint/resume tests (tiny config, synthetic data)."""

import os

import jax
import numpy as np
import pytest

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.checkpoint import make_manager, restore_state, save_state
from skillful_nowcasting_tpu.data import synthetic_batches
from skillful_nowcasting_tpu.trainer import Trainer
from skillful_nowcasting_tpu.training import init_train_state

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
def tiny_state():
    model = DGMR(**TINY)
    rng = np.random.default_rng(0)
    images = np.asarray(rng.random((1, 4, 128, 128, 1), np.float32))
    future = np.asarray(rng.random((1, 2, 128, 128, 1), np.float32))
    return model, init_train_state(model, jax.random.key(0), images, future)


def test_checkpoint_roundtrip(tiny_state, tmp_path):
    model, state = tiny_state
    manager = make_manager(str(tmp_path / "ckpts"))
    rng = jax.random.key(42)
    save_state(manager, 1, state, rng, {"train/g_loss": 1.0})
    manager.wait_until_finished()

    restored, rng2, step = restore_state(manager, state, jax.random.key(0))
    assert step == 1
    np.testing.assert_array_equal(
        jax.random.key_data(rng2), jax.random.key_data(rng)
    )
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_best_tracking(tiny_state, tmp_path):
    model, state = tiny_state
    manager = make_manager(
        str(tmp_path / "best"), max_to_keep=2, monitor="train/g_loss", keep_best=True
    )
    rng = jax.random.key(0)
    save_state(manager, 1, state, rng, {"train/g_loss": 5.0})
    save_state(manager, 2, state, rng, {"train/g_loss": 2.0})
    save_state(manager, 3, state, rng, {"train/g_loss": 7.0})
    manager.wait_until_finished()
    # Best-manager semantics: keeps the max_to_keep BEST steps (2.0@2, 5.0@1);
    # the worse step 3 is deleted.
    assert manager.best_step() == 2
    assert set(manager.all_steps()) == {1, 2}


def test_trainer_fit_and_resume(tmp_path):
    model = DGMR(**TINY)
    ckpt_dir = str(tmp_path / "run")

    def data():
        return synthetic_batches(batch_size=8, target_frames=2, size=128, seed=3)

    trainer = Trainer(
        model,
        max_steps=2,
        ckpt_dir=ckpt_dir,
        ckpt_every=1,
        log_every=1,
        val_every=0,
        seed=0,
        logging_forward=False,
    )
    state = trainer.fit(data())
    assert int(state.step) == 2
    assert trainer.manager.latest_step() == 2

    # Resume: a fresh Trainer continues from step 2.
    trainer2 = Trainer(
        model,
        max_steps=3,
        ckpt_dir=ckpt_dir,
        ckpt_every=1,
        log_every=1,
        val_every=0,
        seed=0,
        logging_forward=False,
    )
    state2 = trainer2.fit(data())
    assert int(state2.step) == 3


def test_trainer_abort_on_nan(tmp_path):
    """A blown-up run aborts loudly without clobbering checkpoints.

    Round-5 incident: a NaN GAN run burned its whole step budget logging
    NaN and its save-on-interrupt checkpoint then poisoned the resume.
    abort_on_nan (default) raises on the first non-finite logged metric and
    skips the finally-block emergency save."""
    model = DGMR(**TINY)

    def nan_data():
        for images, future in synthetic_batches(
            batch_size=8, target_frames=2, size=128, seed=3
        ):
            images = np.asarray(images).copy()
            images[0, 0, 0, 0, 0] = np.nan
            yield images, future

    ckpt_dir = str(tmp_path / "nanrun")
    trainer = Trainer(
        model,
        max_steps=2,
        ckpt_dir=ckpt_dir,
        ckpt_every=1,
        log_every=1,
        seed=0,
        logging_forward=False,
    )
    with pytest.raises(RuntimeError, match="non-finite training metrics"):
        trainer.fit(nan_data())
    # No checkpoint was written from the blown-up state.
    assert trainer.manager.latest_step() is None


def test_trainer_refuses_nan_resume(tmp_path):
    """Resume refuses a checkpoint whose params are non-finite."""
    model = DGMR(**TINY)
    rng = np.random.default_rng(0)
    images = np.asarray(rng.random((1, 4, 128, 128, 1), np.float32))
    future = np.asarray(rng.random((1, 2, 128, 128, 1), np.float32))
    state = init_train_state(model, jax.random.key(0), images, future)
    poisoned = state.replace(
        params=jax.tree.map(lambda a: a * np.nan, state.params)
    )
    ckpt_dir = str(tmp_path / "poisoned")
    manager = make_manager(f"{ckpt_dir}/latest")
    save_state(manager, 5, poisoned, jax.random.key(1), {"train/g_loss": 1.0})
    manager.wait_until_finished()

    trainer = Trainer(
        model,
        max_steps=6,
        ckpt_dir=ckpt_dir,
        ckpt_every=100,
        log_every=0,
        seed=0,
        logging_forward=False,
    )
    data = synthetic_batches(batch_size=8, target_frames=2, size=128, seed=3)
    with pytest.raises(RuntimeError, match="refusing to resume"):
        trainer.fit(data)


def test_trainer_val_skill_metrics(tmp_path):
    """val_skill=True logs paper skill metrics (CRPS/CSI/MSE) at validation."""
    model = DGMR(**TINY)
    logged = {}

    trainer = Trainer(
        model,
        max_steps=1,
        ckpt_dir=None,
        log_every=0,
        val_every=1,
        val_batches=1,
        seed=0,
        logging_forward=False,
        val_skill=True,
    )
    orig = trainer.logger.log_scalars
    trainer.logger.log_scalars = lambda scalars, step: (
        logged.update(scalars), orig(scalars, step)
    )

    def data():
        return synthetic_batches(batch_size=8, target_frames=2, size=128, seed=3)

    trainer.fit(data(), val_iter=data())
    import numpy as np

    for key in ("val/crps", "val/mse", "val/csi_1", "val/crps_pool4"):
        assert key in logged and np.isfinite(logged[key]), (key, sorted(logged))
    assert "val/d_loss" in logged


def test_trainer_watch_histograms_dp(tmp_path):
    """watch_histograms through the DP-wrapped Trainer on the 8-device mesh.

    The packed histograms are computed on post-pmean (replica-identical)
    values inside the shard_map step, so the replicated out_spec must be
    exact and the param-histogram counts must partition the real parameter
    tree; TB events must be written.
    """
    import os

    import jax
    import numpy as np

    model = DGMR(**TINY)
    tb = str(tmp_path / "tb")
    trainer = Trainer(
        model,
        max_steps=2,
        ckpt_dir=None,
        log_every=1,
        log_dir=tb,
        val_every=0,
        seed=0,
        logging_forward=False,
        watch_histograms=True,
    )

    def data():
        return synthetic_batches(batch_size=8, target_frames=2, size=128, seed=3)

    state = trainer.fit(data())
    assert int(jax.device_get(state.step)) == 2
    assert any(f.startswith("events") for f in os.listdir(tb))

    # Re-run the underlying DP step once to inspect the packed tree directly.
    images, future = next(data())
    from skillful_nowcasting_tpu.parallel import batch_sharding

    batch = jax.device_put(
        (images, future), batch_sharding(trainer.mesh)
    )
    # Size accounting BEFORE the call: train_step donates the state buffers.
    total = sum(x.size for x in jax.tree.leaves(state.params))
    _, metrics = trainer.train_step(state, *batch, jax.random.key(9))
    hists = jax.device_get(metrics["train/hist"])
    got = sum(
        int(h["counts"].sum())
        for k, h in hists.items()
        if k.startswith("train/hist/params/")
    )
    assert got == total
    grad_total = sum(
        int(h["counts"].sum())
        for k, h in hists.items()
        if k.startswith("train/hist/grads/")
    )
    assert grad_total == total  # G grads + D grads together cover all params
    for h in hists.values():
        assert np.isfinite(h["sum"]) and np.isfinite(h["sumsq"])


def test_trainer_spatial_axis_wiring():
    """Trainer(spatial_axis=...) plumbs the 2D data x space layout through.

    Construction is compile-free (jax.jit is lazy), so this pins the wiring
    cheaply: pjit + spatial constructs, shard_map + spatial fails loudly
    (parallel/dp.py rejects it — no conv halos under shard_map), and the
    numerical equivalence of the sharded steps themselves is covered in
    test_parallel.py.
    """
    from skillful_nowcasting_tpu.parallel import make_mesh

    model = DGMR(**TINY)
    mesh = make_mesh(n_data=2, n_space=4)
    t = Trainer(model, mesh=mesh, dp_mode="pjit", spatial_axis="space")
    assert t.spatial_axis == "space"
    with pytest.raises(ValueError, match="pjit"):
        Trainer(model, mesh=mesh, dp_mode="shard_map", spatial_axis="space")


def test_wandb_checkpoint_uploader(tmp_path, monkeypatch):
    """Default on_checkpoint uploads the Orbax ckpt dir as a wandb artifact.

    Reference behavior: ``UploadCheckpointsAsArtifact``
    (``/root/reference/train/run.py:52-111``) logs checkpoint files as a
    wandb artifact on epoch end/interrupt.  Stub wandb module; asserts the
    artifact carries the step directories and the step alias, and that
    ``Trainer(use_wandb=True)`` wires the uploader in by default.
    """
    import sys
    import types

    from skillful_nowcasting_tpu.logging_utils import make_wandb_checkpoint_uploader

    logged = []

    class StubArtifact:
        def __init__(self, name, type=None, metadata=None):
            self.name, self.type, self.metadata = name, type, metadata
            self.dirs = []

        def add_dir(self, path, name=None):
            self.dirs.append((path, name))

    class StubRun:
        def log_artifact(self, art, aliases=None):
            logged.append((art, aliases))

    stub = types.ModuleType("wandb")
    stub.Artifact = StubArtifact
    stub.run = StubRun()
    stub.init = lambda **kw: stub.run
    stub.log = lambda *a, **kw: None
    monkeypatch.setitem(sys.modules, "wandb", stub)

    ckpt_root = tmp_path / "ckpts"
    (ckpt_root / "100").mkdir(parents=True)
    (ckpt_root / "200").mkdir()

    upload = make_wandb_checkpoint_uploader()
    upload(200, str(ckpt_root))
    assert len(logged) == 1
    art, aliases = logged[0]
    assert art.type == "checkpoints" and art.metadata == {"step": 200}
    assert sorted(n for _, n in art.dirs) == ["100", "200"]
    assert "step-200" in aliases and "latest" in aliases

    # best-only: just the saved step's directory
    upload_best = make_wandb_checkpoint_uploader(upload_best_only=True)
    upload_best(100, str(ckpt_root))
    art2, aliases2 = logged[1]
    assert art2.dirs == [(str(ckpt_root / "100"), "100")]
    assert "step-100" in aliases2

    # wandb importable but no active run -> silent no-op
    stub.run = None
    upload(200, str(ckpt_root))
    assert len(logged) == 2

    # Trainer(use_wandb=True) defaults on_checkpoint to the uploader
    stub.run = StubRun()
    model = DGMR(**TINY)
    t = Trainer(model, use_wandb=True)
    assert t.on_checkpoint is not None
    t.on_checkpoint(300, str(ckpt_root))
    assert len(logged) == 3
