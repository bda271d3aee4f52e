"""Training-system tests: init, jitted train step, eval step, determinism.

Reference behavior spec: ``/root/reference/dgmr/dgmr.py:137-300``.  Uses a
reduced config in the spirit of ``/root/reference/tests/test_model.py:286-306``
(output_shape=128 is the smallest the spatial discriminator tower supports).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skillful_nowcasting_tpu.dgmr import DGMR
from skillful_nowcasting_tpu.training import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
    split_params,
)


@pytest.fixture(scope="module")
def tiny_model():
    return DGMR(
        forecast_steps=4,
        input_channels=1,
        output_shape=128,
        latent_channels=384,
        context_channels=192,
        generation_steps=2,
        num_samples=2,
    )


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((1, 4, 128, 128, 1), np.float32))
    future = jnp.asarray(rng.random((1, 4, 128, 128, 1), np.float32))
    return images, future


@pytest.fixture(scope="module")
def state(tiny_model, tiny_batch):
    images, future = tiny_batch
    return init_train_state(tiny_model, jax.random.key(0), images, future)


def test_init_state_structure(tiny_model, state):
    g, d = split_params(state.params)
    assert set(d.keys()) == {"discriminator"}
    assert {"conditioning_stack", "latent_stack", "sampler"} <= set(g.keys())
    assert int(state.step) == 0
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    assert n_params > 1e5


def test_dgmr_forward_shapes(tiny_model, state, tiny_batch):
    images, _ = tiny_batch
    out = tiny_model.apply(
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "spectral": state.spectral,
        },
        images,
        train=False,
        rngs={"latent": jax.random.key(1)},
    )
    assert out.shape == (1, 4, 128, 128, 1)
    assert not bool(jnp.isnan(out).any())


def test_train_step_runs_and_updates(tiny_model, state, tiny_batch):
    images, future = tiny_batch
    train_step = jax.jit(make_train_step(tiny_model))
    new_state, metrics = train_step(state, images, future, jax.random.key(2))

    for k in ("train/d_loss", "train/g_loss", "train/grid_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert int(new_state.step) == 1

    # Both G and D params must have moved.
    g0, d0 = split_params(state.params)
    g1, d1 = split_params(new_state.params)
    g_delta = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
    )
    d_delta = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(d1))
    )
    assert g_delta > 0
    assert d_delta > 0

    # Train-mode statistics (BN running stats, SN power iteration) advanced.
    bs_delta = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(new_state.batch_stats))
    )
    assert bs_delta > 0


def test_train_step_deterministic(tiny_model, state, tiny_batch):
    images, future = tiny_batch
    train_step = jax.jit(make_train_step(tiny_model, logging_forward=False))
    _, m1 = train_step(state, images, future, jax.random.key(3))
    _, m2 = train_step(state, images, future, jax.random.key(3))
    assert float(m1["train/g_loss"]) == float(m2["train/g_loss"])
    _, m3 = train_step(state, images, future, jax.random.key(4))
    assert float(m1["train/g_loss"]) != float(m3["train/g_loss"])


def test_watch_gradients_metrics(tiny_model, state, tiny_batch):
    """Per-layer gradient norms (the reference's wandb.watch capability)."""
    images, future = tiny_batch
    train_step = jax.jit(
        make_train_step(tiny_model, logging_forward=False, watch_gradients=True)
    )
    _, metrics = train_step(state, images, future, jax.random.key(6))
    layer_keys = [k for k in metrics if k.startswith("train/grad_norm/")]
    # Generator top-levels (two module levels deep) and discriminator layers.
    assert any("sampler" in k for k in layer_keys)
    assert any("conditioning_stack" in k for k in layer_keys)
    assert any(k.startswith("train/grad_norm/discriminator/") for k in layer_keys)
    for k in layer_keys:
        assert np.isfinite(float(metrics[k])), k
    # Norms decompose consistently: ||g||^2 == sum of per-layer ||g_l||^2.
    g_total = float(metrics["train/g_grad_norm"]) ** 2
    g_sum = sum(
        float(metrics[k]) ** 2
        for k in layer_keys
        if not k.startswith("train/grad_norm/discriminator/")
    )
    np.testing.assert_allclose(g_sum, g_total, rtol=1e-4)


def test_watch_histograms_metrics(tiny_model, state, tiny_batch, tmp_path):
    """Per-layer parameter/gradient histograms (wandb.watch(log="all") analog).

    Counts are computed on-device over fixed symlog bins; every value must
    land in a bin (clipping at ±1e16), so per-layer counts sum exactly to
    the layer's element count — checked against the real param tree sizes.
    """
    from skillful_nowcasting_tpu.logging_utils import (
        HIST_BINS,
        MetricsLogger,
        hist_bucket_edges,
    )

    images, future = tiny_batch
    train_step = jax.jit(
        make_train_step(tiny_model, logging_forward=False, watch_histograms=True)
    )
    _, metrics = train_step(state, images, future, jax.random.key(7))
    hists = jax.device_get(metrics["train/hist"])

    param_keys = [k for k in hists if k.startswith("train/hist/params/")]
    grad_keys = [k for k in hists if k.startswith("train/hist/grads/")]
    assert any("/sampler/" in k for k in param_keys)
    assert any("/sampler/" in k for k in grad_keys)
    assert any(k.startswith("train/hist/grads/discriminator/") for k in grad_keys)

    for k, h in hists.items():
        assert h["counts"].shape == (HIST_BINS,), k
        assert float(h["min"]) <= float(h["max"]), k
        assert float(h["sumsq"]) >= 0.0, k

    # Exact coverage: params histograms partition the full parameter tree.
    g_params, d_params = split_params(state.params)
    total_params = sum(x.size for x in jax.tree.leaves(state.params))
    assert sum(int(h["counts"].sum()) for k, h in hists.items() if k in param_keys) == total_params
    # Gradient histograms partition G params (depth 2) + D params (per head).
    g_size = sum(x.size for x in jax.tree.leaves(g_params))
    d_size = sum(x.size for x in jax.tree.leaves(d_params))
    g_grad_n = sum(
        int(h["counts"].sum())
        for k, h in hists.items()
        if k in grad_keys and not k.startswith("train/hist/grads/discriminator/")
    )
    d_grad_n = sum(
        int(h["counts"].sum())
        for k, h in hists.items()
        if k.startswith("train/hist/grads/discriminator/")
    )
    assert g_grad_n == g_size
    assert d_grad_n == d_size

    # Static edges reproduce host-side: monotone, symmetric, bins+1 of them.
    edges = hist_bucket_edges()
    assert edges.shape == (HIST_BINS + 1,)
    assert np.all(np.diff(edges) > 0)
    np.testing.assert_allclose(edges, -edges[::-1], rtol=1e-12)

    # TensorBoard raw-histogram write round-trips without error.
    logger = MetricsLogger(str(tmp_path))
    logger.log_histograms(hists, step=1)
    logger.close()
    assert any(f.name.startswith("events") for f in tmp_path.iterdir())


def test_train_step_bf16_mixed_precision(tiny_model, state, tiny_batch):
    """bf16 compute with f32 master params/moments/statistics.

    The model runs in bfloat16 (inputs cast, ops follow input dtype) while
    everything carried across steps — params, Adam moments, BN stats,
    spectral u/v — stays float32, so the returned state re-enters the jitted
    step with an identical signature (no recompile, no dtype drift).
    """
    images, future = tiny_batch
    train_step = jax.jit(
        make_train_step(tiny_model, logging_forward=False, compute_dtype=jnp.bfloat16)
    )
    new_state, metrics = train_step(state, images, future, jax.random.key(7))
    for k in ("train/d_loss", "train/g_loss", "train/grid_loss"):
        v = metrics[k]
        assert v.dtype == jnp.float32, k
        assert np.isfinite(float(v)), k
    # Carried state keeps the f32 signature exactly.
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
        assert a.dtype == b.dtype and a.shape == b.shape
    # Params moved (the optimizer consumed real bf16-path gradients).
    delta = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params))
    )
    assert delta > 0
    # Loss values track the f32 step to bf16 resolution (same data, same key).
    f32_step = jax.jit(make_train_step(tiny_model, logging_forward=False))
    _, m32 = f32_step(state, images, future, jax.random.key(7))
    np.testing.assert_allclose(
        float(metrics["train/grid_loss"]), float(m32["train/grid_loss"]), rtol=0.1
    )


def test_eval_step(tiny_model, state, tiny_batch):
    images, future = tiny_batch
    eval_step = jax.jit(make_eval_step(tiny_model))
    metrics = eval_step(state, images, future, jax.random.key(5))
    for k in ("val/d_loss", "val/g_loss", "val/grid_loss"):
        assert np.isfinite(float(metrics[k])), k
    # Eval is pure: same key -> same metrics.
    metrics2 = eval_step(state, images, future, jax.random.key(5))
    assert float(metrics["val/g_loss"]) == float(metrics2["val/g_loss"])
    # Each of the two D iterations draws a FRESH generator sample
    # (reference dgmr.py:229-231) — for a fixed step key their losses differ.
    assert float(metrics["val/d_loss_first"]) != float(metrics["val/d_loss"])


def test_sampler_train_t_chunks_exact():
    """Chunked-remat train path == unchunked: outputs (up to conv-batching
    reassociation) and EXACT mutable-collection threading (SN u/v sequences,
    BN running-stat EMA) — the memory lever for paper-config batch 16."""
    from skillful_nowcasting_tpu.models.generators import Sampler

    rng = np.random.default_rng(0)
    t, b, lc, cc = 6, 2, 64, 32
    states = (
        jnp.asarray(rng.random((b, 64, 64, cc // 8), np.float32)),
        jnp.asarray(rng.random((b, 32, 32, cc // 4), np.float32)),
        jnp.asarray(rng.random((b, 16, 16, cc // 2), np.float32)),
        jnp.asarray(rng.random((b, 8, 8, cc), np.float32)),
    )
    latent = jnp.asarray(rng.random((1, 8, 8, lc), np.float32))

    outs, muts = {}, {}
    for chunks in (1, 3):
        model = Sampler(
            forecast_steps=t, latent_channels=lc, context_channels=cc,
            train_t_chunks=chunks,
        )
        variables = model.init({"params": jax.random.key(0)}, states, latent, train=False)
        out, mut = model.apply(
            variables, states, latent, train=True, mutable=["batch_stats", "spectral"]
        )
        outs[chunks] = np.asarray(out)
        muts[chunks] = mut
    np.testing.assert_allclose(outs[1], outs[3], atol=5e-4)
    for (p, a), (_, c) in zip(
        jax.tree_util.tree_leaves_with_path(muts[1]),
        jax.tree_util.tree_leaves_with_path(muts[3]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(p),
        )


def test_desaturate_discriminator_tree_search():
    """BN nodes are found by tree search, not hard-coded paths (VERDICT r3 #6)."""
    from skillful_nowcasting_tpu.training import desaturate_discriminator

    params = {
        "discriminator": {
            "spatial_discriminator": {
                "bn": {"scale": np.ones(3), "bias": np.zeros(3)},
                "conv": {"kernel": np.ones(2)},
            },
            # nested one level deeper than the current layout — must still hit
            "temporal_discriminator": {"head": {"bn": {"scale": np.full(3, 2.0)}}},
        },
        "sampler": {"bn": {"scale": np.ones(3)}},
    }
    out = desaturate_discriminator(params, factor=0.5)
    np.testing.assert_allclose(
        out["discriminator"]["spatial_discriminator"]["bn"]["scale"], 0.5
    )
    np.testing.assert_allclose(
        out["discriminator"]["temporal_discriminator"]["head"]["bn"]["scale"], 1.0
    )
    # non-discriminator subtrees and the input tree are untouched
    np.testing.assert_allclose(out["sampler"]["bn"]["scale"], 1.0)
    np.testing.assert_allclose(
        params["discriminator"]["spatial_discriminator"]["bn"]["scale"], 1.0
    )


def test_desaturate_discriminator_fails_loudly():
    """A rename in the D heads raises instead of silently skipping (VERDICT r3 #6)."""
    from skillful_nowcasting_tpu.training import desaturate_discriminator

    with pytest.raises(KeyError, match="discriminator"):
        desaturate_discriminator({"generator": {}})

    # one head renamed its bn -> only 1 hit -> loud failure listing candidates
    params = {
        "discriminator": {
            "spatial_discriminator": {"bn": {"scale": np.ones(3)}},
            "temporal_discriminator": {"batch_norm": {"scale": np.ones(3)}},
        }
    }
    with pytest.raises(KeyError, match="found 1"):
        desaturate_discriminator(params)


def test_tower_depths_excluded_from_hub_config():
    """num_spatial/temporal_layers shrink test configs but are NOT hparams:
    the hub config contract matches the reference's save_hyperparameters set
    (reference dgmr.py:72-107)."""
    m = DGMR(output_shape=64, num_spatial_layers=2, num_temporal_layers=2)
    cfg = m.config
    assert "num_spatial_layers" not in cfg
    assert "num_temporal_layers" not in cfg


# ---------------------------------------------------------------------------
# Opt-in GAN stabilizers (round 5): LR schedules + R1 gradient penalty.
# Reference default is fixed-lr Adam with no D regularizer
# (/root/reference/dgmr/dgmr.py:292-300); everything here is off by default
# and trace-time gated (the default step's jaxpr is pinned by
# tests/test_parallel.py::test_dryrun_cache_key_golden).
# ---------------------------------------------------------------------------


def test_lr_schedule_specs():
    from skillful_nowcasting_tpu.training import make_lr_schedule

    assert make_lr_schedule(5e-5, None) == 5e-5
    assert make_lr_schedule(5e-5, "constant") == 5e-5
    s = make_lr_schedule(1e-4, "cosine:100:0.1")
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(100)) == pytest.approx(1e-5)
    s = make_lr_schedule(1e-4, "exp:10:0.5")
    assert float(s(10)) == pytest.approx(5e-5)
    s = make_lr_schedule(1e-4, "warmup_cosine:10:100")
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-4)
    s = make_lr_schedule(1e-4, "linear:100:0.5")
    assert float(s(50)) == pytest.approx(0.75e-4)
    with pytest.raises(ValueError):
        make_lr_schedule(1e-4, "bogus:1")


def test_scheduled_optimizers_train_step(tiny_model, tiny_batch):
    from skillful_nowcasting_tpu.training import make_optimizers

    images, future = tiny_batch
    opt = make_optimizers(
        tiny_model, g_lr_schedule="cosine:100", d_lr_schedule="exp:50:0.5"
    )
    st = init_train_state(
        tiny_model, jax.random.key(0), images, future, optimizers=opt
    )
    # A scheduled chain carries a schedule step count: one extra leaf per
    # chain vs the default stateless-lr Adam.
    default_st = init_train_state(tiny_model, jax.random.key(0), images, future)
    assert (
        len(jax.tree.leaves(st.g_opt_state))
        == len(jax.tree.leaves(default_st.g_opt_state)) + 1
    )
    step = jax.jit(
        make_train_step(tiny_model, logging_forward=False, optimizers=opt)
    )
    new_state, metrics = step(st, images, future, jax.random.key(2))
    assert np.isfinite(float(metrics["train/g_loss"]))
    g0, _ = split_params(st.params)
    g1, _ = split_params(new_state.params)
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
    )


def test_r1_penalty_train_step(tiny_model, state, tiny_batch):
    images, future = tiny_batch
    step_r1 = jax.jit(
        make_train_step(tiny_model, logging_forward=False, r1_gamma=10.0)
    )
    new_r1, m_r1 = step_r1(state, images, future, jax.random.key(2))
    assert "train/d_r1" in m_r1
    assert float(m_r1["train/d_r1"]) > 0
    for k in ("train/d_loss", "train/g_loss", "train/d_r1"):
        assert np.isfinite(float(m_r1[k])), k

    # Default step: no penalty metric, and the D update differs from the
    # penalized one under the same rng.
    step0 = jax.jit(make_train_step(tiny_model, logging_forward=False))
    new0, m0 = step0(state, images, future, jax.random.key(2))
    assert "train/d_r1" not in m0
    _, d_r1 = split_params(new_r1.params)
    _, d_0 = split_params(new0.params)
    assert (
        max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(d_r1), jax.tree.leaves(d_0))
        )
        > 0
    )


def test_r1_penalty_bf16_finite(tiny_model, state, tiny_batch):
    """bf16 mixed precision + R1: the penalty's inner D pass runs at f32.

    Regression for the round-5 on-chip finding: with the R1 inner score
    computed in bf16 the double-backward (grad of the input-gradient wrt
    d_params) through the D's BN/SN towers is NaN at the very first step
    (f32 finite).  The fix keeps the penalty branch at >= f32 under any
    compute_dtype; this asserts the bf16+R1 step is finite end-to-end and
    the penalty value tracks the f32 one to bf16 resolution.
    """
    images, future = tiny_batch
    step_bf16 = jax.jit(
        make_train_step(
            tiny_model,
            logging_forward=False,
            compute_dtype=jnp.bfloat16,
            r1_gamma=10.0,
        )
    )
    new_bf, m_bf = step_bf16(state, images, future, jax.random.key(2))
    for k, v in m_bf.items():
        assert np.isfinite(float(v)), k
    assert float(m_bf["train/d_r1"]) > 0
    for leaf in jax.tree.leaves(new_bf.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))

    step_f32 = jax.jit(
        make_train_step(tiny_model, logging_forward=False, r1_gamma=10.0)
    )
    _, m_f32 = step_f32(state, images, future, jax.random.key(2))
    # Same rng -> same frames/latents; bf16's main forward perturbs the
    # penalty's base activations at ~1e-2 relative resolution.
    np.testing.assert_allclose(
        float(m_bf["train/d_r1"]), float(m_f32["train/d_r1"]), rtol=0.25
    )
