"""Driver benchmark: nowcast frames/sec/chip on the 18-step 256-square ensemble.

Prints ONE JSON line to stdout:
``{"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}``.

Protocol (BASELINE.md): the reference publishes no numbers, so the baseline
is the torch reference itself (``/root/reference``) running the same
paper-config inference on CPU, measured once here and cached in
``.bench_ref.json``.  ``vs_baseline`` is ours / reference (higher is
better; north star >= 5x).

Knobs: ``BENCH_BATCH`` (default 16), ``BENCH_ITERS`` (default 8),
``BENCH_SKIP_REF=1`` to skip the torch baseline measurement,
``BENCH_BF16=0`` to skip the bf16 pass, ``BENCH_TRAIN=1`` to also measure
the paper-config GAN train step (``BENCH_TRAIN_BATCH``, default 16) —
train numbers go to stderr; the JSON line stays the inference metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

REF_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_ref.json")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


V5E_BF16_PEAK_TFLOPS = 197.0  # v5e MXU peak (bf16); f32 numbers are reported
# against the same figure, labeled — v5e has no separate published f32 rate.


def measure_ours(batch: int, iters: int, dtype_name: str = "float32"):
    """Device throughput via a scanned chain of ``iters`` forwards.

    All ``iters`` forwards run inside ONE jitted program whose (tiny) output
    is fetched to the host — this forces full synchronization.  Per-call
    ``block_until_ready`` is NOT trustworthy on remote-tunnel backends (it
    returns before execution completes), which silently under-reports time.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from skillful_nowcasting_tpu import DGMR
    from skillful_nowcasting_tpu.hub.pretrained import abstract_variables
    from skillful_nowcasting_tpu.utils import random_fill_variables

    log(f"devices: {jax.devices()}")
    model = DGMR()  # paper config: 18-step, 256, latent 768, context 384
    variables = random_fill_variables(abstract_variables(model), jax.random.key(0))
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    @jax.jit
    def forward_chain(variables, x, key):
        def body(_, k):
            out = model.apply(variables, x, train=False, rngs={"latent": k})
            return None, jnp.mean(out.astype(jnp.float32))  # forces everything

        _, probes = jax.lax.scan(body, None, jax.random.split(key, iters))
        return probes

    x = jax.random.uniform(jax.random.key(7), (batch, 4, 256, 256, 1), dtype)
    t0 = time.time()
    np.asarray(forward_chain(variables, x, jax.random.key(1)))
    log(f"[{dtype_name}] compile+first chain ({iters} fwd): {time.time() - t0:.1f}s")

    t0 = time.time()
    np.asarray(forward_chain(variables, x, jax.random.key(2)))
    dt = (time.time() - t0) / iters
    fps = batch * model.forecast_steps / dt
    log(f"[{dtype_name}] ours: {dt*1000:.1f} ms/forward (B={batch}) -> {fps:.2f} frames/sec/chip")

    # MFU: XLA's own FLOP count for ONE forward (compiler cost analysis of a
    # single-forward program; cached in the persistent compile cache).
    flops = None
    try:
        single = jax.jit(
            lambda v, xx, k: jnp.mean(
                model.apply(v, xx, train=False, rngs={"latent": k}).astype(jnp.float32)
            )
        )
        cost = single.lower(variables, x, jax.random.key(0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — cost analysis is backend-dependent
        log(f"[{dtype_name}] cost analysis unavailable: {type(e).__name__}: {e}")
    if flops:
        tfs = flops / dt / 1e12
        log(
            f"[{dtype_name}] MFU: {flops/1e12:.2f} TFLOPs/forward, {tfs:.1f} TF/s "
            f"effective = {100*tfs/V5E_BF16_PEAK_TFLOPS:.1f}% of v5e bf16 peak "
            f"({V5E_BF16_PEAK_TFLOPS:.0f} TF/s)"
        )
    return fps, flops


def measure_ours_train(batch: int, iters: int = 4, dtype_name: str = "float32") -> float:
    """Paper-config GAN train step throughput (steps/sec) on the chip.

    The state threads through the ``iters`` steps, so fetching the final
    metrics forces the whole chain to execute (tunnel-safe timing).  Keeps
    the reference's extra logging forward (quirk Q8) OFF — the honest
    apples-to-apples number is noted both ways in CLAUDE.md.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from skillful_nowcasting_tpu import DGMR
    from skillful_nowcasting_tpu.training import init_train_state, make_train_step

    model = DGMR()  # paper config
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    remat_env = os.environ.get("BENCH_TRAIN_REMAT", "1")
    rollout_remat = {"0": False, "1": True}.get(remat_env, remat_env)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, 4, 256, 256, 1), np.float32))
    future = jnp.asarray(rng.random((batch, 18, 256, 256, 1), np.float32))
    state = init_train_state(model, jax.random.key(0), images[:1], future[:1])
    step = jax.jit(
        make_train_step(
            model,
            logging_forward=False,
            compute_dtype=dtype,
            rollout_remat=rollout_remat,
        ),
        donate_argnums=0,
    )

    t0 = time.time()
    state, metrics = step(state, images, future, jax.random.key(1))
    float(metrics["train/g_loss"])  # force
    log(f"[train B={batch} {dtype_name} remat={rollout_remat}] compile+first step: {time.time() - t0:.1f}s")

    t0 = time.time()
    for i in range(iters):
        state, metrics = step(state, images, future, jax.random.key(2 + i))
    g = float(metrics["train/g_loss"])  # forces the whole chain
    dt = (time.time() - t0) / iters
    sps = 1.0 / dt
    log(
        f"[train B={batch} {dtype_name}] {dt*1000:.0f} ms/step -> {sps:.3f} steps/sec, "
        f"{batch * sps:.2f} samples/sec/chip (g_loss={g:.3f})"
    )
    return sps


def measure_reference():
    """Torch reference (CPU) paper-config inference throughput, cached.

    Per BASELINE.md, numbers are recorded both as-is (the reference ctor
    globally enables ``torch.autograd.set_detect_anomaly(True)``,
    ``dgmr.py:130``) and with that debugging overhead disabled.
    """
    if os.path.exists(REF_CACHE):
        with open(REF_CACHE) as f:
            cached = json.load(f)
        log(f"reference (cached): {cached['frames_per_sec']:.3f} frames/sec")
        return cached["frames_per_sec"], cached.get("frames_per_sec_no_detect_anomaly")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from ref_loader import load_reference

    import torch

    ref = load_reference()
    torch.manual_seed(0)
    model = ref.DGMR()  # ctor turns detect_anomaly ON (as-is configuration)
    model.eval()
    x = torch.rand((1, 4, 1, 256, 256))
    with torch.no_grad():
        t0 = time.time()
        model(x)  # warmup
        warm = time.time() - t0
        t0 = time.time()
        out = model(x)
        dt = time.time() - t0
        # Second side: same forward with the permanent detect_anomaly
        # overhead removed (BASELINE.md:24-28).
        torch.autograd.set_detect_anomaly(False)
        t0 = time.time()
        model(x)
        dt_clean = time.time() - t0
        torch.autograd.set_detect_anomaly(True)
    fps = out.shape[1] / dt
    fps_clean = out.shape[1] / dt_clean
    log(
        f"reference torch-CPU: warmup {warm:.1f}s, {dt:.1f} s/forward -> {fps:.3f} "
        f"frames/sec (detect_anomaly on) | {dt_clean:.1f} s -> {fps_clean:.3f} (off)"
    )
    with open(REF_CACHE, "w") as f:
        json.dump(
            {
                "frames_per_sec": fps,
                "seconds_per_forward": dt,
                "frames_per_sec_no_detect_anomaly": fps_clean,
                "seconds_per_forward_no_detect_anomaly": dt_clean,
            },
            f,
        )
    return fps, fps_clean


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    ours_f32, flops = measure_ours(batch, iters, "float32")
    ours, ours_bf16, headline_dtype = ours_f32, None, "float32"
    if os.environ.get("BENCH_BF16", "1") != "0":
        try:
            # bf16 is the serving configuration (f32 is the parity mode; see
            # README "Numerical parity" and scripts/parity_tpu.py) — report
            # the faster of the two as the headline number, dtype-labeled in
            # the JSON line.
            ours_bf16, flops_bf16 = measure_ours(batch, iters, "bfloat16")
            flops = flops or flops_bf16
            if ours_bf16 > ours:
                ours, headline_dtype = ours_bf16, "bfloat16"
        except Exception as e:  # noqa: BLE001
            log(f"bf16 measurement failed: {type(e).__name__}: {e}")

    if flops:
        # Driver-visible MFU summary (VERDICT r2 #8): the artifact answers
        # "is it actually fast" without DESIGN.md archaeology.
        def tfs(f):
            return flops * f / (batch * 18) / 1e12

        mfu = " | ".join(
            f"{name} {tfs(v):.1f} TF/s ({100*tfs(v)/V5E_BF16_PEAK_TFLOPS:.1f}% of "
            f"{V5E_BF16_PEAK_TFLOPS:.0f} TF/s bf16 peak)"
            for name, v in [("f32", ours_f32), ("bf16", ours_bf16)]
            if v
        )
        log(f"MFU ({flops/1e12:.2f} TFLOPs/forward, XLA cost analysis): {mfu}")

    if os.environ.get("BENCH_TRAIN") == "1":
        train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
        train_dtype = os.environ.get("BENCH_TRAIN_DTYPE", "float32")
        try:
            measure_ours_train(train_batch, dtype_name=train_dtype)  # logged to stderr
        except Exception as e:  # noqa: BLE001
            log(f"train measurement failed (B={train_batch}): {type(e).__name__}: {e}")

    vs = vs_clean = ref_fps = ref_fps_clean = None
    if os.environ.get("BENCH_SKIP_REF") != "1":
        try:
            ref_fps, ref_fps_clean = measure_reference()
            vs = ours / ref_fps if ref_fps else None
            vs_clean = ours / ref_fps_clean if ref_fps_clean else None
        except Exception as e:  # noqa: BLE001
            log(f"reference measurement failed: {type(e).__name__}: {e}")

    def r(x, nd=3):
        return round(x, nd) if x is not None else None

    # Self-describing JSON (ADVICE r2): the headline value carries its dtype,
    # both dtype measurements, and both reference variants (the reference
    # ctor force-enables torch detect_anomaly, quirk Q8 — BASELINE.md reports
    # the baseline two-sided).
    print(
        json.dumps(
            {
                "metric": "nowcast frames/sec/chip (18-step 256^2 ensemble)",
                "value": r(ours),
                "unit": "frames/sec/chip",
                "vs_baseline": r(vs),
                "dtype": headline_dtype,
                "value_float32": r(ours_f32),
                "value_bfloat16": r(ours_bf16),
                "ref_frames_per_sec_detect_anomaly_on": r(ref_fps),
                "ref_frames_per_sec_detect_anomaly_off": r(ref_fps_clean),
                "vs_baseline_detect_anomaly_off": r(vs_clean),
            }
        )
    )


if __name__ == "__main__":
    main()
