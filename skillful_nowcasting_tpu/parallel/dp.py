"""Data-parallel GAN step over the ``data`` mesh axis — two modes.

Replaces the reference's implicit Lightning-DDP wrapper
(``/root/reference/train/run.py:227-234``; SURVEY.md §2.8).  The whole
D/D/G/log cycle from :func:`skillful_nowcasting_tpu.training.make_train_step`
is one XLA program either way; collectives ride ICI (DCN across slices).

``mode="shard_map"`` (default) — torch-DDP semantics, fast compile:
    the per-device program is the single-chip step with ``pmean`` gradient
    all-reduce; batch statistics and latent draws are per-replica (averaged
    into the returned state).  Compile cost ≈ the single-device step: XLA
    never runs its SPMD partitioner over the giant GAN graph.

``mode="pjit"`` — global-batch semantics:
    batch sharded, params replicated, XLA's GSPMD partitions the program.
    Numerically the single-chip step on the global batch (sync-BN, one
    shared latent per step) but the partitioner is 10-20x slower to compile
    on this program.  Test status: the pjit EVAL step is equivalence-tested
    against the single-device step on every suite run
    (``tests/test_parallel.py``); the pjit TRAIN step's GSPMD compile takes
    tens of minutes on the 8-virtual-CPU-device mesh, so its equivalence
    test is gated behind ``RUN_PJIT_TRAIN_TEST=1``.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..dgmr import DGMR
from ..training import make_eval_step, make_train_step
from .mesh import batch_sharding, replicated_sharding

AXIS = "data"


def _validate_layout(mesh: Mesh, mode: str, spatial_axis: Optional[str]):
    """Mode/spatial checks that must fire regardless of mesh size.

    The 1-device fast path below bypasses the shard_map/pjit wrappers, so
    without this a misconfigured single-chip run (spatial_axis under
    shard_map, or an unknown mode) would silently degrade while the same
    config fails loudly on multi-device.
    """
    if mode not in ("shard_map", "pjit"):
        raise ValueError(f"unknown DP mode: {mode}")
    if spatial_axis is not None and mode != "pjit":
        raise ValueError(
            "spatial_axis needs the GSPMD partitioner (mode='pjit'); the "
            "shard_map DP mode maps batch shards to per-device programs "
            "with no cross-shard conv halos"
        )
    if spatial_axis is not None and mesh.size == 1:
        import warnings

        warnings.warn(
            f"spatial_axis={spatial_axis!r} has no effect on a 1-device "
            "mesh: the plain-jit fast path runs the unsharded step",
            stacklevel=3,
        )


def shard_batch(batch, mesh: Mesh, *, spatial_axis: Optional[str] = None):
    """Place an NTHWC batch (or tuple of batches) onto the data axis.

    ``spatial_axis`` additionally shards the H axis over that mesh axis
    (the 2D data x space layout for the GSPMD spatial train/eval modes).
    """
    sharding = batch_sharding(mesh, spatial_axis=spatial_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_train_step(
    model: DGMR,
    mesh: Mesh,
    *,
    logging_forward: bool = True,
    donate_state: bool = True,
    mode: str = "shard_map",
    watch_gradients: bool = False,
    watch_histograms: bool = False,
    compute_dtype=None,
    return_grads: bool = False,
    rollout_remat: bool = True,
    optimizers=None,
    spatial_axis: Optional[str] = None,
    r1_gamma: float = 0.0,
):
    """Jit the GAN train step with DP shardings over ``mesh``.

    Returned signature matches the single-chip step:
    ``(state, images, future_images, rng) -> (state, metrics)`` with
    globally-shaped batches (shard with :func:`shard_batch` or pass arrays
    already laid out on the mesh).  ``return_grads`` adds the (pmean-ed) raw
    gradient trees to the metrics (equivalence tests).

    ``spatial_axis`` (pjit mode only) additionally shards the batches' H
    axis over that mesh axis: the 2D data x space layout for *training* on
    fields whose activations exceed one chip's HBM.  GSPMD partitions the
    whole D/D/G cycle — per-conv halo exchange in forward AND backward,
    gradient reductions over both axes — from the same single-chip step
    function; numerics are the global-batch step's (sync-BN, shared
    latent).  Equivalence vs the single-device step is pinned by
    ``tests/test_parallel.py`` (eval every run; train gated with the other
    GSPMD-train compile behind ``RUN_PJIT_TRAIN_TEST=1``).
    """
    import jax.numpy as jnp

    compute_dtype = compute_dtype or jnp.float32
    donate = (0,) if donate_state else ()
    _validate_layout(mesh, mode, spatial_axis)
    if mesh.size == 1:
        # Single-device mesh: the shard_map/pjit wrapper adds nothing but a
        # (large) distinct program to compile — use the plain jitted step.
        # Only deliberate delta: the per-replica ``fold_in(rng, axis_index)``
        # is skipped (axis 0 fold), which is just a different fixed stream.
        step = make_train_step(
            model,
            logging_forward=logging_forward,
            watch_gradients=watch_gradients,
            watch_histograms=watch_histograms,
            compute_dtype=compute_dtype,
            return_grads=return_grads,
            rollout_remat=rollout_remat,
            optimizers=optimizers,
            r1_gamma=r1_gamma,
        )
        return jax.jit(step, donate_argnums=donate)
    if mode == "pjit":
        step = make_train_step(
            model,
            logging_forward=logging_forward,
            watch_gradients=watch_gradients,
            watch_histograms=watch_histograms,
            compute_dtype=compute_dtype,
            return_grads=return_grads,
            rollout_remat=rollout_remat,
            optimizers=optimizers,
            r1_gamma=r1_gamma,
        )
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh, spatial_axis=spatial_axis)
        return jax.jit(
            step,
            in_shardings=(repl, data, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=donate,
        )
    step = make_train_step(
        model,
        logging_forward=logging_forward,
        axis_name=AXIS,
        watch_gradients=watch_gradients,
        watch_histograms=watch_histograms,
        compute_dtype=compute_dtype,
        return_grads=return_grads,
        rollout_remat=rollout_remat,
        optimizers=optimizers,
        r1_gamma=r1_gamma,
    )
    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=donate)


def make_dp_eval_step(
    model: DGMR,
    mesh: Mesh,
    *,
    mode: str = "shard_map",
    compute_dtype=None,
    spatial_axis: Optional[str] = None,
):
    import jax.numpy as jnp

    compute_dtype = compute_dtype or jnp.float32
    _validate_layout(mesh, mode, spatial_axis)
    if mesh.size == 1:
        return jax.jit(make_eval_step(model, compute_dtype=compute_dtype))
    if mode == "pjit":
        step = make_eval_step(model, compute_dtype=compute_dtype)
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh, spatial_axis=spatial_axis)
        return jax.jit(step, in_shardings=(repl, data, data, repl), out_shardings=repl)
    step = make_eval_step(model, axis_name=AXIS, compute_dtype=compute_dtype)
    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_dp_generate(model: DGMR, mesh: Mesh, *, num_samples: Optional[int] = None):
    """Jitted DP ensemble generation: ``(variables, x, rng) -> (S, B, T, H, W, C)``.

    ``num_samples`` defaults to ``model.num_samples`` (``dgmr.py:54``).  Each
    sample draws its own shared latent (quirk Q2) via ``lax.scan`` over split
    keys; the batch is sharded over ``data``.  Inference has no cross-shard
    math at all, so this uses shard_map unconditionally.
    """
    n = num_samples if num_samples is not None else model.num_samples

    def generate(variables, x, rng):
        def body(_, key):
            return None, model.apply(variables, x, train=False, rngs={"latent": key})

        _, samples = jax.lax.scan(body, None, jax.random.split(rng, n))
        return samples

    mapped = shard_map(
        generate,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P()),
        out_specs=P(None, AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)
