"""GAN training system: one jitted step for the full D/G optimization cycle.

Reference behavior: ``/root/reference/dgmr/dgmr.py:137-218`` (training_step)
and ``:220-290`` (validation_step).  The reference runs, per optimizer
iteration:

* 2 discriminator updates, each on a fresh generator sample concatenated
  with the 4 context frames (quirk Q7) and batched real‖generated through
  the discriminator;
* 1 generator update over ``generation_steps`` (6) fresh samples — hinge
  loss on the discriminator scores plus ``grid_lambda ×`` grid-cell loss on
  the sample mean (quirks Q3/Q4);
* 1 extra logging forward (quirk Q8).

TPU-native restructuring: the whole cycle is ONE jitted function.  The 6
generator samples and their 6 discriminator scorings run under
``jax.lax.scan`` (compiled once, sequential like the reference so BatchNorm
batch-statistics and spectral-norm power-iteration order match), with
``jax.checkpoint`` (remat) around each generator rollout mirroring the
reference's ``torch.utils.checkpoint`` (``dgmr.py:150,176``).

Known deliberate deviation: torch's non-reentrant checkpoint recompute
updates BN/SN buffers a *second* time during backward; we update them once
per forward (the mathematically intended semantics).

Randomness contract (quirk Q2/Q5): one PRNG key per step is split into
per-forward ``latent`` keys (each generator call draws a single shared
batch-1 latent) and per-discriminator-call ``frames`` keys (spatial
discriminator samples 8 frame indices with replacement).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .dgmr import DGMR
from .logging_utils import HIST_BINS, HIST_SYMLOG_SCALE, HIST_Y_MAX
from .losses import GridCellLoss, loss_hinge_disc, loss_hinge_gen, weight_fn
from . import remat_names as _remat_names


class TrainState(struct.PyTreeNode):
    """Everything that evolves during training (checkpointable as one pytree)."""

    params: Any
    batch_stats: Any
    spectral: Any
    g_opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray


def split_params(params: Mapping[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Partition the DGMR param tree into (generator, discriminator) subtrees."""
    g = {k: v for k, v in params.items() if k != "discriminator"}
    d = {"discriminator": params["discriminator"]}
    return g, d


def merge_params(g: Mapping[str, Any], d: Mapping[str, Any]) -> Dict[str, Any]:
    return {**g, **d}


def _overlay(old: Any, new: Any) -> Any:
    """Recursively overlay mutated collection subtrees onto the previous state."""
    if isinstance(new, Mapping) and isinstance(old, Mapping):
        out = dict(old)
        for k, v in new.items():
            out[k] = _overlay(old.get(k), v) if k in old else v
        return out
    return new


def make_lr_schedule(base_lr: float, spec: Optional[str]):
    """Parse an opt-in LR schedule spec into an optax schedule (or ``base_lr``).

    The reference trains with FIXED-lr Adam (``dgmr.py:292-300``) and its
    long GAN runs destabilize (see docs/DESIGN.md round-4: val d_loss blows
    up past ~step 1400 on the 2k synthetic run).  Schedules are the
    classic stabilizer; they are strictly opt-in — ``None``/"constant"
    keeps the exact reference behavior (and the stateless optax chain, so
    checkpoints stay tree-compatible with earlier rounds).

    Specs (steps are optimizer steps):

    * ``None`` / ``"constant"``           -> ``base_lr`` (reference exact)
    * ``"cosine:<steps>[:<alpha>]"``      -> cosine decay to ``alpha*base``
    * ``"exp:<steps>:<rate>"``            -> ``base * rate**(t/steps)``
    * ``"warmup_cosine:<warm>:<steps>[:<alpha>]"`` -> linear warmup from 0
      over ``warm`` steps then cosine decay to ``alpha*base`` at ``steps``
    * ``"linear:<steps>[:<end_scale>]"``  -> linear to ``end_scale*base``
    """
    if spec is None or spec == "constant":
        return base_lr
    parts = spec.split(":")
    kind, args = parts[0], parts[1:]
    if kind == "cosine":
        steps = int(args[0])
        alpha = float(args[1]) if len(args) > 1 else 0.0
        return optax.cosine_decay_schedule(base_lr, steps, alpha=alpha)
    if kind == "exp":
        return optax.exponential_decay(base_lr, int(args[0]), float(args[1]))
    if kind == "warmup_cosine":
        warm, steps = int(args[0]), int(args[1])
        alpha = float(args[2]) if len(args) > 2 else 0.0
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warm, steps, end_value=alpha * base_lr
        )
    if kind == "linear":
        steps = int(args[0])
        end = float(args[1]) if len(args) > 1 else 0.0
        return optax.linear_schedule(base_lr, end * base_lr, steps)
    raise ValueError(f"unknown lr schedule spec: {spec!r}")


def make_optimizers(
    model: DGMR,
    *,
    g_lr_schedule: Optional[str] = None,
    d_lr_schedule: Optional[str] = None,
) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    """Two Adam chains matching torch defaults (``dgmr.py:292-300``).

    ``g_lr_schedule``/``d_lr_schedule`` are opt-in spec strings (see
    :func:`make_lr_schedule`); ``None`` is the reference's fixed lr.
    """
    g_lr = make_lr_schedule(model.gen_lr, g_lr_schedule)
    d_lr = make_lr_schedule(model.disc_lr, d_lr_schedule)
    g_tx = optax.adam(g_lr, b1=model.beta1, b2=model.beta2, eps=1e-8)
    d_tx = optax.adam(d_lr, b1=model.beta1, b2=model.beta2, eps=1e-8)
    return g_tx, d_tx


def init_train_state(
    model: DGMR,
    rng: jax.Array,
    images: jnp.ndarray,
    future_images: jnp.ndarray,
    optimizers: Optional[Tuple[optax.GradientTransformation, optax.GradientTransformation]] = None,
) -> TrainState:
    """Initialize all variables (G + D) and both optimizer states.

    ``optimizers`` must match what the train step will use: a scheduled
    chain carries a step count in its state, so its tree differs from the
    default fixed-lr Adam's.
    """
    k_params, k_latent, k_frames = jax.random.split(rng, 3)
    init_fn = jax.jit(partial(model.init, method=DGMR.init_step))
    variables = init_fn(
        {"params": k_params, "latent": k_latent, "frames": k_frames},
        images,
        future_images,
    )
    params = variables["params"]
    g_params, d_params = split_params(params)
    g_tx, d_tx = optimizers if optimizers is not None else make_optimizers(model)
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        spectral=variables.get("spectral", {}),
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        step=jnp.zeros((), jnp.int32),
    )


def _apply_generator(model, params, batch_stats, spectral, images, latent_key, train):
    variables = {"params": params, "batch_stats": batch_stats, "spectral": spectral}
    if train:
        preds, mut = model.apply(
            variables,
            images,
            train=True,
            rngs={"latent": latent_key},
            mutable=["batch_stats", "spectral"],
        )
        return (
            preds,
            _overlay(batch_stats, mut.get("batch_stats", {})),
            _overlay(spectral, mut.get("spectral", {})),
        )
    preds = model.apply(variables, images, train=False, rngs={"latent": latent_key})
    return preds, batch_stats, spectral


def _apply_discriminator(model, params, batch_stats, spectral, seq, frames_key, train):
    variables = {"params": params, "batch_stats": batch_stats, "spectral": spectral}
    if train:
        scores, mut = model.apply(
            variables,
            seq,
            train=True,
            rngs={"frames": frames_key},
            mutable=["batch_stats", "spectral"],
            method=DGMR.discriminate,
        )
        return (
            scores,
            _overlay(batch_stats, mut.get("batch_stats", {})),
            _overlay(spectral, mut.get("spectral", {})),
        )
    scores = model.apply(
        variables, seq, train=False, rngs={"frames": frames_key}, method=DGMR.discriminate
    )
    return scores, batch_stats, spectral


def _at_least_f32(x):
    """Upcast-only f32 cast for loss/metric reductions.

    Mixed-precision (bf16) activations accumulate hinge/grid reductions in
    f32 exactly as before; f64 arrays (``jax_enable_x64`` equivalence tests,
    e.g. the GSPMD spatial-train test) are NOT silently downcast, so those
    tests measure partitioning semantics rather than f32 rounding.  For f32
    and bf16 inputs the emitted jaxpr is identical to ``astype(float32)``.
    """
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def _split_scores(scores, n_real):
    """(2B, 2, 1) discriminator output -> per-branch real/generated scores.

    Scores are cast to f32 so hinge losses accumulate in full precision under
    mixed-precision training.
    """
    scores = _at_least_f32(scores)
    score_real, score_generated = scores[:n_real], scores[n_real:]
    return (
        score_real[:, :1],
        score_real[:, 1:],
        score_generated[:, :1],
        score_generated[:, 1:],
    )


def _layer_grad_norms(grads: Mapping[str, Any], prefix: str, depth: int = 2) -> Dict[str, jnp.ndarray]:
    """Per-submodule gradient norms down to ``depth`` module levels.

    The ``wandb.watch(model, log="all")`` analog (reference
    ``train/run.py:37-49``): instead of parameter histograms (host-side and
    expensive through the tunnel) we emit a norm per layer path, which is the
    standard TPU-friendly gradient-observability signal.
    """
    out: Dict[str, jnp.ndarray] = {}

    def rec(tree, path, d):
        if d == 0 or not isinstance(tree, Mapping):
            out[prefix + "/".join(path)] = optax.global_norm(tree)
            return
        for k, v in tree.items():
            rec(v, path + (k,), d - 1)

    rec(grads, (), depth)
    return out


def _layer_histograms(
    tree: Mapping[str, Any], depth: int = 2
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-submodule value histograms over fixed symlog bins (jit-static).

    The full ``wandb.watch(model, log="all")`` analog (reference
    ``train/run.py:45-49``): per layer path (same grouping as
    :func:`_layer_grad_norms`) this returns ``{"counts", "min", "max",
    "sum", "sumsq"}`` — everything TensorBoard's ``add_histogram_raw`` /
    wandb's pre-binned ``Histogram`` need — computed ON DEVICE so only
    ``HIST_BINS + 4`` scalars per layer cross the tunnel instead of the raw
    tensors.  Bins are static (symlog10, ``logging_utils.hist_bucket_edges``
    reproduces the edges host-side); values beyond ±1e16 clip into the end
    bins so counts always sum to the element count.
    """
    import numpy as np

    ln10 = float(np.log(10.0))

    def stats(subtree):
        leaves = [jnp.ravel(l).astype(jnp.float32) for l in jax.tree.leaves(subtree)]
        if not leaves:
            return None
        v = jnp.concatenate(leaves) if len(leaves) > 1 else leaves[0]
        y = jnp.clip(jnp.arcsinh(v / HIST_SYMLOG_SCALE) / ln10, -HIST_Y_MAX, HIST_Y_MAX)
        # Integer bincount, NOT jnp.histogram: histogram scatter-adds 1.0f
        # per element, and a float32 bin saturates at 2^24 — a 22M-element
        # layer whose values share one bin (e.g. all-zero D gradients under
        # a saturated hinge) silently loses counts (exactness is tested).
        width = (2.0 * HIST_Y_MAX) / HIST_BINS
        idx = jnp.clip(((y + HIST_Y_MAX) / width).astype(jnp.int32), 0, HIST_BINS - 1)
        counts = jnp.bincount(idx, length=HIST_BINS)
        return {
            "counts": counts.astype(jnp.int32),
            "min": v.min(),
            "max": v.max(),
            "sum": v.sum(),
            "sumsq": jnp.sum(v * v),
        }

    out: Dict[str, Dict[str, jnp.ndarray]] = {}

    def rec(tree, path, d):
        if d == 0 or not isinstance(tree, Mapping):
            s = stats(tree)
            if s is not None:
                out["/".join(path)] = s
            return
        for k, v in tree.items():
            rec(v, path + (k,), d - 1)

    rec(tree, (), depth)
    return out


def desaturate_discriminator(params: Mapping[str, Any], factor: float = 0.01) -> Dict[str, Any]:
    """Shrink both D heads' final BatchNorm scale so hinge terms are active.

    At random init the hinge loss can saturate (real scores ≥ 1 and generated
    ≤ −1 ⇒ both ``relu`` terms — and every D gradient — exactly zero), which
    makes "D gradients are finite" assertions vacuous.  Scaling the
    pre-classifier BatchNorm ``scale`` pulls scores into (−1, 1), where both
    hinge branches are active and gradients flow through the full D tower.
    Used by the multichip dryrun and the DP-equivalence tests so a dead
    discriminator path (e.g. a misplaced ``stop_gradient``) cannot pass.

    The pre-classifier BatchNorms are located by tree search (any subtree
    under ``discriminator`` whose path ends in a module named ``bn`` holding a
    ``scale`` leaf) rather than hard-coded paths, so a rename in the D heads
    fails loudly here instead of silently skipping the desaturation
    (VERDICT r3 weak #6).
    """
    params = jax.tree.map(lambda x: x, params)  # rebuild dicts, keep leaves
    if "discriminator" not in params:
        raise KeyError(
            f"no 'discriminator' subtree; top-level keys: {sorted(params)}"
        )

    hits = []

    def rec(tree, path):
        if not isinstance(tree, Mapping):
            return
        if path and path[-1] == "bn" and "scale" in tree:
            hits.append((path, tree))
            return
        for k, v in tree.items():
            rec(v, path + (k,))

    rec(params["discriminator"], ("discriminator",))
    if len(hits) != 2:
        raise KeyError(
            "expected exactly 2 pre-classifier BatchNorm ('bn') nodes under "
            f"'discriminator' (spatial + temporal heads), found {len(hits)}: "
            f"{['/'.join(p) for p, _ in hits]}"
        )
    for _, bn in hits:
        bn["scale"] = bn["scale"] * factor
    return params


def make_train_step(
    model: DGMR,
    *,
    logging_forward: bool = True,
    axis_name: Optional[str] = None,
    watch_gradients: bool = False,
    watch_histograms: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    return_grads: bool = False,
    rollout_remat: bool = True,
    optimizers: Optional[Tuple[optax.GradientTransformation, optax.GradientTransformation]] = None,
    r1_gamma: float = 0.0,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the single-step training function (jit / pjit it at the call site).

    Returned signature: ``(state, images, future_images, rng) -> (state, metrics)``
    with NTHWC batches.  ``logging_forward=False`` drops the reference's unused
    extra generator forward (quirk Q8) for throughput; the default keeps it for
    behavioral parity.  ``watch_gradients=True`` adds per-layer gradient norms
    to the metrics (the reference's ``wandb.watch`` capability,
    ``train/run.py:37-49``); ``watch_histograms=True`` additionally packs
    per-layer parameter and gradient histograms (fixed symlog bins, computed
    on device — see :func:`_layer_histograms`) under ``metrics["train/hist"]``
    — the full ``wandb.watch(log="all")`` analog.  Both are purely additive:
    with the flags off the traced program (and its compile-cache key) is
    unchanged.

    ``axis_name`` enables the shard_map DP mode (see ``parallel/dp.py``):
    gradients and metrics are ``pmean``-ed over that axis before the optimizer
    updates (torch-DDP semantics: per-replica batch statistics and latent
    draws, averaged gradients).  Mutable statistics are pmean-ed at the end of
    the step so the returned state is replica-consistent.

    ``r1_gamma > 0`` adds the R1 gradient penalty (Mescheder et al. 2018)
    to BOTH discriminator updates: ``(gamma/2) * E_real ||d D(x)/d x||^2``,
    summed over the spatial+temporal score heads.  The reference has no D
    regularizer and its long GAN runs destabilize (docs/DESIGN.md round-4
    2k-step run: val d_loss 10 -> 565 past step ~1400); R1 is the opt-in
    lever.  Cost: one extra D forward + double-backward per D step (the
    generator rollouts dominate the step, so this is a few percent).  The
    gate is a trace-time Python check — ``r1_gamma=0.0`` (default) traces
    the byte-identical reference program, compile-cache keys unchanged.

    ``compute_dtype=jnp.bfloat16`` enables mixed-precision training: model
    inputs are cast to bf16 so every conv/matmul runs at MXU bf16 rate, while
    master parameters, Adam moments, gradients, BatchNorm statistics and
    spectral-norm power iteration all stay float32 (the ops compute-dtype
    follows the input; BN stats and SN sigma are f32 internally regardless —
    ``ops/norm.py:70``, ``ops/spectral_norm.py``).  Losses and the grid-loss
    sample mean accumulate in f32.  The reference trains in full precision 32
    (``/root/reference/train/run.py:227-234``); bf16 is this framework's
    TPU-serving configuration, off by default.
    """
    # ``optimizers`` override: the DP numerical-equivalence tests swap the
    # model's Adam pair for SGD — Adam with beta1=0 at step 1 is
    # ~lr*sign(g), which amplifies low-bit cross-execution-path differences
    # into O(lr) parameter divergence (chaotic for equivalence checks).
    g_tx, d_tx = optimizers if optimizers is not None else make_optimizers(model)
    grid_loss = GridCellLoss(weight_fn=weight_fn, precip_weight_cap=model.precip_weight_cap)
    n_disc_steps = 2
    n_gen = model.generation_steps

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def train_step(state: TrainState, images, future_images, rng):
        # f32 copies feed the grid loss target; ``*_c`` copies feed the model.
        future_images = _at_least_f32(future_images)
        images_c = images.astype(compute_dtype)
        images = _at_least_f32(images)
        b = images.shape[0]
        real_seq = jnp.concatenate(
            [images, future_images], axis=1
        ).astype(compute_dtype)
        # R1 penalty differentiates wrt the FULL-precision real input (the
        # bf16 real_seq would quantize the gradient's base point); gated so
        # the default (r1_gamma=0) jaxpr is unchanged.
        real_seq_f32 = (
            jnp.concatenate([images, future_images], axis=1)
            if r1_gamma > 0.0
            else None
        )

        if axis_name is not None:
            # Per-replica randomness (each rank its own z / frame indices).
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        keys = jax.random.split(rng, 2 * n_disc_steps + 2 * n_gen + 1)
        d_lat = keys[:n_disc_steps]
        d_fr = keys[n_disc_steps : 2 * n_disc_steps]
        g_lat = keys[2 * n_disc_steps : 2 * n_disc_steps + n_gen]
        g_fr = keys[2 * n_disc_steps + n_gen : 2 * n_disc_steps + 2 * n_gen]
        k_log = keys[-1]

        params, batch_stats, spectral = state.params, state.batch_stats, state.spectral
        d_opt_state = state.d_opt_state

        # ------------------------------------------------------------------
        # Discriminator phase: 2 sequential updates (``dgmr.py:148-170``),
        # rolled into one lax.scan so the D subgraph is traced/compiled once.
        # ------------------------------------------------------------------
        g_params, d_params = split_params(params)

        def d_phase(carry, keys):
            d_p, d_opt, bs, sp = carry
            k_lat, k_fr = keys
            preds, bs, sp = _apply_generator(
                model, merge_params(g_params, d_p), bs, sp, images_c, k_lat, train=True
            )
            preds = jax.lax.stop_gradient(preds)
            gen_seq = jnp.concatenate([images_c, preds], axis=1)
            concat_in = jnp.concatenate([real_seq, gen_seq], axis=0)

            def d_loss_fn(d_pp, bs, sp):
                scores, bs, sp = _apply_discriminator(
                    model, merge_params(g_params, d_pp), bs, sp, concat_in, k_fr, True
                )
                rs, rt, gs, gt = _split_scores(scores, b)
                loss = loss_hinge_disc(gs, rs) + loss_hinge_disc(gt, rt)
                if r1_gamma > 0.0:
                    # R1: (gamma/2) * E_real ||d D(x)/d x||^2 over both score
                    # heads, differentiated wrt the REAL half of the same
                    # real‖generated concat the loss forward sees.  The D
                    # heads end in train-mode BatchNorm over the batch axis,
                    # so scoring the real half alone would normalize with
                    # real-only statistics (and at batch 1 the score becomes
                    # the constant beta — gradient identically zero); going
                    # through the full concat keeps the penalty's BN
                    # statistics identical to the loss's.  The penalty
                    # forward discards its collection mutations (stats
                    # update once per D step, via the main forward above);
                    # same frame-sampling key -> same frames.
                    # The R1 inner score runs at >= f32 regardless of
                    # compute_dtype: under bf16 the double-backward (grad of
                    # the inner input-gradient wrt d_params) through the D's
                    # BN/SN towers produces NaN at the very first step
                    # (measured on-chip round 5; f32 is finite).  Standard
                    # mixed-precision practice keeps gradient penalties in
                    # f32 (StyleGAN2); the main hinge forward stays bf16.
                    def real_score_sum(x):
                        ci = jnp.concatenate(
                            [x, _at_least_f32(gen_seq)], axis=0
                        )
                        s, _, _ = _apply_discriminator(
                            model,
                            merge_params(g_params, d_pp),
                            bs,
                            sp,
                            ci,
                            k_fr,
                            True,
                        )
                        rs2, rt2, _, _ = _split_scores(s, b)
                        return jnp.sum(rs2) + jnp.sum(rt2)

                    gin = jax.grad(real_score_sum)(real_seq_f32)
                    r1 = 0.5 * jnp.mean(
                        jnp.sum(
                            jnp.square(_at_least_f32(gin)).reshape(b, -1),
                            axis=1,
                        )
                    )
                    loss = loss + r1_gamma * r1
                    return loss, (bs, sp, r1)
                return loss, (bs, sp)

            (loss, aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_p, bs, sp
            )
            bs, sp = aux[0], aux[1]
            d_grads = pmean(d_grads)
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_p)
            d_p = optax.apply_updates(d_p, d_updates)
            layer_norms = (
                _layer_grad_norms(d_grads["discriminator"], "train/grad_norm/discriminator/")
                if watch_gradients
                else {}
            )
            out = (loss, optax.global_norm(d_grads), layer_norms)
            if watch_histograms:
                out = out + (_layer_histograms(d_grads["discriminator"], depth=1),)
            if return_grads:
                out = out + (d_grads,)
            if r1_gamma > 0.0:
                out = out + (aux[2],)  # r1 penalty, appended LAST
            return (d_p, d_opt, bs, sp), out

        (d_params, d_opt_state, batch_stats, spectral), d_outs = jax.lax.scan(
            d_phase,
            (d_params, d_opt_state, batch_stats, spectral),
            (d_lat, d_fr),
        )
        d_losses, d_gnorms, d_layer_norms = d_outs[:3]
        idx = 3
        d_hists_stacked = None
        if watch_histograms:
            d_hists_stacked = d_outs[idx]
            idx += 1
        d_grads_stacked = d_outs[idx] if return_grads else None
        d_r1_stacked = d_outs[-1] if r1_gamma > 0.0 else None
        d_loss = d_losses[-1]  # reference logs the last D step's loss
        params = merge_params(g_params, d_params)

        # ------------------------------------------------------------------
        # Generator phase (``dgmr.py:175-201``): 6 samples under lax.scan,
        # remat around each rollout.
        # ------------------------------------------------------------------
        g_params, d_params = split_params(params)

        def gen_rollout(g_p, bs, sp, key):
            return _apply_generator(
                model, merge_params(g_p, d_params), bs, sp, images_c, key, train=True
            )

        # Outer per-rollout remat, mirroring the reference's
        # torch.utils.checkpoint around each full rollout (``dgmr.py:150,176``):
        # * True/"full": save only rollout in/outputs — lowest memory, the
        #   backward recomputes each rollout's forward (paper-config B=16
        #   fits one chip only because of this, round 2);
        # * "save_names": jax.checkpoint with save_only_these_names keeping
        #   the GRU sequences / inter-level outputs / context states (tagged
        #   in models.generators) — the recompute prunes the post conv
        #   towers' forward, trading ~2.5 GB (B=16 bf16) for speed;
        # * False: no outer remat — residuals at the Sampler's inner chunk
        #   boundaries only; needs ~34 GB at paper config B=16 (measured,
        #   does not fit a 16 GB chip — usable at small batch/config).
        if rollout_remat == "save_names":
            policy = jax.checkpoint_policies.save_only_these_names(
                *_remat_names.SAVE_NAMES
            )
            gen_rollout = partial(jax.checkpoint, prevent_cse=False, policy=policy)(
                gen_rollout
            )
        elif rollout_remat:
            gen_rollout = partial(jax.checkpoint, prevent_cse=False)(gen_rollout)

        def g_loss_fn(g_p, bs, sp):
            # One scan over the 6 samples: each iteration rolls out ONE
            # sample (rematted), scores it, and accumulates the running
            # prediction sum — the (6, B, T, H, W, C) stack of all samples
            # is never materialized (it alone cost 3 GB with layout padding
            # at the paper config, the difference between fitting B=16 in
            # 16 GB HBM and not).  Mathematically identical to the
            # reference's rollouts-then-scorings order: generator rollouts
            # and discriminator scorings mutate DISJOINT collection
            # subtrees, so each one's internal update order is preserved.
            full = merge_params(g_p, d_params)
            # Accumulator dtype matches the scan body's _at_least_f32(preds)
            # (f32 for f32/bf16 compute, f64 under jax_enable_x64) so the
            # carry types agree at trace time.
            sum0 = jnp.zeros(
                (b, future_images.shape[1]) + images.shape[2:],
                jnp.promote_types(compute_dtype, jnp.float32),
            )

            def sample_body(carry, keys):
                bs, sp, sum_preds = carry
                k_lat, k_fr = keys
                preds, bs, sp = gen_rollout(g_p, bs, sp, k_lat)
                concat_in = jnp.concatenate(
                    [real_seq, jnp.concatenate([images_c, preds], axis=1)], axis=0
                )
                scores, bs, sp = _apply_discriminator(
                    model, full, bs, sp, concat_in, k_fr, True
                )
                return (bs, sp, sum_preds + _at_least_f32(preds)), scores[b:]

            (bs, sp, sum_preds), gen_scores = jax.lax.scan(
                sample_body, (bs, sp, sum0), (g_lat, g_fr)
            )
            gen_mean = sum_preds / n_gen
            grid = grid_loss(gen_mean, future_images)
            g_disc_loss = loss_hinge_gen(_at_least_f32(gen_scores))
            loss = g_disc_loss + model.grid_lambda * grid
            return loss, (bs, sp, grid, g_disc_loss)

        (g_loss, (batch_stats, spectral, grid, g_disc_loss)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_params, batch_stats, spectral)
        g_grads = pmean(g_grads)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        params = merge_params(g_params, d_params)

        # Extra logging forward (quirk Q8) — updates train-mode statistics.
        generated_images = None
        if logging_forward:
            generated_images, batch_stats, spectral = _apply_generator(
                model, params, batch_stats, spectral, images_c, k_log, train=True
            )

        if axis_name is not None:
            # Replica-consistent state: average the per-replica statistics
            # (torch DDP leaves BN buffers per-rank; averaging is the
            # deterministic multi-replica generalization).
            batch_stats = pmean(batch_stats)
            spectral = pmean(spectral)

        new_state = state.replace(
            params=params,
            batch_stats=batch_stats,
            spectral=spectral,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            step=state.step + 1,
        )
        metrics = {
            "train/d_loss": pmean(d_loss),
            "train/g_loss": pmean(g_loss),
            "train/grid_loss": pmean(grid),
            "train/g_disc_loss": pmean(g_disc_loss),
            # Gradient observability (the reference's wandb.watch analog,
            # train/run.py:37-49) — already pmean-ed with the grads.
            "train/g_grad_norm": optax.global_norm(g_grads),
            "train/d_grad_norm": d_gnorms[-1],
        }
        if r1_gamma > 0.0:
            metrics["train/d_r1"] = pmean(d_r1_stacked[-1])
        if watch_gradients:
            metrics.update(_layer_grad_norms(g_grads, "train/grad_norm/"))
            metrics.update({k: v[-1] for k, v in d_layer_norms.items()})
        if watch_histograms:
            # Params after this step's updates (replicated under DP) and the
            # synced (pmean-ed) gradients — so the packed counts are replica-
            # identical and the DP wrapper's replicated out_spec is exact.
            hist: Dict[str, Dict[str, jnp.ndarray]] = {}
            hist.update(
                {f"train/hist/params/{k}": v for k, v in _layer_histograms(params).items()}
            )
            hist.update(
                {f"train/hist/grads/{k}": v for k, v in _layer_histograms(g_grads).items()}
            )
            hist.update(
                {
                    f"train/hist/grads/discriminator/{k}": jax.tree.map(
                        lambda x: x[-1], v
                    )
                    for k, v in d_hists_stacked.items()
                }
            )
            metrics["train/hist"] = hist
        if return_grads:
            # Test/diagnostic hook: the (pmean-ed) raw gradient trees — the
            # DP-equivalence tests compare these against an independent
            # reference computation (tests/test_parallel.py).
            metrics["g_grads"] = g_grads
            metrics["d_grads"] = d_grads_stacked
        if model.visualize and generated_images is not None:
            metrics["train/generated_images"] = generated_images
        return new_state, metrics

    if rollout_remat == "save_names":
        # The checkpoint_name tags are gated behind a trace-time flag so the
        # DEFAULT step's jaxpr stays byte-identical (names are computationally
        # inert but would change every compile-cache key).  The flag is set
        # for the duration of this step's trace only.
        def train_step_named(*args):
            _remat_names.ENABLED = True
            try:
                return train_step(*args)
            finally:
                _remat_names.ENABLED = False

        return train_step_named

    return train_step


def make_eval_step(
    model: DGMR,
    *,
    axis_name: Optional[str] = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jax.Array], Dict[str, jnp.ndarray]]:
    """Validation step (``dgmr.py:220-290``): same math, eval mode, no updates."""
    grid_loss = GridCellLoss(weight_fn=weight_fn, precip_weight_cap=model.precip_weight_cap)
    n_gen = model.generation_steps

    def eval_step(state: TrainState, images, future_images, rng):
        future_images = _at_least_f32(future_images)
        images_c = images.astype(compute_dtype)
        images = _at_least_f32(images)
        b = images.shape[0]
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        real_seq = jnp.concatenate(
            [images, future_images], axis=1
        ).astype(compute_dtype)
        params, bs, sp = state.params, state.batch_stats, state.spectral

        keys = jax.random.split(rng, 4 + 2 * n_gen)
        # Two discriminator evaluations, each on a FRESH generator sample
        # (reference draws a new sample per iteration, ``dgmr.py:229-231``);
        # only the last loss is logged, matching the reference loop.
        d_losses = []
        for i in range(2):
            preds, _, _ = _apply_generator(
                model, params, bs, sp, images_c, keys[2 * i], False
            )
            gen_seq = jnp.concatenate([images_c, preds], axis=1)
            concat_in = jnp.concatenate([real_seq, gen_seq], axis=0)
            scores, _, _ = _apply_discriminator(
                model, params, bs, sp, concat_in, keys[2 * i + 1], False
            )
            rs, rt, gs, gt = _split_scores(scores, b)
            d_losses.append(loss_hinge_disc(gs, rs) + loss_hinge_disc(gt, rt))
        d_loss = d_losses[-1]

        def sample_body(_, key):
            preds, _, _ = _apply_generator(model, params, bs, sp, images_c, key, False)
            return None, preds

        _, preds = jax.lax.scan(sample_body, None, keys[4 : 4 + n_gen])
        gen_mean = jnp.mean(_at_least_f32(preds), axis=0)
        grid = grid_loss(gen_mean, future_images)

        def score_body(_, inp):
            p, k_fr = inp
            concat_in = jnp.concatenate(
                [real_seq, jnp.concatenate([images_c, p], axis=1)], axis=0
            )
            scores, _, _ = _apply_discriminator(model, params, bs, sp, concat_in, k_fr, False)
            return None, scores[b:]

        _, gen_scores = jax.lax.scan(score_body, None, (preds, keys[4 + n_gen :]))
        g_loss = loss_hinge_gen(_at_least_f32(gen_scores)) + model.grid_lambda * grid
        metrics = {
            "val/d_loss": d_loss,
            "val/g_loss": g_loss,
            "val/grid_loss": grid,
            # Observability/test hook: the first D iteration's loss.  Must
            # differ from val/d_loss for a fixed step key because each
            # iteration draws a FRESH generator sample (dgmr.py:229-231).
            "val/d_loss_first": d_losses[0],
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return metrics

    return eval_step
