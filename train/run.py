#!/usr/bin/env python
"""Training entry point (reference capability: ``/root/reference/train/run.py``).

Streams nimrod-uk-1km (or synthetic data offline), shards batches over the
device mesh, and runs the jitted DP GAN step with Orbax checkpointing and
TensorBoard logging.

Examples:
    python train/run.py --synthetic --max-steps 100 --batch-size 8
    python train/run.py --batch-size 16 --ckpt-dir ./checkpoints
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def parse_args():
    p = argparse.ArgumentParser(description="Train DGMR (TPU-native)")
    p.add_argument("--batch-size", type=int, default=16)  # reference run.py:182
    p.add_argument("--max-steps", type=int, default=100_000)
    p.add_argument("--forecast-steps", type=int, default=18)
    p.add_argument("--output-shape", type=int, default=256)
    p.add_argument("--generation-steps", type=int, default=6)
    p.add_argument("--latent-channels", type=int, default=768)
    p.add_argument("--context-channels", type=int, default=384)
    p.add_argument("--ckpt-dir", default="./checkpoints")
    p.add_argument("--ckpt-every", type=int, default=100)
    p.add_argument("--log-dir", default="./tb_logs")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--val-every", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--visualize", action="store_true")
    p.add_argument(
        "--synthetic", action="store_true", help="random data instead of nimrod stream"
    )
    p.add_argument(
        "--synthetic-kind",
        choices=["noise", "radar", "radar-device"],
        default="noise",
        help=(
            "noise = i.i.d. uniform; radar = advecting Gaussian rain cells "
            "(learnable); radar-device = same model rendered on-device "
            "(zero host->device data traffic)"
        ),
    )
    p.add_argument(
        "--transfer-dtype",
        choices=["float32", "bfloat16"],
        default="float32",
        help=(
            "dtype batches are staged to the device in; bfloat16 halves "
            "host->device bytes (quantizes inputs — see data/prefetch.py)"
        ),
    )
    p.add_argument(
        "--no-logging-forward",
        action="store_true",
        help="drop the reference's unused extra generator forward (quirk Q8)",
    )
    p.add_argument(
        "--watch-gradients",
        action="store_true",
        help="log per-layer gradient norms (reference wandb.watch, run.py:37-49)",
    )
    p.add_argument(
        "--watch-histograms",
        action="store_true",
        help=(
            "log per-layer parameter/gradient histograms (reference "
            "wandb.watch(log='all'); on-device symlog bins, TB/wandb)"
        ),
    )
    p.add_argument(
        "--val-skill",
        action="store_true",
        help="log CRPS/CSI/MSE skill metrics at each validation (metrics.py)",
    )
    p.add_argument(
        "--compute-dtype",
        choices=["float32", "bfloat16"],
        default="float32",
        help="bfloat16 = mixed precision (f32 master params/moments/BN stats)",
    )
    p.add_argument(
        "--remat",
        choices=["rollout", "save_names", "none"],
        default="rollout",
        help=(
            "backward-recompute policy: 'rollout' = full per-rollout remat "
            "(reference-equivalent memory floor), 'save_names' = keep GRU "
            "level sequences + conditioning-stack outputs (measured +4%% "
            "steps/s at paper-config B=16 bf16), 'none' = no outer remat "
            "(needs ~35 GB HBM at paper config; small configs only)"
        ),
    )
    p.add_argument(
        "--dp-mode",
        choices=["shard_map", "pjit"],
        default="shard_map",
        help=(
            "DP step mode (parallel/dp.py): shard_map = DDP semantics, fast "
            "compile (default); pjit = GSPMD global-batch (sync-BN, shared "
            "latent; required for --mesh-space > 1)"
        ),
    )
    p.add_argument(
        "--mesh-space",
        type=int,
        default=1,
        help=(
            "devices along the mesh's space axis: batches' H axis is sharded "
            "over it on top of DP (train at output sizes whose activations "
            "exceed one chip's HBM; GSPMD inserts the conv halo exchange — "
            "needs --dp-mode pjit)"
        ),
    )
    p.add_argument(
        "--resume-lightning",
        default=None,
        metavar="CKPT",
        help="initialize from a reference Lightning .ckpt (weights + optimizers + step)",
    )
    p.add_argument(
        "--g-lr-schedule",
        default=None,
        metavar="SPEC",
        help=(
            "opt-in generator LR schedule (training.make_lr_schedule): "
            "cosine:STEPS[:ALPHA] | exp:STEPS:RATE | "
            "warmup_cosine:WARM:STEPS[:ALPHA] | linear:STEPS[:END]; "
            "default keeps the reference's fixed lr"
        ),
    )
    p.add_argument(
        "--d-lr-schedule",
        default=None,
        metavar="SPEC",
        help="opt-in discriminator LR schedule (same specs as --g-lr-schedule)",
    )
    p.add_argument(
        "--r1-gamma",
        type=float,
        default=0.0,
        help=(
            "opt-in R1 gradient penalty weight on the discriminator's real "
            "scores (0 = reference-exact, no penalty)"
        ),
    )
    p.add_argument(
        "--no-abort-on-nan",
        action="store_true",
        help=(
            "keep training through non-finite logged metrics instead of "
            "aborting (the default abort protects the checkpoint budget)"
        ),
    )
    return p.parse_args()


def main():
    args = parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, ".jax_cache"),
    )
    import jax

    from skillful_nowcasting_tpu import DGMR
    from skillful_nowcasting_tpu.data import (
        DGMRDataModule,
        synthetic_batches,
        synthetic_radar_batches,
        synthetic_radar_batches_device,
    )
    from skillful_nowcasting_tpu.parallel import init_distributed, make_mesh
    from skillful_nowcasting_tpu.trainer import Trainer

    init_distributed()
    mesh = make_mesh(n_space=args.mesh_space)
    print(f"mesh: {mesh}", file=sys.stderr)

    model = DGMR(
        forecast_steps=args.forecast_steps,
        output_shape=args.output_shape,
        generation_steps=args.generation_steps,
        latent_channels=args.latent_channels,
        context_channels=args.context_channels,
        visualize=args.visualize,
    )

    if args.synthetic:
        gen = {
            "noise": synthetic_batches,
            "radar": synthetic_radar_batches,
            "radar-device": synthetic_radar_batches_device,
        }[args.synthetic_kind]
        train_iter = gen(
            batch_size=args.batch_size,
            target_frames=args.forecast_steps,
            size=args.output_shape,
            seed=args.seed,
        )
        val_iter = gen(
            batch_size=args.batch_size,
            target_frames=args.forecast_steps,
            size=args.output_shape,
            seed=args.seed + 1,
        )
    else:
        dm = DGMRDataModule(
            batch_size=args.batch_size, num_target_frames=args.forecast_steps
        )
        train_iter = dm.train_dataloader()
        val_iter = dm.val_dataloader()

    trainer = Trainer(
        model,
        max_steps=args.max_steps,
        ckpt_dir=args.ckpt_dir,
        ckpt_every=args.ckpt_every,
        val_every=args.val_every,
        log_every=args.log_every,
        # "none"/"" -> stderr scalar lines instead of TensorBoard event files
        # (parseable logs for long headless runs).
        log_dir=None if args.log_dir in ("", "none") else args.log_dir,
        use_wandb=args.wandb,
        mesh=mesh,
        seed=args.seed,
        logging_forward=not args.no_logging_forward,
        watch_gradients=args.watch_gradients,
        watch_histograms=args.watch_histograms,
        val_skill=args.val_skill,
        compute_dtype=(
            jax.numpy.bfloat16 if args.compute_dtype == "bfloat16" else None
        ),
        transfer_dtype=(
            jax.numpy.bfloat16 if args.transfer_dtype == "bfloat16" else None
        ),
        rollout_remat={"rollout": True, "save_names": "save_names", "none": False}[
            args.remat
        ],
        dp_mode=args.dp_mode,
        spatial_axis="space" if args.mesh_space > 1 else None,
        g_lr_schedule=args.g_lr_schedule,
        d_lr_schedule=args.d_lr_schedule,
        r1_gamma=args.r1_gamma,
        abort_on_nan=not args.no_abort_on_nan,
    )

    init_state = None
    if args.resume_lightning:
        import numpy as np

        from skillful_nowcasting_tpu.hub import train_state_from_lightning

        rng = np.random.default_rng(0)
        s = args.output_shape
        images = np.asarray(rng.random((1, 4, s, s, 1), np.float32))
        future = np.asarray(
            rng.random((1, args.forecast_steps, s, s, 1), np.float32)
        )
        init_state, _ = train_state_from_lightning(
            model, args.resume_lightning, images, future
        )
        print(
            f"initialized from Lightning ckpt {args.resume_lightning} "
            f"(step {int(init_state.step)})",
            file=sys.stderr,
        )

    trainer.fit(train_iter, val_iter, init_state=init_state)


if __name__ == "__main__":
    main()
