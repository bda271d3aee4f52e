"""Named rematerialization saveables for the ``save_names`` remat policy.

``training.make_train_step(rollout_remat="save_names")`` wraps each
generator rollout in ``jax.checkpoint`` with
``save_only_these_names(*SAVE_NAMES)``.  The values tagged here (via
:func:`tag`) are then kept as residuals instead of recomputed:

* ``conditioning_state`` / ``latent_dim`` — the stacks' outputs;
* ``sampler_gru_seq`` — each level's GRU output sequence (the post conv
  towers' forward is pruned from the backward recompute);
* ``sampler_level_seq`` — inter-level sequences (next GRU's inputs).

Tagging is gated behind a TRACE-TIME flag (default off) so the default
programs' jaxprs stay byte-identical — ``checkpoint_name`` is
computationally inert but changes every compile-cache key.
"""

from __future__ import annotations

ENABLED = False

SAVE_NAMES = (
    "conditioning_state",
    "latent_dim",
    "sampler_gru_seq",
    "sampler_level_seq",
)

# Tagged but deliberately NOT saved: measured slower at the paper config
# (saving the per-step GRU carries pruned the scan re-run but its ~1.3 GB of
# saved stacks cost more HBM traffic than the recompute saved — 0.253 vs
# 0.262 steps/s at B=16 bf16; with BOTH carry and gru_seq saved the step
# OOMs at 15.78/15.75 GB).
UNSAVED_NAMES = ("convgru_carry", "convgru_uv")


def tag(x, name: str):
    """checkpoint_name(x, name) when tagging is enabled; identity otherwise."""
    if ENABLED:
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(x, name)
    return x
