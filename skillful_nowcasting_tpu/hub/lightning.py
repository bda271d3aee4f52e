"""Lightning checkpoint (``.ckpt``) import: weights, hparams, optimizer states.

The reference's own training writes Lightning checkpoints
(``/root/reference/train/run.py:221-231``): a pickled dict with

* ``state_dict`` — the LightningModule's (DGMR's) state dict, including the
  ``generator.*`` duplicates of the shared stacks (``dgmr.py:108-123``);
* ``hyper_parameters`` — the ``save_hyperparameters()`` config
  (``dgmr.py:124``);
* ``optimizer_states`` — ``[opt_g, opt_d]`` torch Adam state dicts per
  ``configure_optimizers`` (``dgmr.py:292-300``);
* ``global_step`` / ``epoch`` bookkeeping.

This module converts all of it so "resume from the reference's training run"
works end to end: parameters AND both Adam moment estimates land in a
:class:`~skillful_nowcasting_tpu.training.TrainState`.

Ordering contract used for the optimizer import: torch's
``optimizer.state_dict()["state"]`` is keyed by the position of each
parameter in ``module.parameters()``, and that iteration order equals the
order of parameter (non-buffer) entries in ``module.state_dict()`` — both
are the same pre-order module traversal.  We therefore recover the index ->
parameter-name mapping from the checkpoint's own key order (``torch.load``
preserves dict order).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Sequence, Tuple

import numpy as np

from .convert import (
    _convert_weight,
    _fold_list_indices,
    _to_numpy,
    convert_torch_state_dict,
)

_PARAM_LEAVES = ("original", "weight_orig", "weight", "bias", "gamma")


def load_lightning_checkpoint(path: str) -> Dict[str, Any]:
    """``torch.load`` a Lightning ``.ckpt`` file (host-side, CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def is_lightning_checkpoint(obj: Mapping[str, Any]) -> bool:
    return isinstance(obj, Mapping) and "state_dict" in obj


def unwrap_state_dict(ckpt: Mapping[str, Any]) -> Dict[str, Any]:
    """Pull the model state dict out of a Lightning ckpt (pass-through otherwise)."""
    sd = ckpt["state_dict"] if is_lightning_checkpoint(ckpt) else ckpt
    return dict(sd)


def convert_lightning_checkpoint(
    ckpt,
) -> Tuple[Dict[str, Any], Dict[str, Dict[str, Any]]]:
    """Convert a Lightning ckpt (path or loaded dict) -> ``(config, variables)``.

    ``config`` is the checkpoint's ``hyper_parameters`` (empty if absent);
    ``variables`` is the usual ``{"params", "batch_stats", "spectral"}``
    nested-dict tree from :func:`convert_torch_state_dict`.
    """
    if isinstance(ckpt, (str, os.PathLike)):
        ckpt = load_lightning_checkpoint(str(ckpt))
    from .pretrained import _strip_duplicate_generator_keys

    sd = _strip_duplicate_generator_keys(unwrap_state_dict(ckpt))
    config = dict(ckpt.get("hyper_parameters", {})) if is_lightning_checkpoint(ckpt) else {}
    return config, convert_torch_state_dict(sd)


# ---------------------------------------------------------------------------
# Optimizer-state conversion
# ---------------------------------------------------------------------------


def _is_param_key(key: str, keyset) -> bool:
    parts = key.split(".")
    leaf = parts[-1]
    if leaf not in _PARAM_LEAVES:
        return False
    if leaf == "weight" and ".".join(parts[:-1] + ["weight_orig"]) in keyset:
        return False  # derived copy next to old-style weight_orig
    return True


def ordered_param_keys(state_dict_keys: Sequence[str], prefix: str) -> List[str]:
    """Torch ``parameters()`` order for the submodule at ``prefix``.

    Derived from the state-dict key order (same pre-order traversal), keeping
    only parameter leaves (buffers like ``running_*``/``_u``/``_v`` dropped).
    """
    keyset = set(state_dict_keys)
    pfx = prefix + "." if prefix else ""
    return [
        k
        for k in state_dict_keys
        if k.startswith(pfx) and _is_param_key(k, keyset)
    ]


def _target_path(key: str, keyset) -> Tuple[Tuple[str, ...], str, bool]:
    """Map a torch param key -> (our params-tree path, leaf name, is_weight).

    ``is_weight`` says whether the moment tensors need the same layout
    transpose as the kernel itself (they share the param's shape).
    """
    parts = key.split(".")
    if "parametrizations" in parts:
        i = parts.index("parametrizations")
        return _fold_list_indices(tuple(parts[:i])), "kernel", True
    leaf = parts[-1]
    path = _fold_list_indices(tuple(parts[:-1]))
    if leaf == "weight_orig":
        return path, "kernel", True
    if leaf == "weight":
        prefix = ".".join(parts[:-1])
        if f"{prefix}.running_mean" in keyset:
            return path, "scale", False  # BatchNorm
        return path, "kernel", True
    if leaf == "bias":
        return path, "bias", False
    if leaf == "gamma":
        return path, "gamma", False
    raise ValueError(f"not a parameter key: {key}")


def _tree_set(tree, path: Tuple[str, ...], leaf: str, value) -> None:
    node = tree
    for p in path:
        node = node[p]
    if leaf not in node:
        raise KeyError(f"{'/'.join(path)}/{leaf} not in target params tree")
    if node[leaf].shape != value.shape:
        raise ValueError(
            f"optimizer moment shape mismatch at {'/'.join(path)}/{leaf}: "
            f"{node[leaf].shape} vs {value.shape}"
        )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def convert_adam_state(
    opt_state_dict: Mapping[str, Any],
    ordered_keys: Sequence[str],
    params_template,
    keyset,
    *,
    strip_prefix: str = "",
):
    """Torch Adam ``state_dict`` -> ``(count, mu_tree, nu_tree)``.

    ``params_template`` is our params subtree for this optimizer (e.g. the
    generator subtree); ``ordered_keys`` are the torch parameter keys in
    ``parameters()`` order (see :func:`ordered_param_keys`);
    ``strip_prefix`` removes a leading module name (``"generator"``) so torch
    paths line up with our tree, whose shared stacks live at the top level.
    """
    import jax.numpy as jnp

    zeros = lambda t: np.zeros_like(np.asarray(t))  # noqa: E731
    import jax

    mu = jax.tree.map(zeros, params_template)
    nu = jax.tree.map(zeros, params_template)
    state = opt_state_dict.get("state", {})
    steps: List[int] = []
    for idx, entry in state.items():
        i = int(idx)
        if i >= len(ordered_keys):
            raise KeyError(
                f"optimizer state index {i} out of range ({len(ordered_keys)} params)"
            )
        key = ordered_keys[i]
        parts = key.split(".")
        if strip_prefix and parts[0] == strip_prefix:
            key = ".".join(parts[1:])
        path, leaf, is_weight = _target_path(key, keyset)
        exp_avg = _to_numpy(entry["exp_avg"])
        exp_avg_sq = _to_numpy(entry["exp_avg_sq"])
        if is_weight:
            exp_avg = _convert_weight(exp_avg)
            exp_avg_sq = _convert_weight(exp_avg_sq)
        _tree_set(mu, path, leaf, exp_avg)
        _tree_set(nu, path, leaf, exp_avg_sq)
        step = entry.get("step", 0)
        steps.append(int(_to_numpy(step)) if not isinstance(step, int) else step)
    count = max(steps) if steps else 0
    return jnp.asarray(count, jnp.int32), mu, nu


def _overlay_adam(template_opt_state, count, mu, nu):
    """Replace the ScaleByAdamState inside an ``optax.adam`` state template."""
    import jax
    import optax

    inner, *rest = template_opt_state
    if not isinstance(inner, optax.ScaleByAdamState):
        raise TypeError(f"unexpected optax state head: {type(inner)}")
    as_jnp = lambda t, like: jax.numpy.asarray(t, like.dtype)  # noqa: E731
    mu = jax.tree.map(lambda like, v: as_jnp(v, like), inner.mu, mu)
    nu = jax.tree.map(lambda like, v: as_jnp(v, like), inner.nu, nu)
    return (inner._replace(count=count, mu=mu, nu=nu), *rest)


def train_state_from_lightning(model, ckpt, images, future_images):
    """Build a full :class:`TrainState` from a reference Lightning ``.ckpt``.

    Imports parameters, BN statistics, spectral u/v, BOTH Adam optimizer
    states (moment estimates + step counts), and the global step — the
    reference's own resume capability (``pl.Trainer(ckpt_path=...)``),
    re-expressed for this framework.

    Returns ``(state, config)``; ``config`` is the ckpt's hyper_parameters.
    """
    import jax
    import jax.numpy as jnp

    from ..training import init_train_state, split_params
    from .convert import merge_into_variables

    if isinstance(ckpt, (str, os.PathLike)):
        ckpt = load_lightning_checkpoint(str(ckpt))
    config, converted = convert_lightning_checkpoint(ckpt)

    state = init_train_state(model, jax.random.key(0), images, future_images)
    variables = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "spectral": state.spectral,
    }
    variables = merge_into_variables(variables, converted)
    params = variables["params"]
    g_params, d_params = split_params(params)

    g_opt_state, d_opt_state = state.g_opt_state, state.d_opt_state
    opt_states = ckpt.get("optimizer_states") if is_lightning_checkpoint(ckpt) else None
    global_step = int(ckpt.get("global_step", 0)) if is_lightning_checkpoint(ckpt) else 0
    if opt_states:
        sd_keys = list(unwrap_state_dict(ckpt).keys())
        keyset = set(sd_keys)
        # opt_g over generator.parameters(), opt_d over discriminator.parameters()
        # (dgmr.py:292-300); strip the generator prefix — our tree keeps the
        # shared stacks at the top level.
        g_keys = ordered_param_keys(sd_keys, "generator")
        if not g_keys:  # checkpoint saved without the duplicate generator.* keys
            g_keys = [
                k
                for k in ordered_param_keys(sd_keys, "")
                if not k.startswith("discriminator.")
            ]
        d_keys = ordered_param_keys(sd_keys, "discriminator")
        count, mu, nu = convert_adam_state(
            opt_states[0], g_keys, g_params, keyset, strip_prefix="generator"
        )
        g_opt_state = _overlay_adam(g_opt_state, count, mu, nu)
        count, mu, nu = convert_adam_state(opt_states[1], d_keys, d_params, keyset)
        d_opt_state = _overlay_adam(d_opt_state, count, mu, nu)

    state = state.replace(
        params=params,
        batch_stats=variables.get("batch_stats", state.batch_stats),
        spectral=variables.get("spectral", state.spectral),
        g_opt_state=g_opt_state,
        d_opt_state=d_opt_state,
        step=jnp.asarray(global_step, jnp.int32),
    )
    return state, config
