"""PyTorch checkpoint -> JAX variable-tree converter.

Handles the reference's state-dict conventions (SURVEY.md quirk Q10):

* spectral-norm parametrization keys
  (``X.parametrizations.weight.original`` -> ``params/X/kernel``,
  ``X.parametrizations.weight.0._u``/``_v`` -> ``spectral/X/uv``);
* OLD-style spectral-norm keys from the pre-parametrization
  ``torch.nn.utils.spectral_norm`` era (``X.weight_orig``/``X.weight_u``/
  ``X.weight_v``; a derived plain ``X.weight`` coexisting with
  ``weight_orig`` is skipped);
* conv kernels OIHW -> HWIO (OIDHW -> DHWIO for 3-D), linear (out,in) ->
  (in,out);
* BatchNorm ``weight``/``bias``/``running_mean``/``running_var`` ->
  ``params/X/{scale,bias}`` + ``batch_stats/X/{mean,var}``
  (``num_batches_tracked`` dropped);
* module paths are preserved verbatim — this framework names its Flax
  modules identically to the reference's attribute names.

Input tensors may be ``torch.Tensor`` or ``numpy.ndarray`` (so safetensors
files can be loaded without torch).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    # NOTE: always copy — torch `.numpy()` shares memory with the tensor, and
    # JAX-on-CPU can zero-copy-alias numpy buffers, so a later in-place torch
    # update (e.g. BN running stats) would silently mutate converted arrays.
    if isinstance(t, np.ndarray):
        return np.array(t)
    try:  # torch.Tensor without importing torch at module scope
        return np.array(t.detach().cpu().numpy())
    except AttributeError:
        return np.array(t)


def _fold_list_indices(path: Tuple[str, ...]) -> Tuple[str, ...]:
    """Fold torch ModuleList indices into the parent name.

    Torch key ``intermediate_dblocks.0.conv_1x1`` becomes our module name
    ``intermediate_dblocks.0`` (a single dotted Flax name), so the path
    component ``"0"`` is re-joined to its predecessor.
    """
    out = []
    for p in path:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}.{p}"
        else:
            out.append(p)
    return tuple(out)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], leaf_name: str, value) -> None:
    node = tree
    for p in _fold_list_indices(path):
        node = node.setdefault(p, {})
    node[leaf_name] = value


def convert_torch_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Convert a torch state dict into ``{"params": ..., "batch_stats": ..., "spectral": ...}``.

    The returned trees use nested dicts keyed by the reference module path
    components.  Spectral ``uv`` leaves are ``(u, v)`` tuples matching the
    framework's ``spectral`` collection layout.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    spectral_u: Dict[Tuple[str, ...], np.ndarray] = {}
    spectral_v: Dict[Tuple[str, ...], np.ndarray] = {}

    keys = set(state_dict.keys())

    def is_bn(prefix: str) -> bool:
        rm = f"{prefix}.running_mean" if prefix else "running_mean"
        return rm in keys

    def has_old_sn(prefix: str) -> bool:
        wo = f"{prefix}.weight_orig" if prefix else "weight_orig"
        return wo in keys

    for key, raw in state_dict.items():
        value = _to_numpy(raw)
        parts = key.split(".")

        # Old-style spectral norm (pre-parametrization
        # ``torch.nn.utils.spectral_norm``): ``weight_orig``/``weight_u``/
        # ``weight_v`` live directly on the module; a derived plain ``weight``
        # may coexist in very old checkpoints and is skipped.
        if parts[-1] in ("weight_orig", "weight_u", "weight_v"):
            path = tuple(parts[:-1])
            if parts[-1] == "weight_orig":
                _set(params, path, "kernel", _convert_weight(value))
            elif parts[-1] == "weight_u":
                spectral_u[path] = value
            else:
                spectral_v[path] = value
            continue
        if parts[-1] == "weight" and has_old_sn(".".join(parts[:-1])):
            continue

        if "parametrizations" in parts:
            i = parts.index("parametrizations")
            path = tuple(parts[:i])
            tail = parts[i + 1 :]  # ["weight", "original"] or ["weight", "0", "_u"/"_v"]
            if tail[-1] == "original":
                _set(params, path, "kernel", _convert_weight(value))
            elif tail[-1] == "_u":
                spectral_u[path] = value
            elif tail[-1] == "_v":
                spectral_v[path] = value
            else:
                raise ValueError(f"unrecognized parametrization key: {key}")
            continue

        leaf = parts[-1]
        prefix = ".".join(parts[:-1])
        path = tuple(parts[:-1])

        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            _set(batch_stats, path, "mean", value)
            continue
        if leaf == "running_var":
            _set(batch_stats, path, "var", value)
            continue
        if leaf == "weight":
            if is_bn(prefix):
                _set(params, path, "scale", value)
            else:
                _set(params, path, "kernel", _convert_weight(value))
            continue
        if leaf == "bias":
            _set(params, path, "bias", value)
            continue
        if leaf == "gamma":  # AttentionLayer gain parameter
            _set(params, path, "gamma", value)
            continue
        # Unknown leaves (e.g. distribution buffers) are ignored.

    spectral: Dict[str, Any] = {}
    for path, u in spectral_u.items():
        v = spectral_v[path]
        _set(spectral, path, "uv", (u, v))

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    if spectral:
        out["spectral"] = spectral
    return out


def _convert_weight(w: np.ndarray) -> np.ndarray:
    """Torch weight -> our kernel layout."""
    if w.ndim == 4:  # OIHW -> HWIO
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 5:  # OIDHW -> DHWIO
        return np.transpose(w, (2, 3, 4, 1, 0))
    if w.ndim == 2:  # (out, in) -> (in, out)
        return np.transpose(w, (1, 0))
    if w.ndim == 1:
        return w
    raise ValueError(f"unsupported weight ndim: {w.ndim}")


def merge_into_variables(variables: Mapping[str, Any], converted: Mapping[str, Any]):
    """Overlay ``converted`` trees onto an existing variables dict (shape-checked).

    Returns a new variables dict with the same structure as ``variables``;
    every leaf present in ``converted`` replaces the corresponding leaf.
    Raises KeyError / ValueError on structure or shape mismatches so weight
    conversion bugs fail loudly.
    """
    import jax.numpy as jnp

    def overlay(dst, src, path=()):
        if not isinstance(dst, Mapping):
            raise KeyError(f"structure mismatch at {'/'.join(path)}")
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(
                    f"converted key {'/'.join(path + (k,))} not present in model variables; "
                    f"available: {list(dst.keys())}"
                )
            if isinstance(v, Mapping):
                out[k] = overlay(dst[k], v, path + (k,))
            elif isinstance(v, tuple):  # spectral uv
                old = dst[k]
                new = tuple(jnp.asarray(x) for x in v)
                for o, n in zip(old, new):
                    if o.shape != n.shape:
                        raise ValueError(
                            f"shape mismatch at {'/'.join(path + (k,))}: {o.shape} vs {n.shape}"
                        )
                out[k] = new
            else:
                old = dst[k]
                new = jnp.asarray(v)
                if old.shape != new.shape:
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: {old.shape} vs {new.shape}"
                    )
                out[k] = new.astype(old.dtype)
        return out

    return overlay(variables, converted)
