"""AOT serving artifacts: serialize the compiled nowcast for model-free deploy.

The reference deploys by shipping Python model code + a checkpoint and
re-instantiating ``DGMR.from_pretrained`` in every serving process
(``/root/reference/README.md:57-69``).  TPU-native serving wants the
opposite: trace + lower ONCE, ship the lowered program, and let serving
hosts run it with no model code, no Flax, and no tracing cost —
``jax.export`` serializes the jitted ensemble forward to a versioned
StableHLO artifact with lowering-time shape/dtype guarantees.
(Serialization is ``jax.export.Exported.serialize`` on the exported
object; loading is :func:`jax.export.deserialize`.)

One ``.dgmrx`` file (a zip) carries everything a serving host needs:

* ``module.stablehlo``  — the serialized exported program
  (``Exported.serialize()``), target platform(s) recorded;
* ``weights.npz``       — the variables tree, flattened in a stable order;
* ``meta.json``         — model config, input/output shapes+dtypes,
  ensemble size, artifact version.

The export takes the weights as *arguments* (a flat list, unflattened
inside the traced fn), NOT as baked-in constants: weights stay updatable
without re-tracing, the artifact stays small relative to one giant constant
blob, and the loader can feed device-resident weights.  The PRNG enters as
raw ``uint32`` key data (``jax.random.wrap_key_data`` inside the program)
so the artifact is independent of JAX's typed-key representation.

Cross-platform: ``platforms=("tpu", "cpu")`` at export time produces one
artifact loadable on both backends (``tests/test_serving.py`` round-trips
the artifact on the test platform; numerics across platforms carry the
usual backend-precision caveats).

Usage::

    save_exported("model.dgmrx", model, variables, batch_size=16)
    # -- serving host: no skillful_nowcasting_tpu import needed ----------
    server = load_exported("model.dgmrx")         # jax + numpy only
    forecast = server.generate(x, seed=7)          # (S, B, T, H, W, C)
"""

from __future__ import annotations

import io
import json
import zipfile
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_VERSION = 1
_SEP = "::"  # flat-key separator; model scope names never contain it


def _flatten(variables):
    """(names, leaves, treedef) with deterministic path-string keys."""
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(variables)
    names = [
        _SEP.join(str(getattr(k, "key", k)) for k in path)
        for path, _ in leaves_with_path
    ]
    return names, [leaf for _, leaf in leaves_with_path], treedef


def export_nowcast(
    model,
    variables,
    *,
    batch_size: int,
    input_frames: int = 4,
    height: Optional[int] = None,
    width: Optional[int] = None,
    num_samples: Optional[int] = None,
    microbatch: Optional[int] = 16,
    compute_dtype=None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the jitted ensemble generate to a :class:`jax.export.Exported`.

    Shapes are concrete (AOT serving contract: one artifact per batch
    shape — the in-jit ``lax.scan`` microbatching needs a static batch).
    ``compute_dtype=jnp.bfloat16`` casts weights and input inside the
    program (f32 in/out interface, MXU-rate compute — the measured-fastest
    serving config).  ``platforms`` defaults to the current backend.
    """
    from .dgmr import HPARAM_FIELDS
    from .inference import make_generate

    h = height or model.output_shape
    w = width or model.output_shape
    n = num_samples if num_samples is not None else model.num_samples
    generate = make_generate(model, num_samples=n, microbatch=microbatch)

    names, leaves, treedef = _flatten(variables)

    def serve(flat, x, key_data):
        tree = jax.tree_util.tree_unflatten(treedef, flat)
        if compute_dtype is not None:
            tree = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                tree,
            )
            x = x.astype(compute_dtype)
        out = generate(tree, x, jax.random.wrap_key_data(key_data))
        return out.astype(jnp.float32)

    x_spec = jax.ShapeDtypeStruct(
        (batch_size, input_frames, h, w, model.input_channels), jnp.float32
    )
    key_spec = jax.ShapeDtypeStruct(
        jax.random.key_data(jax.random.key(0)).shape, jnp.uint32
    )
    flat_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax.export.export(jax.jit(serve), **kwargs)(
        flat_specs, x_spec, key_spec
    )
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "config": {
            f: getattr(model, f) for f in HPARAM_FIELDS if hasattr(model, f)
        },
        "num_samples": n,
        "input_shape": list(x_spec.shape),
        "output_shape": [n, batch_size, model.forecast_steps, h, w,
                         model.input_channels],
        "compute_dtype": (
            jnp.dtype(compute_dtype).name if compute_dtype is not None else None
        ),
        "platforms": list(exported.platforms),
        "param_names": names,
        # PRNG contract: the traced program consumes raw key data of this
        # impl/shape; record both so serving hosts with a different
        # jax_default_prng_impl (e.g. rbg: (4,) words vs threefry (2,))
        # reconstruct the right key instead of hitting a shape error.
        "prng_impl": str(jax.config.jax_default_prng_impl),
        "key_data_shape": list(key_spec.shape),
    }
    return exported, meta, leaves


def save_exported(path: str, model, variables, **kwargs) -> dict:
    """Export + write one ``.dgmrx`` zip artifact.  Returns the meta dict."""
    exported, meta, leaves = export_nowcast(model, variables, **kwargs)
    buf = io.BytesIO()
    np.savez(buf, *[np.asarray(l) for l in leaves])
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("module.stablehlo", exported.serialize())
        z.writestr("weights.npz", buf.getvalue())
        z.writestr("meta.json", json.dumps(meta))
    return meta


@dataclass
class NowcastServer:
    """A loaded serving artifact: ``generate(x, seed)`` with no model code.

    ``weights`` live wherever the caller put them (host numpy after
    :func:`load_exported`; ``jax.device_put`` them once for serving — host
    arrays re-transfer on every call, see CLAUDE.md).
    """

    call: callable
    weights: list
    meta: dict

    def generate(self, x, seed: int = 0):
        # Build the key with the EXPORT-time PRNG impl (recorded in meta):
        # the traced program's key_data shape is baked in, so the serving
        # host's jax_default_prng_impl must not leak in here.
        impl = self.meta.get("prng_impl")
        key = jax.random.key_data(jax.random.key(seed, impl=impl))
        want = self.meta.get("key_data_shape")
        if want is not None and list(key.shape) != list(want):
            raise ValueError(
                f"PRNG key data shape {tuple(key.shape)} (impl={impl!r}) != "
                f"exported shape {tuple(want)}; the artifact was exported "
                "under a different jax_default_prng_impl"
            )
        return self.call(self.weights, jnp.asarray(x, jnp.float32), key)

    def place(self, device=None):
        """Move weights on-device once (avoids per-call host transfers)."""
        self.weights = jax.device_put(
            self.weights, device or jax.devices()[0]
        )
        return self


def load_exported(path: str) -> NowcastServer:
    """Load a ``.dgmrx`` artifact.  Needs jax + numpy only."""
    with zipfile.ZipFile(path) as z:
        exported = jax.export.deserialize(z.read("module.stablehlo"))
        meta = json.loads(z.read("meta.json"))
        npz = np.load(io.BytesIO(z.read("weights.npz")))
        n = len(meta["param_names"])
        if len(npz.files) != n:
            raise ValueError(
                f"artifact weight count {len(npz.files)} != {n} recorded names"
            )
        # Index by positional savez key, NOT archive member order: a
        # repacked/reordered zip must not silently permute the weights fed
        # to the program's positional arguments.
        weights = [npz[f"arr_{i}"] for i in range(n)]
    return NowcastServer(call=exported.call, weights=weights, meta=meta)
