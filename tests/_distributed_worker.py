"""Worker for tests/test_distributed.py — one of two real JAX processes.

Run as: python _distributed_worker.py <port> <process_id> <fixture_glob>
                                      <out_json> <ckpt_dir>

Each worker owns 2 virtual CPU devices (4 global across the 2 processes) and
exercises, against the REAL ``jax.distributed`` runtime (not passed-in
indices): the global device view, a cross-process collective, NimrodStream's
per-host sharding defaults, and a multi-host Orbax save/restore.
"""

import json
import os
import sys

port, process_id, fixture_glob, out_json, ckpt_dir = sys.argv[1:6]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
# Tiny programs only — keep the persistent compile cache out of the picture.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from skillful_nowcasting_tpu.parallel import init_distributed, make_mesh  # noqa: E402

init_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=int(process_id),
)

result = {
    "process_id": int(process_id),
    "process_count": jax.process_count(),
    "process_index": jax.process_index(),
    "n_global_devices": len(jax.devices()),
    "n_local_devices": len(jax.local_devices()),
}

# --- cross-process collective: global sum over a mesh spanning both hosts ---
mesh = make_mesh(n_data=4)
sharding = NamedSharding(mesh, P("data"))


def _shard_values(index):
    start = index[0].start or 0
    stop = index[0].stop if index[0].stop is not None else 4
    return np.stack(
        [np.full((8,), s + 1.0, np.float32) for s in range(start, stop)]
    )


garr = jax.make_array_from_callback((4, 8), sharding, _shard_values)
# Requires data from BOTH processes (process 0 holds shards 0-1, process 1
# holds 2-3): (1+2+3+4)*8 = 80.
result["global_sum"] = float(jax.jit(lambda x: x.sum())(garr))

# --- NimrodStream per-host sharding picks up the distributed runtime --------
from skillful_nowcasting_tpu.data.nimrod import NimrodStream  # noqa: E402

stream = NimrodStream(
    num_input_frames=2,
    num_target_frames=2,
    shuffle_buffer=4,
    dataset_name="parquet",
    config_name=None,
    load_kwargs={"data_files": {"train": fixture_glob}},
    # no process_index/process_count: must default from jax.process_*()
)
row_ids = set()
it = iter(stream)
for _ in range(4):
    images, future = next(it)
    row_ids.add(int(images.flat[0]))
result["row_ids"] = sorted(row_ids)

# --- multi-host Orbax save/restore of a globally-sharded pytree -------------
from skillful_nowcasting_tpu.checkpoint import make_manager  # noqa: E402

import orbax.checkpoint as ocp  # noqa: E402

manager = make_manager(ckpt_dir)
manager.save(0, args=ocp.args.StandardSave({"a": garr}))
manager.wait_until_finished()
template = {"a": jax.ShapeDtypeStruct((4, 8), np.float32, sharding=sharding)}
restored = manager.restore(0, args=ocp.args.StandardRestore(template))
local = [s.data for s in restored["a"].addressable_shards]
expect = [s.data for s in garr.addressable_shards]
ok = all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(local, expect))
result["ckpt_roundtrip_ok"] = bool(ok)
manager.close()

with open(out_json, "w") as f:
    json.dump(result, f)
print(f"worker {process_id}: {result}")
