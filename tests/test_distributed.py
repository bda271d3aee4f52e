"""Real 2-process ``jax.distributed`` execution test (VERDICT r3 item 6).

Everything else in the suite emulates multi-host by passing explicit
``process_index``/``process_count``; this test spawns TWO actual JAX
processes against a local coordinator (CPU backend, 2 virtual devices each)
and verifies the pieces the reference gets from Lightning's DDP launcher
(``/root/reference/train/run.py:165-170``):

* ``init_distributed`` wires the runtime: process_count=2, a global view of
  4 devices, 2 addressable per process;
* a jitted reduction over a ``make_mesh(n_data=4)`` mesh spanning both
  processes returns the global answer (the collective crosses the process
  boundary);
* ``NimrodStream`` with NO explicit indices picks its per-host shard from
  ``jax.process_index()`` and the two processes see DISJOINT file shards;
* Orbax save/restore of a globally-sharded pytree round-trips through our
  ``make_manager`` (multi-host coordination: process 0 writes metadata, each
  process writes its own shards).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    datasets = pytest.importorskip("datasets")

    # 4 parquet files x 2 rows; every frame of a row holds its global row id,
    # so a window's first pixel identifies which file shard produced it.
    fixture = tmp_path / "nimrod_parquet"
    fixture.mkdir()
    for f in range(4):
        rows = [
            np.full((8, 16, 16, 1), f * 2 + r, dtype=np.int16).tolist()
            for r in range(2)
        ]
        datasets.Dataset.from_dict({"radar_frames": rows}).to_parquet(
            str(fixture / f"part-{f}.parquet")
        )

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    procs, outs = [], []
    for pid in range(2):
        out_json = str(tmp_path / f"worker{pid}.json")
        outs.append(out_json)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(HERE, "_distributed_worker.py"),
                    str(port),
                    str(pid),
                    str(fixture / "part-*.parquet"),
                    out_json,
                    str(tmp_path / "ckpt"),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for pid, (p, out_json) in enumerate(zip(procs, outs)):
        try:
            stdout, stderr = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout}\n{stderr}"
        with open(out_json) as f:
            results.append(json.load(f))

    for pid, r in enumerate(results):
        assert r["process_count"] == 2
        assert r["process_index"] == pid
        assert r["n_global_devices"] == 4
        assert r["n_local_devices"] == 2
        # (1+2+3+4) * 8 — needs both processes' shards.
        assert r["global_sum"] == 80.0
        assert r["ckpt_roundtrip_ok"] is True
        assert r["row_ids"], f"worker {pid} saw no data"

    # split_dataset_by_node keyed on the REAL process index: disjoint shards.
    ids0, ids1 = set(results[0]["row_ids"]), set(results[1]["row_ids"])
    assert ids0.isdisjoint(ids1), f"overlapping host shards: {ids0 & ids1}"
