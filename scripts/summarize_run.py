"""Summarize a training run's stderr logs into markdown tables.

The trainer logs ``step N: k=v ...`` lines (train every ``--log-every``,
val every ``--val-every``).  This merges possibly-rotated logs (``.err``,
``.err.N``), dedupes resumed step ranges (later files win), and prints:

* a train table sampled every ``--every`` steps (d_loss/d_grad_norm/
  g_disc_loss/grid_loss + a rolling D-activity rate — the hinge saturates
  intermittently, so point samples of d_loss alone are misleading), and
* every validation row (CRPS/pooled CRPS/CSI/MSE trend — the actual
  "does the GAN train" evidence, VERDICT r2 ask #2).

Usage: python scripts/summarize_run.py /tmp/run2k.err* [--every 100]
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

LINE = re.compile(r"^step (\d+): (.*)$")


def parse(paths):
    train, val = {}, {}
    # Sort rotated logs oldest-first so resumed ranges overwrite stale ones.
    def age(p):
        m = re.search(r"\.err(?:\.(\d+))?$", p)
        return -int(m.group(1)) if m and m.group(1) else 0

    for p in sorted(paths, key=age):
        for line in Path(p).read_text(errors="replace").splitlines():
            m = LINE.match(line.strip())
            if not m:
                continue
            step = int(m.group(1))
            kv = dict(
                (k, float(v))
                for k, v in (item.split("=") for item in m.group(2).split())
            )
            if any(k.startswith("val/") for k in kv):
                val[step] = kv
            else:
                train[step] = kv
    return train, val


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--every", type=int, default=100)
    args = ap.parse_args()

    train, val = parse(args.logs)
    steps = sorted(train)
    if steps:
        print("| step | d_loss | d_grad_norm | D-active (last 10 logs) | g_disc_loss | grid_loss | steps/s |")
        print("|---|---|---|---|---|---|---|")
        for i, s in enumerate(steps):
            if s % args.every:
                continue
            t = train[s]
            window = [train[x] for x in steps[max(0, i - 9) : i + 1]]
            active = sum(1 for w in window if w.get("train/d_grad_norm", 0) > 0)
            print(
                f"| {s} | {t.get('train/d_loss', float('nan')):.3f} "
                f"| {t.get('train/d_grad_norm', float('nan')):.2f} "
                f"| {active}/{len(window)} "
                f"| {t.get('train/g_disc_loss', float('nan')):.2f} "
                f"| {t.get('train/grid_loss', float('nan')):.3g} "
                f"| {t.get('train/steps_per_sec', float('nan')):.3f} |"
            )
    if val:
        cols = ["val/crps", "val/crps_pool4", "val/crps_pool16", "val/csi_1", "val/csi_4", "val/csi_8", "val/mse", "val/d_loss"]
        print()
        print("| step | " + " | ".join(c.split("/", 1)[1] for c in cols) + " |")
        print("|" + "---|" * (len(cols) + 1))
        for s in sorted(val):
            v = val[s]
            print(
                f"| {s} | "
                + " | ".join(
                    (f"{v[c]:.4g}" if c in v else "—") for c in cols
                )
                + " |"
            )


if __name__ == "__main__":
    main()
