#!/usr/bin/env python
"""Re-measure the full-depth MLP2 train rows ONLY if no plat=tpu row with
the unified statistics (min+median, mfu_3x/mfu_4x — VERDICT r4 #6) exists
yet. The supervised bench measures them when its 22-min deadline allows;
this backstop runs them row-by-row afterwards without duplicating work.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "bench_experiments.jsonl")


def have(hw: int, quant: str, max_age_h: float = 48.0) -> bool:
    if not os.path.exists(LOG):
        return False
    cutoff = time.time() - max_age_h * 3600
    for line in open(LOG):
        try:
            r = json.loads(line)
        except ValueError:
            continue
        # t_median_s + mfu_3x only exist on post-r4 unified-stat rows
        if (r.get("kind") == "train_full_mlp2" and r.get("plat") == "tpu"
                and r.get("hw") == hw and r.get("quant") == quant
                and "t_median_s" in r and "mfu_3x" in r):
            ts = time.mktime(time.strptime(r["ts"], "%Y-%m-%d %H:%M:%S"))
            if ts >= cutoff:
                return True
    return False


def main() -> int:
    for row, hw, quant in (("full_int4_512", 512, "int4"),
                           ("full_int4_1024", 1024, "int4")):
        if have(hw, quant):
            print(f"{row}: fresh tagged row exists, skipping", flush=True)
            continue
        print(f"{row}: measuring...", flush=True)
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--phase", "train", "--only", row],
            cwd=REPO, timeout=1500,
        ).returncode
        print(f"{row}: rc={rc}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
