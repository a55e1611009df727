#!/usr/bin/env python
"""HTTP serving throughput on hardware (VERDICT r4 #3): start the API
server with synthetic full-size weights, run scripts/load_test.py at
--max_batch 1 vs 2, and write SERVING_r05.json with req/s + latency
percentiles per configuration — settling whether HTTP-level coalescing
pays despite the known scan-level bs=2 regression (27.12 vs 22.92 s/img,
bench_experiments.jsonl) by amortizing prefill/VAE/staging.

Single-chip (16GB) config: --offload + W8A8 FLUX + int8 VLM, the same mode
the r4 hardware debugging validated. Each server gets its own process and
is killed by pid. Compile cache (.jax_cache) makes server restarts warm.

Usage: python scripts/serving_bench.py [--batches 1,2] [--requests 4]
       [--steps 28] [--size 1024] [--out SERVING_r05.json] [--tiny-cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def wait_healthz(port: int, budget_s: float, proc) -> bool:
    t0 = time.time()
    while time.time() - t0 < budget_s:
        if proc.poll() is not None:
            log(f"server exited rc={proc.returncode} during warmup")
            return False
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=5
            ) as r:
                if r.status == 200:
                    return True
        except Exception:
            pass
        time.sleep(10)
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1,2")
    ap.add_argument("--requests", type=int, default=4)
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--port", type=int, default=8019)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "SERVING_r05.json"))
    ap.add_argument("--warmup_budget_s", type=float, default=2400.0)
    ap.add_argument("--tiny-cpu", action="store_true",
                    help="CPU smoke: --tiny weights, small shapes")
    args = ap.parse_args()

    size, steps = args.size, args.steps
    if args.tiny_cpu:
        size, steps = 64, 4

    img_path = "/tmp/serving_bench_in.png"
    subprocess.run([sys.executable, "-c", (
        "from PIL import Image; import numpy as np; "
        "Image.fromarray(np.random.default_rng(0).integers("
        f"0, 255, ({size}, {size}, 3), dtype='uint8')).save({img_path!r})"
    )], check=True)

    rows = []
    for mb in [int(x) for x in args.batches.split(",")]:
        cmd = [sys.executable, "-m", "gpt_image_edit_tpu.serve.api_server",
               "--port", str(args.port), "--max_batch", str(mb),
               "--coalesce_window_ms", "200",
               "--warmup", f"{size}x{size}:{steps}",
               "--warmup_variants", "plain"]
        if args.tiny_cpu:
            cmd += ["--tiny"]
            env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        else:
            cmd += ["--synthetic_full", "--offload", "--quantize", "w8a8",
                    "--quantize_vlm", "int8"]
            env = dict(os.environ)
        log(f"--- max_batch={mb}: starting server ---")
        slog = open(f"/tmp/serving_bench_mb{mb}.log", "w")
        proc = subprocess.Popen(cmd, stdout=slog, stderr=slog, env=env,
                                cwd=REPO)
        try:
            if not wait_healthz(args.port, args.warmup_budget_s, proc):
                log(f"max_batch={mb}: server never became healthy; skipping")
                rows.append({"max_batch": mb, "error": "warmup timeout"})
                continue
            log(f"max_batch={mb}: healthy; load test "
                f"({args.requests} reqs, conc {max(mb, 2)})")
            lt = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts/load_test.py"),
                 "--url", f"http://127.0.0.1:{args.port}",
                 "--concurrency", str(max(mb, 2)),
                 "--requests", str(args.requests),
                 "--steps", str(steps), "--image", img_path,
                 "--height", str(size), "--width", str(size)],
                capture_output=True, text=True, timeout=5400, env=env,
            )
            if lt.stderr.strip():
                # per-request error details (client-side exceptions) only
                # live on load_test's stderr — always keep them
                log(f"load_test stderr: {lt.stderr.strip()[-600:]}")
            line = (lt.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                row = json.loads(line)
            except ValueError:
                log(f"load_test output unparseable: {lt.stdout[-400:]}")
                row = {"error": "unparseable", "rc": lt.returncode}
            row["max_batch"] = mb
            rows.append(row)
            log(f"max_batch={mb}: {json.dumps(row)}")
        finally:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
            slog.close()
        time.sleep(5)

    out = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "config": ("tiny-cpu" if args.tiny_cpu else
                   "synthetic_full + offload + w8a8 FLUX + int8 VLM, "
                   "one v5e chip"),
        "size": size, "steps": steps, "requests": args.requests,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    # mirror into the append-only evidence log (plat-tagged there)
    if not args.tiny_cpu:
        import bench

        for row in rows:
            if "req_per_s" in row:
                bench._log_experiment(
                    "serving_http", max_batch=row["max_batch"],
                    req_per_s=row["req_per_s"], p50_s=row.get("p50_s"),
                    p90_s=row.get("p90_s"), p99_s=row.get("p99_s"),
                    requests=args.requests, size=size, steps=steps,
                )
        # VERDICT r4 #4: the max_batch=1 p50 IS a timed offloaded
        # full-pipeline edit on the chip (VLM prefill + T5 + scan + VAE
        # through the pinned-host staging path)
        mb1 = next((r for r in rows
                    if r.get("max_batch") == 1 and "p50_s" in r), None)
        if mb1:
            bench._log_experiment(
                "offload_edit", p50_s=mb1["p50_s"], p99_s=mb1.get("p99_s"),
                size=size, steps=steps,
                config="synthetic_full offload w8a8 + int8 VLM",
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
