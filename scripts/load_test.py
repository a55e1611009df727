"""Load generator for the serving API: measures throughput + latency
percentiles at a given concurrency against serve/api_server.py.

    python scripts/load_test.py --url http://127.0.0.1:8000 \
        --concurrency 4 --requests 16 --steps 28 --image in.png

Shape-identical requests (same size/steps/CFG) are emitted so the server's
--max_batch coalescing can engage; compare throughput with max_batch 1 vs 4
to see the batched-scan win on real hardware. Prints one JSON line:
{"requests", "ok", "errors", "wall_s", "req_per_s", "p50_s", "p90_s",
 "p99_s", "server_stats"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpt_image_edit_tpu.serve.scheduler import _percentile  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="API server load test")
    p.add_argument("--url", type=str, default="http://127.0.0.1:8000")
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--steps", type=int, default=28)
    p.add_argument("--image", type=str, default=None,
                   help="optional conditioning image (same for all requests)")
    p.add_argument("--height", type=int, default=None,
                   help="output height (pin the serving shape explicitly so "
                        "the run hits the --warmup'd program)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--timeout", type=float, default=1800.0)
    args = p.parse_args(argv)

    from gpt_image_edit_tpu.serve.client import ApiClient

    client = ApiClient(args.url, timeout=args.timeout)
    # Read the conditioning image ONCE as bytes; each request decodes its
    # own PIL Image from them. A single shared Image.open(...) raced under
    # --concurrency>1 (PIL lazy decode + encode are not thread-safe):
    # observed "broken data stream when reading image file" on exactly the
    # first concurrent pair of requests in the r05 serving bench.
    img_bytes = None
    if args.image:
        with open(args.image, "rb") as f:
            img_bytes = f.read()

    latencies, errors = [], []
    lock = threading.Lock()
    next_id = iter(range(args.requests))

    def worker():
        while True:
            with lock:
                i = next(next_id, None)
            if i is None:
                return
            t0 = time.perf_counter()
            try:
                images = []
                if img_bytes is not None:
                    import io

                    from PIL import Image

                    images = [Image.open(io.BytesIO(img_bytes))]
                kw = {}
                if args.height is not None:
                    kw["height"] = args.height
                if args.width is not None:
                    kw["width"] = args.width
                client.edit(f"load test request {i}", images,
                            steps=args.steps, seed=i, **kw)
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
            except Exception as e:  # noqa: BLE001 — tallied, not fatal
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker)
               for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    lat = sorted(latencies)
    out = {
        "requests": args.requests,
        "concurrency": args.concurrency,
        "ok": len(latencies),
        "errors": len(errors),
        "wall_s": round(wall, 3),
        "req_per_s": round(len(latencies) / wall, 4) if wall else 0.0,
        "p50_s": round(_percentile(lat, 0.50), 3),
        "p90_s": round(_percentile(lat, 0.90), 3),
        "p99_s": round(_percentile(lat, 0.99), 3),
    }
    try:
        out["server_stats"] = client.stats()
    except Exception:  # noqa: BLE001 — stats are best-effort
        pass
    if errors:
        print("\n".join(errors[:5]), file=sys.stderr)
    print(json.dumps(out))
    return 0 if not errors else 1


if __name__ == "__main__":
    raise SystemExit(main())
