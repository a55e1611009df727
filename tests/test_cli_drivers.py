"""CLI-level smoke of the benchmark generation driver and the serve CLI —
catches argument-wiring regressions the library tests can't
(ref: the reference drives everything through step1_gen_samples.py CLIs)."""

import json
import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=ENV,
        capture_output=True, text=True, timeout=timeout,
    )


def test_run_eval_imgedit_tiny(tmp_path):
    rng = np.random.default_rng(0)
    src = tmp_path / "imgs" / "a.png"
    os.makedirs(src.parent)
    Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(src)
    bench = {"k1": {"id": "a.png", "prompt": "make it blue", "edit_type": "alter"}}
    dj = tmp_path / "basic_edit.json"
    dj.write_text(json.dumps(bench))
    out_dir = tmp_path / "out"

    p = _run([
        "scripts/run_eval.py", "imgedit", "--tiny",
        "--data_json", str(dj), "--image_root", str(tmp_path / "imgs"),
        "--output_dir", str(out_dir), "--steps", "2",
    ])
    assert p.returncode == 0, p.stdout + p.stderr
    assert (out_dir / "k1.png").exists()


def test_run_eval_quantized_serving_flags(tmp_path):
    """--quantize/--quantize_vlm/--vae_dtype reach the eval runtime (the
    16GB single-chip eval runs need them); wiring-level regression."""
    rng = np.random.default_rng(2)
    src = tmp_path / "imgs" / "b.png"
    os.makedirs(src.parent)
    Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(src)
    bench = {"k2": {"id": "b.png", "prompt": "add snow", "edit_type": "alter"}}
    dj = tmp_path / "basic_edit.json"
    dj.write_text(json.dumps(bench))
    out_dir = tmp_path / "out"

    p = _run([
        "scripts/run_eval.py", "imgedit", "--tiny",
        "--data_json", str(dj), "--image_root", str(tmp_path / "imgs"),
        "--output_dir", str(out_dir), "--steps", "2",
        "--quantize", "int8", "--quantize_vlm", "--vae_dtype", "float32",
    ])
    assert p.returncode == 0, p.stdout + p.stderr
    assert (out_dir / "k2.png").exists()


def test_serve_cli_one_shot(tmp_path):
    rng = np.random.default_rng(1)
    src = tmp_path / "in.png"
    Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(src)
    out = tmp_path / "out.png"
    p = _run([
        "-m", "gpt_image_edit_tpu.serve.cli", "--tiny",
        "--image", str(src), "--prompt", "make the sky dramatic",
        "--output", str(out), "--steps", "2",
    ])
    assert p.returncode == 0, p.stdout + p.stderr
    assert out.exists()


def test_bench_driver_contract(tmp_path):
    """The driver runs `python bench.py` and records ONE JSON line from
    stdout: {metric, value, unit, vs_baseline}. The forced-CPU smoke path
    must uphold that contract end to end (supervisor -> scan phase -> JSON)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["unit"] == "images/sec/chip" and out["value"] > 0


def test_bench_cached_emit_when_tunnel_down(tmp_path):
    """If the TPU tunnel is down at bench time, the supervisor must degrade
    to the last good measurement with an explicit CACHED label and rc 0 —
    never rc 1 (VERDICT r2 #1: round 2's perf evidence was lost exactly this
    way). Simulated with a nonexistent backend so the probe fails fast."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "nonexistent_backend"
    env["GIE_BENCH_MAX_WAIT"] = "0"
    env["GIE_BENCH_PROBE_TIMEOUT"] = "90"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert os.path.exists(os.path.join(repo, "bench_last_good.json"))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["metric"].startswith("[CACHED")
    assert out["value"] > 0


def test_bench_usable_scan_guard():
    """A partial scan result with no measured row and a NaN fit (child killed
    after one depth row) must NOT be emitted — the supervisor falls back to
    the cache instead of printing value=NaN to the driver."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert not bench._usable_scan(None)
    assert not bench._usable_scan({"rows": [[2, 4, 1.0]], "measured": {},
                                   "fit_img_s": float("nan")})
    assert bench._usable_scan({"rows": [], "measured": {"W8A8": 23.2},
                               "fit_img_s": float("nan")})
    assert bench._usable_scan({"rows": [[2, 4, 1.0], [4, 8, 1.9]],
                               "measured": {}, "fit_img_s": 0.03})
