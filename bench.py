#!/usr/bin/env python
"""Headline benchmark: 28-step 1024x1024 FLUX-Kontext edit throughput per chip.

Driver contract: prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"} on stdout; everything else goes to stderr.

Structure (VERDICT r2 #1: the round-2 bench crashed on a wedged TPU tunnel
and lost the round's perf evidence):

- SUPERVISOR (default, no jax import): health-checks the TPU tunnel in an
  isolated subprocess (a hung probe cannot wedge this process), with bounded
  retries per the CLAUDE.md tunnel playbook; then runs each measurement
  phase as a subprocess with its own timeout so a mid-phase wedge loses one
  phase, not the round. Every successful run is persisted to
  bench_last_good.json; if the tunnel stays down the last good measurement
  is emitted with an explicit CACHED label instead of crashing with rc=1.
- CHILD PHASES (bench.py --phase X --out F):
    scan   headline: 28-step denoise scan at full width; depth-scaled bf16
           rows (linear-fit cross-check) + MEASURED full 19+38-block model
           int8 weight-only and W8A8 (the serving modes that fit 16GB HBM).
    e2e    the rest of the serving path (VERDICT r2 #2): int8 7B VLM
           denoise_embeds forward (ViT 448^2 + LM trunk + MLP2) and fp32
           VAE encode/decode at 1024^2. One 16GB chip cannot co-reside the
           7B VLM and the 12B FLUX, so end-to-end latency is composed as
           t_vlm + t_vae_enc + t_scan + t_vae_dec (on a v5e-8 the models
           are resident on disjoint chips and the compose is pipelined).
    train  fwd+bwd+AdamW step at (2,4) depth full width with MFU under
           both 4x-remat and standard 3x accounting, plus a two-depth
           fwd/bwd-only fit grounding the full-depth estimate
           (VERDICT r2 #7; a true (19,38) bf16 train step needs 24GB for
           params alone and cannot fit one 16GB chip).

vs_baseline: BASELINE.json targets >=2 img/s on v5e-8 => 0.25 img/s/chip.
"""

import argparse
import dataclasses
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD = os.path.join(REPO, "bench_last_good.json")
EXPERIMENTS = os.path.join(REPO, "bench_experiments.jsonl")
BASELINE_PER_CHIP = 0.25  # 2 img/s on 8 chips (BASELINE.json)

# Supervisor wall-clock budget (VERDICT r4 #1: the all-phases run outgrew the
# driver's outer timeout and rc=124 lost the round's headline). Phases that
# would start after the deadline are skipped; everything measured so far has
# already been emitted incrementally.
DEADLINE_S = float(os.environ.get("GIE_BENCH_DEADLINE_S", str(22 * 60)))
# Reuse measured TPU rows from bench_experiments.jsonl fresher than this
# instead of re-measuring them in the driver run (VERDICT r4 #1).
CACHE_MAX_AGE_H = float(os.environ.get("GIE_BENCH_CACHE_MAX_AGE_H", "24"))


def _log_experiment(kind: str, **fields) -> None:
    """Append-only perf evidence (VERDICT r3 #6): every successful measured
    row is persisted the moment it completes, so a wedged tunnel or a killed
    child can cost wall-time but never the rows already measured. `plat`
    disambiguates the CPU-smoke rows the test suite appends from real chip
    evidence."""
    try:
        import jax

        plat = jax.devices()[0].platform
    except Exception:
        plat = "?"
    rec = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "kind": kind,
           "plat": plat, **fields}
    try:
        with open(EXPERIMENTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError as e:
        log(f"experiment log write failed: {e}")

# child phases write partial results here as rows complete, so a phase
# timeout (e.g. a pathological Mosaic compile on the last variant) loses
# only the unfinished row, not the phase (the supervisor reads whatever
# the killed child managed to write)
_PARTIAL_OUT: str | None = None


class _SkipRow(Exception):
    """Row not selected by --only (per-row subprocess isolation)."""


def _write_partial(res: dict) -> None:
    if _PARTIAL_OUT:
        tmp = _PARTIAL_OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(res, f)
        os.replace(tmp, _PARTIAL_OUT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# supervisor
# --------------------------------------------------------------------------

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256), jnp.bfloat16);"
    "print(float(jnp.sum((x @ x).astype(jnp.float32))))"
)


def _tpu_probe(
    timeout_s: float = float(os.environ.get("GIE_BENCH_PROBE_TIMEOUT", "150")),
) -> bool:
    """One tiny-matmul probe in a throwaway subprocess (a wedged tunnel hangs
    TPU ops forever; killing the subprocess leaves this process clean)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
        )
        if r.returncode == 0:
            return True
        log(f"probe rc={r.returncode}: ...{r.stderr.decode()[-300:]}")
    except subprocess.TimeoutExpired:
        log(f"probe timed out after {timeout_s:.0f}s (tunnel wedged or cold)")
    return False


def wait_for_tpu(max_wait_s: float = 720.0) -> bool:
    """Bounded health-check loop (CLAUDE.md wedge playbook: nothing local
    fixes a wedged tunnel; poll until it returns or the budget runs out)."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        if _tpu_probe():
            log(f"TPU healthy (probe attempt {attempt}, "
                f"{time.time() - t0:.0f}s elapsed)")
            return True
        if time.time() - t0 >= max_wait_s:
            log(f"TPU unavailable after {attempt} probes / "
                f"{time.time() - t0:.0f}s")
            return False
        time.sleep(30)


def _run_phase_subprocess(phase: str, timeout_s: float,
                          only: str | None = None,
                          env_extra: dict | None = None) -> dict | None:
    tag = phase if only is None else f"{phase}_{only}"
    out_file = os.path.join(REPO, f".bench_{tag}.json")
    if os.path.exists(out_file):
        os.remove(out_file)
    cmd = [sys.executable, os.path.abspath(__file__),
           "--phase", phase, "--out", out_file]
    if only is not None:
        cmd += ["--only", only]
    env = None
    if env_extra:
        env = {**os.environ, **env_extra}
    log(f"--- phase {tag} (timeout {timeout_s / 60:.0f} min) ---")
    try:
        r = subprocess.run(cmd, timeout=timeout_s, stdout=subprocess.DEVNULL,
                           env=env)
        if r.returncode != 0:
            log(f"phase {tag} rc={r.returncode}")
    except subprocess.TimeoutExpired:
        log(f"phase {tag} timed out after {timeout_s:.0f}s")
    if os.path.exists(out_file):
        with open(out_file) as f:
            res = json.load(f)
        os.remove(out_file)
        return res
    return None


# --------------------------------------------------------------------------
# cached-row reuse (VERDICT r4 #1): every measured row already lives in the
# append-only bench_experiments.jsonl; the driver run reuses fresh TPU rows
# instead of re-measuring them, so the default run fits the driver timeout.
# --------------------------------------------------------------------------

def _load_fresh_rows(max_age_h: float = CACHE_MAX_AGE_H,
                     now: float | None = None,
                     path: str = EXPERIMENTS) -> dict:
    """Most recent plat=tpu row per kind/label, no older than max_age_h.
    Later lines win (the file is append-only chronological). Rows predating
    the `plat` tag are ignored — every load-bearing row has been re-measured
    with the tag since."""
    out = {"scan_measured": {}, "scan_rows": {}, "e2e": {}, "train": {},
           "newest_ts": None, "oldest_used_ts": None}
    try:
        with open(path) as f:
            lines = f.read().splitlines()
    except OSError:
        return out
    if now is None:
        now = time.time()
    used_ts = []
    for ln in lines:
        try:
            r = json.loads(ln)
        except ValueError:
            continue
        if r.get("plat") != "tpu":
            continue
        try:
            ts = time.mktime(time.strptime(r["ts"], "%Y-%m-%d %H:%M:%S"))
        except (KeyError, ValueError):
            continue
        if now - ts > max_age_h * 3600.0:
            continue
        k = r.get("kind")
        hit = True
        if k == "scan_full_depth" and "s_per_img" in r:
            out["scan_measured"][r.get("label", "?")] = r["s_per_img"]
        elif k == "scan_depth":
            out["scan_rows"][(r["nd"], r["ns"])] = r["t_min_s"]
        elif k == "e2e_vlm":
            if r.get("seq", 0) >= 2048:  # worst-case long-chat bucket row
                key = "t_vlm_long_s"
            else:
                key = "t_vlm_w8a8_s" if r.get("quant") == "w8a8" else "t_vlm_s"
            out["e2e"][key] = r["t_s"]
        elif k == "e2e_t5":
            out["e2e"]["t_t5_s"] = r["t_s"]
        elif k == "e2e_vae" and r.get("dtype") == "bfloat16":
            out["e2e"]["t_vae_enc_s"] = r["t_enc_s"]
            out["e2e"]["t_vae_dec_s"] = r["t_dec_s"]
        elif k == "train_step":
            out["train"]["train_step_ms_depth"] = round(r["t_s"] * 1000, 1)
            out["train"]["train_depth"] = [r["nd"], r["ns"]]
            out["train"]["train_mfu_3x"] = r.get("mfu_3x")
            out["train"]["train_mfu_4x_remat"] = r.get("mfu_4x")
        elif k == "train_step_dots":
            out["train"]["train_step_ms_dots_policy"] = round(
                r["t_s"] * 1000, 1)
        elif k == "train_full_mlp2":
            key = f"train_full_mlp2_ms_{r['quant']}_{r['hw']}sq"
            out["train"][key] = round(r["t_s"] * 1000, 1)
            out["train"]["train_full_mlp2_ms_measured"] = round(
                r["t_s"] * 1000, 1)
            for mk in ("mfu_3x", "mfu_4x"):
                if mk in r:
                    out["train"][f"train_full_mlp2_{mk}"] = r[mk]
        elif k == "train_fwd_bwd":
            out["train"].setdefault("fwd_bwd_rows", [])
            out["train"]["fwd_bwd_rows"] = [
                row for row in out["train"]["fwd_bwd_rows"]
                if row[:2] != [r["nd"], r["ns"]]
            ] + [[r["nd"], r["ns"], round(r["t_s"], 4)]]
        else:
            hit = False
        if hit:
            used_ts.append(ts)
            out["newest_ts"] = r["ts"]
    if used_ts:
        out["oldest_used_ts"] = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.localtime(min(used_ts)))
    return out


def _fit_rows(rows, on_tpu: bool, full_dual: int, full_single: int):
    """Least-squares fit t = a*nd + b*ns + c -> full-depth extrapolation.
    Drops stall-poisoned rows on TPU (per-unit cost >1.5x the best row's;
    measured spread across clean depths is <1%)."""
    if len(rows) < 2:
        return float("nan"), None
    if on_tpu:
        unit = [t / (nd + 2 * ns) for nd, ns, t in rows]
        keep = [r for r, u in zip(rows, unit) if u <= 1.5 * min(unit)]
        if len(keep) >= 2 and len(keep) < len(rows):
            log(f"fit: dropped {len(rows) - len(keep)} stall-poisoned row(s)")
            rows = keep
    A = np.array([[nd, ns, 1.0] for nd, ns, _ in rows])
    y = np.array([t for _, _, t in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    t_full = float(coef @ [full_dual, full_single, 1.0])
    return 1.0 / t_full, coef


def _run_train_rows(needed: set[str], time_left) -> dict | None:
    """Each train row group in its own subprocess (same OOM-poisoning
    rationale as _run_e2e_rows; round-4 evidence: one dots-row OOM killed
    every full_mlp2 row sharing its process). The 1024^2 int4 row only runs
    if the 512^2 one fit; int8@512 only if int4@512 did (it is strictly
    bigger). `needed` filters to rows the fresh-row cache does not already
    cover; `time_left()` is the supervisor deadline."""
    merged: dict = {}
    rows = [("ladder", 18), ("dots", 10), ("full_int4_512", 12)]
    for row, mins in rows:
        if row not in needed:
            continue
        if time_left() < 120:
            log(f"train row {row} skipped: supervisor deadline")
            return merged or None
        res = _run_phase_subprocess(
            "train", timeout_s=min(mins * 60, time_left()), only=row)
        if res:
            merged.update(res)
        elif not wait_for_tpu(max_wait_s=min(300.0, time_left())):
            log(f"train row {row} failed and tunnel is down; stopping")
            return merged or None
    if "train_full_mlp2_ms_int4_512sq" in merged:
        for row, mins in (("full_int4_1024", 15), ("full_int8_512", 12)):
            if row not in needed or time_left() < 120:
                continue
            res = _run_phase_subprocess(
                "train", timeout_s=min(mins * 60, time_left()), only=row)
            if res:
                merged.update(res)
            elif not wait_for_tpu(max_wait_s=min(300.0, time_left())):
                break
    return merged or None


def _run_e2e_rows(needed: set[str], time_left) -> dict | None:
    """Each e2e row in its OWN subprocess: a TPU RESOURCE_EXHAUSTED poisons
    the axon client for the rest of the process (after one OOM even tiny
    allocations fail), so in-process row isolation is not enough — a row
    failure must not share a process with the rows after it."""
    merged: dict = {}
    for row, mins in (("vlm", 12), ("vlm_w8a8", 10), ("vlm_long", 10),
                      ("t5", 10), ("vae", 10)):
        if row not in needed:
            continue
        if time_left() < 120:
            log(f"e2e row {row} skipped: supervisor deadline")
            break
        res = _run_phase_subprocess(
            "e2e", timeout_s=min(mins * 60, time_left()), only=row)
        if res:
            merged.update({k: v for k, v in res.items() if v is not None})
        elif not wait_for_tpu(max_wait_s=min(300.0, time_left())):
            log(f"e2e row {row} failed and tunnel is down; stopping e2e rows")
            break
    return merged or None


_LAST_EMITTED: str | None = None


def _emit(payload: dict, save: bool = True, detail: dict | None = None) -> None:
    """Print the 4-key headline JSON line NOW and persist it. Called after
    every phase (VERDICT r4 #1: one all-at-end emit lost the round to the
    driver's outer timeout) — the driver parses the LAST JSON line on stdout,
    so each call supersedes the previous. Identical consecutive payloads are
    not re-printed."""
    global _LAST_EMITTED
    line = json.dumps(payload)
    if line == _LAST_EMITTED:
        return
    if save:
        blob = {"saved_at": time.strftime("%Y-%m-%d %H:%M:%S"), **payload}
        if detail:
            # raw phase dicts (depth rows, medians, per-component e2e times)
            # for round-over-round auditability (ADVICE r3 #2); never emitted
            # on stdout — the driver contract stays one 4-key JSON line
            blob["detail"] = detail
        with open(LAST_GOOD, "w") as f:
            json.dump(blob, f, indent=1)
    print(line, flush=True)
    _LAST_EMITTED = line


def _assemble(scan: dict, e2e: dict | None, train: dict | None) -> dict:
    measured = scan.get("measured", {})
    fit = scan.get("fit_img_s")
    if measured:
        label, t_best = min(measured.items(), key=lambda kv: kv[1])
        value = 1.0 / t_best
        extra = ""
        if e2e and "t_other_s" in e2e:
            t_e2e = t_best + e2e["t_other_s"]
            # label exactly what the composed number includes (a failed or
            # pre-T5-cached e2e dict must not claim T5 was measured)
            comps = "VLM+MLP2" + ("+T5" if e2e.get("t_t5_s") else "") + "+VAE"
            extra = (f"; end-to-end edit incl. {comps} {t_e2e:.2f}s "
                     f"= {1.0 / t_e2e:.4f} img/s")
            log(f"e2e: scan {t_best:.2f}s + other {e2e['t_other_s']:.2f}s "
                f"= {t_e2e:.2f}s/edit ({1.0 / t_e2e:.4f} img/s/chip)")
            if "t_other_worst_s" in e2e:
                # VERDICT r4 #7: bracket — longest chat-bucket prefill +
                # true-CFG (2x scan) + T5 + VAE
                t_worst = 2.0 * t_best + e2e["t_other_worst_s"]
                extra += (f"; worst case (long-chat prefill + true-CFG 2x "
                          f"scan) {t_worst:.2f}s = {1.0 / t_worst:.4f} img/s")
        fit_note = (
            f"bf16 extrapolation {fit:.4f}" if fit == fit else "fit rows lost"
        )
        metric = (
            f"1024x1024 28-step FLUX-Kontext edits/sec/chip "
            f"(MEASURED full 19+38-block model, {label} serving mode; "
            f"{fit_note}{extra})"
        )
    else:
        value = fit
        metric = ("1024x1024 28-step FLUX-Kontext edits/sec/chip "
                  "(full-depth extrapolated from depth-scaled timings)")
    if train:
        log("train: " + json.dumps(train))
    return {
        "metric": metric,
        "value": round(value, 5),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / BASELINE_PER_CHIP, 4),
    }


def _usable_scan(res: dict | None) -> bool:
    """A scan result is emit-worthy only with a measured row or a finite fit.
    (A child killed after a single depth row leaves a partial with
    measured={} and a NaN fit — emitting NaN to the driver would be worse
    than falling back to the cache.)"""
    if not res:
        return False
    fit = res.get("fit_img_s")
    return bool(res.get("measured")) or (isinstance(fit, float) and fit == fit)


def _scan_from_cache(cache: dict) -> dict | None:
    """Assemble a scan-phase result dict from fresh experiment-log rows."""
    if not cache["scan_measured"] and len(cache["scan_rows"]) < 2:
        return None
    rows = [[nd, ns, t] for (nd, ns), t in sorted(cache["scan_rows"].items())]
    fit = _fit_rows(rows, True, 19, 38)[0] if len(rows) >= 2 else float("nan")
    return {"rows": rows, "rows_median": [],
            "measured": dict(cache["scan_measured"]), "fit_img_s": fit}


def _emit_last_good_fallback(reason: str) -> int:
    if os.path.exists(LAST_GOOD):
        with open(LAST_GOOD) as f:
            cached = json.load(f)
        saved_at = cached.pop("saved_at", "unknown time")
        cached.pop("detail", None)
        cached["metric"] = f"[CACHED {saved_at}; {reason}] " + cached["metric"]
        log(f"emitting cached result from {saved_at}")
        _emit(cached, save=False)
        return 0
    log("TPU unavailable and no cached result exists.")
    log("Diagnostics: the axon tunnel is down/wedged; every TPU op hangs.")
    log("Re-run once `python -c \"import jax; jax.numpy.ones(1)+1\"` "
        "completes; compiles are cached in .jax_cache so the re-run is "
        "fast.")
    return 1


def supervise() -> int:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat.startswith("cpu"):
        # forced-CPU smoke (tests, tunnel-down debugging): run in-process
        scan = phase_scan()
        _emit(_assemble(scan, None, None), save=False)
        return 0

    t_start = time.monotonic()

    def time_left() -> float:
        return DEADLINE_S - (time.monotonic() - t_start)

    cache = _load_fresh_rows()
    state: dict = {"scan": _scan_from_cache(cache),
                   "e2e": dict(cache["e2e"]) or None,
                   "train": dict(cache["train"]) or None}
    if state["e2e"]:
        _compose_e2e(state["e2e"])
    prov = {k: "cached" for k in ("scan", "e2e", "train") if state[k]}

    def emit_state(save: bool = True) -> bool:
        if not _usable_scan(state["scan"]):
            return False
        payload = _assemble(state["scan"], state["e2e"], state["train"])
        cached_parts = sorted(k for k, v in prov.items() if v != "fresh")
        if cached_parts:
            payload["metric"] += (
                f" [{'/'.join(cached_parts)} rows reused from "
                f"bench_experiments.jsonl, oldest {cache['oldest_used_ts']}, "
                f"<{CACHE_MAX_AGE_H:.0f}h]")
        _emit(payload, save=save, detail={**state, "prov": prov})
        return True

    def _on_term(signum, _frame):
        # the driver's outer timeout must never cost evidence: flush the
        # current best state (usually already printed) and exit cleanly
        log(f"signal {signum}: emitting current state and exiting")
        emit_state()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    max_wait = float(os.environ.get("GIE_BENCH_MAX_WAIT", "720"))
    if not wait_for_tpu(max_wait_s=max_wait):
        if state["scan"] is not None and state["scan"].get("measured"):
            for k in prov:
                prov[k] = "cached"
            payload = _assemble(state["scan"], state["e2e"], state["train"])
            payload["metric"] = (
                f"[CACHED rows ≤{CACHE_MAX_AGE_H:.0f}h from "
                f"bench_experiments.jsonl; TPU tunnel unavailable at bench "
                f"time] " + payload["metric"])
            _emit(payload, save=False)
            return 0
        return _emit_last_good_fallback("TPU tunnel unavailable at bench time")

    # seed emission: the best already-measured headline reaches stdout
    # before the first phase can hang or outlive the driver timeout
    emit_state()

    # --- scan: always re-measure the headline (W8A8 + fused ln/mod/quant
    # prologue — the measured-best mode); skip rows the cache already covers
    # (plain W8A8, int8 variant, depth ladder) to fit the deadline ---
    env_extra = {"GIE_BENCH_VARIANTS": "w8a8_fq"}
    if "W8A8" not in cache["scan_measured"]:
        env_extra["GIE_BENCH_VARIANTS"] += ",w8a8"
    if "int8 weight-only" not in cache["scan_measured"]:
        env_extra["GIE_BENCH_VARIANTS"] += ",int8"
    if len(cache["scan_rows"]) >= 2:
        env_extra["GIE_BENCH_ONLY_FULL"] = "1"
    scan_budget = max(300.0, min(45 * 60, time_left() - 60))
    scan = _run_phase_subprocess("scan", timeout_s=scan_budget,
                                 env_extra=env_extra)
    if (not _usable_scan(scan) and time_left() > 420
            and wait_for_tpu(max_wait_s=min(480.0, time_left() - 360))):
        scan = _run_phase_subprocess(
            "scan", timeout_s=max(300.0, min(45 * 60, time_left() - 60)),
            env_extra=env_extra)
    if _usable_scan(scan):
        merged_measured = {**(state["scan"] or {}).get("measured", {}),
                           **scan.get("measured", {})}
        rows = scan.get("rows") or (state["scan"] or {}).get("rows") or []
        fit = scan.get("fit_img_s")
        if not (isinstance(fit, float) and fit == fit) and len(rows) >= 2:
            fit = _fit_rows(rows, True, 19, 38)[0]
        state["scan"] = {"rows": rows,
                         "rows_median": scan.get("rows_median", []),
                         "measured": merged_measured, "fit_img_s": fit}
        prov["scan"] = "fresh"
        emit_state()
    elif state["scan"] is None:
        log("scan phase failed and no fresh cached rows exist")
        return _emit_last_good_fallback("TPU bench run failed this round")

    # --- e2e: only the rows the cache does not cover ---
    e2e_have = state["e2e"] or {}
    needed = {row for row, keys in (
        ("vlm", ("t_vlm_s",)), ("vlm_w8a8", ("t_vlm_w8a8_s",)),
        ("vlm_long", ("t_vlm_long_s",)),
        ("t5", ("t_t5_s",)), ("vae", ("t_vae_enc_s", "t_vae_dec_s")),
    ) if any(e2e_have.get(k) is None for k in keys)}
    if needed and time_left() > 120:
        fresh = _run_e2e_rows(needed, time_left)
        if fresh:
            state["e2e"] = {**e2e_have, **fresh}
            _compose_e2e(state["e2e"])
            prov["e2e"] = "mixed" if len(needed) < 5 or e2e_have else "fresh"
            if "t_other_s" in state["e2e"]:
                _log_experiment("e2e_composed",
                                t_other_s=round(state["e2e"]["t_other_s"], 4))
            emit_state()
    elif needed:
        log(f"e2e rows {sorted(needed)} skipped: supervisor deadline")

    # --- train: only the row groups the cache does not cover ---
    train_have = state["train"] or {}
    tneeded = set()
    if len(train_have.get("fwd_bwd_rows", [])) < 2 or \
            "train_step_ms_depth" not in train_have:
        tneeded.add("ladder")
    if "train_step_ms_dots_policy" not in train_have:
        tneeded.add("dots")
    for grp, key in (("full_int4_512", "train_full_mlp2_ms_int4_512sq"),
                     ("full_int4_1024", "train_full_mlp2_ms_int4_1024sq"),
                     ("full_int8_512", "train_full_mlp2_ms_int8_512sq")):
        if key not in train_have:
            tneeded.add(grp)
    if tneeded and time_left() > 120:
        fresh = _run_train_rows(tneeded, time_left)
        if fresh:
            state["train"] = {**train_have, **fresh}
            prov["train"] = "mixed" if train_have else "fresh"
            emit_state()
    elif tneeded:
        log(f"train rows {sorted(tneeded)} skipped: supervisor deadline")

    if emit_state():
        log(f"done in {time.monotonic() - t_start:.0f}s "
            f"(deadline {DEADLINE_S:.0f}s)")
        return 0
    return _emit_last_good_fallback("TPU bench run failed this round")


# --------------------------------------------------------------------------
# shared child helpers
# --------------------------------------------------------------------------

def _child_jax():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env, enable_compile_cache
    apply_platform_env()
    import jax

    enable_compile_cache(os.path.join(REPO, ".jax_cache"))
    return jax


def _shape_params(jax, jnp, abstract, fill=0.01):
    return jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, fill, s.dtype), abstract
    )


def _sync(jnp, x) -> float:
    # On the axon tunnel block_until_ready() is a no-op; fetching a scalar
    # is the only reliable sync.
    return float(jnp.sum(x.astype(jnp.float32)))


def _int8_shape_params(jax, jnp, abstract, qkey="q", min_elems=1 << 22,
                       float_dtype=None):
    """Shape-only param tree with big kernels as quantized subtrees
    (building a bf16 tree first would OOM the chip at full depth).
    qkey "q"/"q_w8a8" = int8; "q4" = packed int4 with 64-group scales.
    float_dtype (e.g. bf16): dtype for the non-quantized float leaves —
    serving loads checkpoints bf16, so an fp32 eval_shape tree (the VLM
    init has no dtype arg) would overstate HBM by ~1.2GB (the 152k-row
    embedding table alone is 2.18GB fp32 vs 1.09GB bf16)."""
    from gpt_image_edit_tpu.utils.synthetic import quantized_shape_params

    return quantized_shape_params(
        abstract, qkey=qkey, min_elems=min_elems, float_dtype=float_dtype
    )


def _train_full_mlp2(jax, jnp, optax, h, s_txt, reps=3, qkey="q"):
    """TRUE full-depth (19,38) measured train step for the only_tune_mlp2
    stage: quantized-frozen FLUX (weight-only int8 or int4, bf16 compute —
    the model_config.quantize_frozen semantics), remat, grads through all 57
    blocks into a trainable MLP2 projector (3584 -> 12288 -> 4096 SiLU,
    ref:univa/models/qwen2p5vl MLP2). Returns seconds/step.

    qkey="q4" (5.9GB frozen tree) is the fit-on-16GB mode: int8 (11.8GB) +
    remat activations at 1024^2 OOMed in round 3 (BENCH_r03)."""
    from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux
    from gpt_image_edit_tpu.ops.packing import latent_image_ids

    b = 1
    s_tgt = (h // 2) * (h // 2)
    cfg = dataclasses.replace(
        FluxConfig(), num_layers=19, num_single_layers=38,
        remat=True, rope_dtype="bfloat16",
    )
    abstract = jax.eval_shape(
        lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0)
    )
    frozen = _int8_shape_params(jax, jnp, abstract, qkey=qkey)

    # trainable MLP2 (bf16 master-in-bench; the real trainer keeps fp32)
    mlp2 = {
        "in": {"kernel": jnp.full((3584, 12288), 0.01, jnp.bfloat16),
               "bias": jnp.zeros((12288,), jnp.bfloat16)},
        "out": {"kernel": jnp.full((12288, cfg.joint_attention_dim), 0.01,
                                   jnp.bfloat16),
                "bias": jnp.zeros((cfg.joint_attention_dim,), jnp.bfloat16)},
    }
    hidden = jnp.full((b, s_txt, 3584), 0.01, jnp.bfloat16)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
    target = jnp.zeros((b, 2 * s_tgt, cfg.out_channels), jnp.float32)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(
        rng.standard_normal((b, 2 * s_tgt, cfg.in_channels)), jnp.bfloat16
    )
    ids = jnp.concatenate(
        [latent_image_ids(h // 2, h // 2, 0), latent_image_ids(h // 2, h // 2, 1)],
        axis=0,
    )

    def loss_fn(m, lat):
        e = jnp.dot(hidden, m["in"]["kernel"]) + m["in"]["bias"]
        e = jax.nn.silu(e)
        embeds = jnp.dot(e, m["out"]["kernel"]) + m["out"]["bias"]
        pred = apply_flux(
            frozen, cfg, hidden_states=lat, encoder_hidden_states=embeds,
            pooled_projections=pooled,
            timestep=jnp.full((b,), 0.5, jnp.float32),
            img_ids=ids, guidance=jnp.full((b,), 3.5, jnp.float32),
        )
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    tx = optax.adamw(1e-6)
    opt = tx.init(mlp2)

    @jax.jit
    def step(m, opt, lat):
        loss, grads = jax.value_and_grad(loss_fn)(m, lat)
        updates, opt = tx.update(grads, opt, m)
        return optax.apply_updates(m, updates), opt, loss

    mlp2, opt, loss = step(mlp2, opt, latents)
    float(loss)
    # per-rep scalar-fetch sync + min/median (VERDICT r4 #6: one consistent
    # statistic across all rows; a transient tunnel stall inflates one rep,
    # not the row)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mlp2, opt, loss = step(mlp2, opt, latents)
        float(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[0], times[len(times) // 2]


# --------------------------------------------------------------------------
# phase: scan (headline)
# --------------------------------------------------------------------------

def phase_scan() -> dict:
    jax = _child_jax()
    import jax.numpy as jnp

    from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
    from gpt_image_edit_tpu.ops.packing import latent_image_ids
    from gpt_image_edit_tpu.pipeline.kontext import denoise_scan
    from gpt_image_edit_tpu.pipeline.scheduler import flow_sigmas

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}, platform: {dev.platform}")

    steps = 28
    b = 1
    if on_tpu:
        h = w = 128          # 1024x1024 pixels -> 128x128 latents -> 4096 tokens
        s_txt = 512
        depths = [(2, 4), (4, 8), (6, 12)]
        reps = 3
        if os.environ.get("GIE_BENCH_ONLY_FULL"):
            depths = []      # focused run: full-depth measured variants only
    else:  # CPU smoke fallback (driver normally runs on TPU)
        h = w = 16
        s_txt = 32
        depths = [(1, 2), (2, 4)]
        reps = 1

    def build(nd, ns):
        # serving config: bf16 rope (measured -8..-11% step time, +0.17% err)
        cfg = dataclasses.replace(
            FluxConfig(), num_layers=nd, num_single_layers=ns,
            rope_dtype="bfloat16",
        )
        if not on_tpu:
            cfg = dataclasses.replace(
                FluxConfig.tiny(), num_layers=nd, num_single_layers=ns
            )
        abstract = jax.eval_shape(
            lambda k: init_flux(k, cfg, dtype=jnp.bfloat16), jax.random.key(0)
        )
        return cfg, _shape_params(jax, jnp, abstract)

    def run_once(cfg, params, batch=b):
        s_tgt = (h // 2) * (w // 2)
        latents = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (batch, s_tgt, cfg.in_channels)
            ),
            jnp.bfloat16,
        )
        image_latents = latents * 0.5
        ids = jnp.concatenate(
            [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)],
            axis=0,
        )
        embeds = jnp.zeros((batch, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
        pooled = jnp.zeros((batch, cfg.pooled_projection_dim), jnp.bfloat16)
        sigmas = jnp.asarray(flow_sigmas(steps, s_tgt))
        guidance = jnp.full((batch,), 3.5, jnp.float32)

        def call(lat):
            return denoise_scan(
                params,
                cfg,
                latents=lat,
                image_latents=image_latents,
                latent_ids=ids,
                prompt_embeds=embeds,
                pooled_embeds=pooled,
                sigmas=sigmas,
                guidance=guidance,
                num_steps=steps,
            )

        lat = call(latents)
        _sync(jnp, lat)  # compile + warm + sync
        # per-rep sync + MIN: the axon tunnel occasionally stalls for tens
        # of seconds mid-stream, which inflated a chained-mean measurement
        # ~20x on one row (round 3); min-of-3 discards transient stalls and
        # the per-rep scalar fetch costs ~ms against multi-second scans
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            lat = call(lat)
            _sync(jnp, lat)
            ts.append(time.perf_counter() - t0)
        # min = stall-robust headline; median recorded alongside (ADVICE r3
        # #4: keep a consistent statistic for round-over-round comparison)
        return min(ts), float(np.median(ts))

    full_dual, full_single = (19, 38) if on_tpu else (2, 3)

    def _fit(rows):
        return _fit_rows(rows, on_tpu, full_dual, full_single)

    rows = []
    rows_median = []
    measured = {}  # label -> seconds PER IMAGE (scan time / batch) at TRUE full depth

    # Ground-truth cross-check: the TRUE full-depth (19+38) model fits one
    # chip with int8 quantized weights (11.8GB). Two variants:
    #   weight-only (bf16 compute) — validates the bf16 extrapolation;
    #   W8A8 (int8 MXU matmuls)   — the fast serving mode (~22% faster).
    # Constructed shape-only (a bf16 tree first would OOM the chip).
    def _full_depth_int8(qkey, attn_impl="auto", scan_blocks=True,
                         scan_unroll=1, batch=1, fuse_mod_quant="off"):
        cfg = dataclasses.replace(
            FluxConfig(), num_layers=19, num_single_layers=38,
            rope_dtype="bfloat16", attention_impl=attn_impl,
            scan_blocks=scan_blocks, scan_unroll=scan_unroll,
            fuse_mod_quant=fuse_mod_quant,
        )
        abstract = jax.eval_shape(
            lambda key: init_flux(key, cfg, jnp.bfloat16), jax.random.key(0)
        )
        params = _int8_shape_params(jax, jnp, abstract, qkey=qkey)
        t, t_med = run_once(cfg, params, batch=batch)
        del params
        return t, t_med

    # Full-depth measured variants FIRST (the headline): a 45-min phase
    # budget eaten by fresh depth-row compiles must cost the fit rows, not
    # the measured full-model numbers (round 4: the W8A8 row was lost to
    # exactly that).
    if on_tpu:
        # (a W8A8 + int8-QK^T attention row was measured 835.4 ms/step vs
        # plain W8A8's 827.5 on v5e — the extra q/k quantization pass costs
        # more than the int8 QK dot saves; `--quantize w8a8-qk8` stays
        # opt-in for hardware with a wider int8:bf16 MXU ratio)
        variants = [
            # headline mode FIRST: a phase timeout must never lose the best
            # measured row (fused prologue A/B: 22.464s vs 22.801s plain)
            ("q_w8a8", "W8A8 fused-quant", "auto", True, 1, 1),
            ("q_w8a8", "W8A8", "auto", True, 1, 1),
            ("q", "int8 weight-only", "auto", True, 1, 1),
        ]
        if os.environ.get("GIE_BENCH_VARIANTS"):
            # focused run: explicit variant list, e.g.
            # GIE_BENCH_VARIANTS=w8a8,w8a8_u2,w8a8_b4 (with GIE_BENCH_ONLY_FULL=1
            # this measures just the named full-depth modes)
            variants = []
            for tok in os.environ["GIE_BENCH_VARIANTS"].split(","):
                tok = tok.strip()
                if tok == "int8":
                    variants.append(("q", "int8 weight-only", "auto", True, 1, 1))
                elif tok == "int4":
                    variants.append(("q4", "int4 weight-only", "auto", True, 1, 1))
                elif tok == "w8a8":
                    variants.append(("q_w8a8", "W8A8", "auto", True, 1, 1))
                elif tok == "w8a8_fq":
                    # fused Pallas ln+modulate+quant prologue (VERDICT r4
                    # #2): the env is read at trace time inside the model
                    variants.append(
                        ("q_w8a8", "W8A8 fused-quant", "auto", True, 1, 1)
                    )
                elif tok == "w8a8_unrolled":
                    variants.append(
                        ("q_w8a8", "W8A8 unrolled", "auto", False, 1, 1)
                    )
                elif tok.startswith("w8a8_u") and tok[len("w8a8_u"):].isdigit():
                    k = int(tok[len("w8a8_u"):])
                    variants.append(
                        ("q_w8a8", f"W8A8 scan-u{k}", "auto", True, k, 1)
                    )
                elif tok.startswith("w8a8_b") and tok[len("w8a8_b"):].isdigit():
                    # coalesced-serving throughput: one scan at batch=N
                    # (serve/scheduler + runtime.edit_batch is the prod path)
                    nb = int(tok[len("w8a8_b"):])
                    variants.append(
                        ("q_w8a8", f"W8A8 batch-{nb}", "auto", True, 1, nb)
                    )
                else:
                    log(f"unknown GIE_BENCH_VARIANTS token {tok!r} (skipped)")
        if os.environ.get("GIE_BENCH_UNROLLED"):
            # unrolled-blocks experiment (first compile is expensive; opt-in
            # until it has beaten the scan path on a real chip)
            variants.append(("q_w8a8", "W8A8 unrolled", "auto", False, 1, 1))
        u = int(os.environ.get("GIE_BENCH_UNROLL", "0"))
        if u > 1:
            # partial scan unroll: k block bodies per scan iteration so XLA
            # can overlap the next layer's param slice/dequant with compute
            # (the `copy` bucket was 40-48% of the W8A8 step profile)
            variants.append(("q_w8a8", f"W8A8 scan-u{u}", "auto", True, u, 1))
        for qkey, label, attn, scan_b, scan_u, nb in variants:
            # fused-quant rides the config (part of denoise_scan's static
            # compile key — an env flip alone would reuse the old program)
            fq = "on" if label == "W8A8 fused-quant" else "off"
            try:
                t, t_med = _full_depth_int8(qkey, attn, scan_blocks=scan_b,
                                            scan_unroll=scan_u, batch=nb,
                                            fuse_mod_quant=fq)
                # measured[] stores SECONDS PER IMAGE so _assemble's 1/t and
                # min() comparisons stay correct across batch sizes
                t_img = t / nb
                log(f"{label} full depth (19 dual, 38 single): {t:.3f}s / "
                    f"{steps}-step scan ({t / steps * 1000:.1f} ms/step; "
                    f"median {t_med:.3f}s) "
                    f"=> {nb / t:.4f} img/s/chip MEASURED full model"
                    + (f" (batch {nb}: {t_img:.3f}s/img)" if nb > 1 else ""))
                measured[label] = t_img
                _log_experiment("scan_full_depth", label=label, qkey=qkey,
                                batch=nb, scan_unroll=scan_u,
                                scan_blocks=scan_b, t_min_s=round(t, 4),
                                t_median_s=round(t_med, 4),
                                s_per_img=round(t_img, 4), steps=steps)
                _write_partial({"rows": rows, "rows_median": rows_median,
                                "measured": measured, "fit_img_s": _fit(rows)[0]})
            except Exception as e:
                log(f"{label} full-depth run failed ({type(e).__name__}): {str(e)[:200]}")


    for nd, ns in depths:
        try:
            cfg, params = build(nd, ns)
            t, t_med = run_once(cfg, params)
        except Exception as e:
            log(f"depth ({nd},{ns}) row failed ({type(e).__name__}): "
                f"{str(e)[:200]}")
            continue
        log(f"depth ({nd:2d} dual, {ns:2d} single): {t:.3f}s / {steps}-step scan "
            f"({t / steps * 1000:.1f} ms/step; median {t_med:.3f}s)")
        rows.append((nd, ns, t))
        rows_median.append((nd, ns, t_med))
        del params
        _log_experiment("scan_depth", nd=nd, ns=ns, t_min_s=round(t, 4),
                        t_median_s=round(t_med, 4), steps=steps)
        _write_partial({"rows": rows, "rows_median": rows_median,
                        "measured": measured, "fit_img_s": _fit(rows)[0]})

    imgs_per_sec, coef = _fit(rows)
    if coef is not None:
        t_full = float(coef @ [full_dual, full_single, 1.0])
        log(f"fit: dual {coef[0]*1000:.1f} ms, single {coef[1]*1000:.1f} ms, "
            f"const {coef[2]*1000:.1f} ms -> full ({full_dual}+{full_single}) "
            f"scan {t_full:.2f}s => {imgs_per_sec:.4f} img/s/chip")
    elif not measured:
        raise RuntimeError("no scan measurements completed")

    return {
        "rows": rows,
        "rows_median": rows_median,
        "measured": measured,
        "fit_img_s": imgs_per_sec,
    }


# --------------------------------------------------------------------------
# phase: e2e (the serving path around the scan)
# --------------------------------------------------------------------------

def _compose_e2e(res: dict) -> None:
    """t_other_s = sum of the components measured SO FAR (the compose is
    only meaningful once the VLM and VAE rows exist; T5 folds in when
    measured)."""
    # best VLM timing over whichever rows exist (ADVICE r4 #3: an OOMed int8
    # row must not block composing with a valid W8A8 timing)
    vlm_rows = [res.get("t_vlm_s"), res.get("t_vlm_w8a8_s")]
    t_vlm_best = min((t for t in vlm_rows if t is not None), default=None)
    if (t_vlm_best is not None and res.get("t_vae_enc_s") is not None
            and res.get("t_vae_dec_s") is not None):
        res["t_other_s"] = (t_vlm_best + (res.get("t_t5_s") or 0.0)
                            + res["t_vae_enc_s"] + res["t_vae_dec_s"])
    # worst-case bracket (VERDICT r4 #7): longest chat-bucket VLM prefill,
    # plus a SECOND T5 encode for the true-CFG negative branch
    # (ref:univa/serve/cli.py:231-243 builds negative embeds separately; the
    # short text-only negative VLM pass is folded into the T5 double-count).
    # The true-CFG 2x scan factor is applied on the scan side in _assemble.
    t_vlm_long = res.get("t_vlm_long_s")
    if (t_vlm_long is not None and res.get("t_vae_enc_s") is not None
            and res.get("t_vae_dec_s") is not None):
        res["t_other_worst_s"] = (t_vlm_long + 2.0 * (res.get("t_t5_s") or 0.0)
                                  + res["t_vae_enc_s"] + res["t_vae_dec_s"])


def phase_e2e(only: str | None = None) -> dict:
    """Time the non-denoiser components of one edit at serving shapes
    (ref:univa/serve/cli.py:199-254): int8 7B VLM denoise_embeds forward
    (ViT 448^2 view -> LM trunk -> MLP2) and bf16 VAE encode + decode at
    1024^2. The composed edit latency is reported by the supervisor.

    VERDICT r3 #1 hardening: every row is individually guarded, the result
    dict (incl. the composed t_other_s over whatever components completed)
    is re-written after EVERY row, and an OOM-ed row clears compile caches
    + collects before the next row so one failure cannot zero the phase.

    `only` ("vlm" | "vlm_w8a8" | "t5" | "vae"): run a single row — the
    supervisor uses this to give each row its OWN subprocess, because a
    TPU RESOURCE_EXHAUSTED poisons the axon client for the remainder of
    the process (observed: after one OOM even eval_shape constants fail),
    while a fresh process gets a clean HBM arena."""
    jax = _child_jax()
    import gc

    import jax.numpy as jnp

    from gpt_image_edit_tpu.models.qwen2p5vl import language, vision
    from gpt_image_edit_tpu.models.qwen2p5vl.config import Qwen2p5VLConfig
    from gpt_image_edit_tpu.models.qwen2p5vl.model import (
        denoise_projector, init as init_vlm,
    )
    from gpt_image_edit_tpu.models.qwen2p5vl.vision import vision_precompute

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}, platform: {dev.platform}")

    res: dict = {"t_vlm_s": None, "t_vlm_w8a8_s": None, "t_vlm_long_s": None,
                 "t_t5_s": None, "t_vae_enc_s": None, "t_vae_dec_s": None}

    def _compose() -> None:
        # written after every row so a late OOM keeps the rest
        _compose_e2e(res)
        _write_partial(res)

    def _row_failed(name: str, e: Exception) -> None:
        log(f"{name} row failed ({type(e).__name__}): {str(e)[:300]}")
        # an OOM leaves executables + temp buffers behind; drop compile
        # caches (re-compiles hit the persistent .jax_cache on disk) and
        # collect so the next row starts from a clean HBM high-water mark
        jax.clear_caches()
        gc.collect()

    cfg = Qwen2p5VLConfig() if on_tpu else Qwen2p5VLConfig.tiny()
    b = 1
    # serving prompt: chat template + one reference image at the 448^2 ViT
    # view (ref max_pixels=200704) -> 256 merged tokens + text, bucketed
    seq = 1024 if on_tpu else 64
    grid = (1, 32, 32) if on_tpu else (1, 4, 4)  # 448^2 / 14^2 patches

    abstract = jax.eval_shape(lambda k: init_vlm(k, cfg), jax.random.key(0))

    aux = vision_precompute(np.asarray([grid]), cfg.vision)
    n_patches = grid[0] * grid[1] * grid[2]
    patch_dim = (cfg.vision.in_channels * cfg.vision.temporal_patch_size
                 * cfg.vision.patch_size ** 2)
    pixels = jnp.full((n_patches, patch_dim), 0.01, jnp.bfloat16)
    n_img_tokens = n_patches // (cfg.vision.spatial_merge_size ** 2)

    def _emb_pos(s):
        x = jnp.full((b, s, cfg.text.hidden_size), 0.01, jnp.bfloat16)
        p = jnp.broadcast_to(
            jnp.arange(s)[None, None], (3, b, s)
        ).astype(jnp.int32)
        return x, p

    x_emb, pos = _emb_pos(seq)

    @jax.jit
    def vlm_fwd(p, pixels, x, pos_):
        img = vision.apply(p["visual"], cfg.vision, pixels, aux)
        # scatter cost is negligible; time the real compute path: ViT +
        # trunk + projector. (The scatter needs token ids; shape-only
        # params make argmax-routing meaningless here.)
        x = jax.lax.dynamic_update_slice(
            x, img[None, :, :].astype(x.dtype), (0, 0, 0)
        )
        hidden = language.trunk(p["lm"], cfg.text, x, pos_)
        return denoise_projector(p["projector"], hidden)

    @jax.jit
    def chain(p, pixels, x, pos_, prev):
        # data-depend each rep on the previous output so the tunnel cannot
        # reorder/elide repetitions (block_until_ready is a no-op on axon)
        x = (x * (1.0 + 0.0 * jnp.mean(prev.astype(jnp.float32)))).astype(x.dtype)
        return vlm_fwd(p, pixels, x, pos_)

    reps = 8

    def _time_vlm(qkey: str, seq_len: int | None = None) -> float:
        x_e, pos_ = (x_emb, pos) if seq_len is None else _emb_pos(seq_len)
        params = None
        try:
            if on_tpu:
                # build int8 payloads DIRECTLY at serving dtypes: the bf16 8B
                # tree is ~16GB (materialize-then-quantize OOMed) and the
                # fp32 eval_shape dtypes overstate the float leaves ~2x
                params = _int8_shape_params(jax, jnp, abstract, qkey=qkey,
                                            min_elems=1 << 20,
                                            float_dtype=jnp.bfloat16)
            else:
                params = _shape_params(jax, jnp, abstract)
            out = vlm_fwd(params, pixels, x_e, pos_)
            _sync(jnp, out)
            o = chain(params, pixels, x_e, pos_, out)
            _sync(jnp, o)  # compile chain
            # per-rep sync + min-of-reps: a transient tunnel stall inflates
            # one rep, not the row (same hardening as the scan phase)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                o = chain(params, pixels, x_e, pos_, o)
                _sync(jnp, o)
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            del params  # free ~7GB HBM even on failure (more rows follow)

    if only in (None, "vlm"):
        try:
            t_vlm = _time_vlm("q")
            res["t_vlm_s"] = t_vlm
            log(f"VLM denoise_embeds fwd (seq {seq} + ViT {n_patches} patches, "
                f"{'int8' if on_tpu else 'bf16 tiny'}): {t_vlm * 1000:.1f} ms, "
                f"{n_img_tokens} image tokens")
            _log_experiment("e2e_vlm", quant="int8" if on_tpu else "bf16-tiny",
                            seq=seq, t_s=round(t_vlm, 4))
        except Exception as e:
            _row_failed("int8 VLM", e)
        _compose()

    # W8A8 VLM comparison row: the prefill is one big matmul-bound forward,
    # the same shape class the FLUX W8A8 mode sped up ~25% — measure whether
    # --quantize_vlm w8a8 pays on the e2e path too
    if on_tpu and only in (None, "vlm_w8a8"):
        try:
            t_w8a8 = _time_vlm("q_w8a8")
            res["t_vlm_w8a8_s"] = t_w8a8
            base = res["t_vlm_s"]
            cmp = (f" ({(base / t_w8a8 - 1) * 100:+.1f}% vs weight-only)"
                   if base else "")
            log(f"VLM denoise_embeds fwd W8A8: {t_w8a8 * 1000:.1f} ms{cmp}")
            _log_experiment("e2e_vlm", quant="w8a8", seq=seq,
                            t_s=round(t_w8a8, 4))
        except Exception as e:
            _row_failed("W8A8 VLM", e)
        _compose()

    # worst-case bracket row (VERDICT r4 #7): the longest chat-history
    # bucket the server pads to — multi-turn context + history image tokens
    # (ref:univa/serve/cli.py:210-254 keeps prior images in the prompt)
    if only in (None, "vlm_long"):
        long_seq = 2048 if on_tpu else 96
        try:
            t_long = _time_vlm("q_w8a8" if on_tpu else "q", seq_len=long_seq)
            res["t_vlm_long_s"] = t_long
            log(f"VLM prefill LONG bucket (seq {long_seq}, w8a8): "
                f"{t_long * 1000:.1f} ms")
            _log_experiment("e2e_vlm", quant="w8a8" if on_tpu else "bf16-tiny",
                            seq=long_seq, t_s=round(t_long, 4))
        except Exception as e:
            _row_failed("long-bucket VLM", e)
        _compose()

    # T5-XXL encoder forward (the reference's default serving path concats
    # T5 embeds after the VLM ones, ref:univa/serve/cli.py joint_with_t5;
    # 4.7B encoder, int8 weight-only, prompt bucket 512)
    if only in (None, "t5"):
        _e2e_t5_row(jax, jnp, on_tpu, b, res, reps, _row_failed)
        _compose()

    if only in (None, "vae"):
        _e2e_vae_rows(jax, jnp, on_tpu, b, res, _row_failed)
        _compose()

    if "t_other_s" in res:
        log(f"non-scan serving components total: {res['t_other_s']:.3f}s "
            f"(VLM {min(x for x in (res['t_vlm_s'], res['t_vlm_w8a8_s']) if x):.3f}"
            f" + T5 {res['t_t5_s'] or 0:.3f} + VAE enc {res['t_vae_enc_s']:.3f}"
            f" + VAE dec {res['t_vae_dec_s']:.3f})")
        _log_experiment("e2e_composed", t_other_s=round(res["t_other_s"], 4))
    elif only is None:
        log("e2e compose unavailable (VLM or VAE row missing); partial rows "
            "reported")
    return res


def _e2e_t5_row(jax, jnp, on_tpu, b, res, reps, _row_failed):
    tparams = None
    try:
        from gpt_image_edit_tpu.models import t5 as t5_model

        tcfg = t5_model.T5Config() if on_tpu else t5_model.T5Config.tiny()
        tabs = jax.eval_shape(
            lambda k: t5_model.init(k, tcfg), jax.random.key(0)
        )
        if on_tpu:
            tparams = _int8_shape_params(jax, jnp, tabs, qkey="q",
                                         min_elems=1 << 20,
                                         float_dtype=jnp.bfloat16)
        else:
            tparams = _shape_params(jax, jnp, tabs)
        t5_seq = 512 if on_tpu else 32
        ids = jnp.zeros((b, t5_seq), jnp.int32)

        t5_fwd = jax.jit(lambda p, i: t5_model.apply(p, tcfg, i))
        o = t5_fwd(tparams, ids)
        _sync(jnp, o)
        t_t5 = float("inf")  # per-rep sync + min (stall-robust)
        for _ in range(reps):
            ids = (ids + jnp.mean(o.astype(jnp.float32)).astype(jnp.int32)
                   * 0)  # data-depend reps (axon: block_until_ready no-op)
            t0 = time.perf_counter()
            o = t5_fwd(tparams, ids)
            _sync(jnp, o)
            t_t5 = min(t_t5, time.perf_counter() - t0)
        res["t_t5_s"] = t_t5
        log(f"T5-XXL encode (seq {t5_seq}, "
            f"{'int8' if on_tpu else 'tiny'}): {t_t5 * 1000:.1f} ms")
        _log_experiment("e2e_t5", seq=t5_seq, t_s=round(t_t5, 4))
    except Exception as e:
        _row_failed("T5", e)
    finally:
        del tparams  # free the 4.7GB int8 tree before the 1024^2 VAE rows


def _e2e_vae_rows(jax, jnp, on_tpu, b, res, _row_failed):
    from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
    from gpt_image_edit_tpu.models.vae import model as vae_model

    vcfg = VaeConfig() if on_tpu else VaeConfig.tiny()
    vabs = jax.eval_shape(lambda k: init_vae(k, vcfg), jax.random.key(0))
    hw = 1024 if on_tpu else 32

    def time_vae(dtype):
        vparams = _shape_params(jax, jnp, vabs)
        vparams = jax.tree_util.tree_map(lambda x: x.astype(dtype), vparams)
        img = jnp.full((b, hw, hw, 3), 0.1, dtype)

        enc = jax.jit(lambda p, x: vae_model.encode_to_scaled_latents(p, vcfg, x))
        z = enc(vparams, img)
        _sync(jnp, z)
        t_enc = float("inf")  # per-rep sync + min (stall-robust)
        for _ in range(3):
            t0 = time.perf_counter()
            z = enc(vparams, img)
            _sync(jnp, z)
            t_enc = min(t_enc, time.perf_counter() - t0)

        dec = jax.jit(lambda p, z: vae_model.decode_from_scaled_latents(p, vcfg, z))
        y = dec(vparams, z)
        _sync(jnp, y)
        t_dec = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = dec(vparams, z)
            _sync(jnp, y)
            t_dec = min(t_dec, time.perf_counter() - t0)
        log(f"VAE {jnp.dtype(dtype).name} {hw}x{hw}: encode {t_enc * 1000:.1f} ms, "
            f"decode {t_dec * 1000:.1f} ms")
        return t_enc, t_dec

    # serving default is bf16 (ref:univa/serve/cli.py:39,67 serves the whole
    # pipeline bf16); fp32 logged for comparison on TPU
    try:
        t_enc, t_dec = time_vae(jnp.bfloat16)
        res["t_vae_enc_s"], res["t_vae_dec_s"] = t_enc, t_dec
        _log_experiment("e2e_vae", dtype="bfloat16", hw=hw,
                        t_enc_s=round(t_enc, 4), t_dec_s=round(t_dec, 4))
    except Exception as e:
        _row_failed("bf16 VAE", e)
    if on_tpu:
        try:
            time_vae(jnp.float32)
        except Exception as e:
            log(f"fp32 VAE comparison row failed ({type(e).__name__})")


# --------------------------------------------------------------------------
# phase: train
# --------------------------------------------------------------------------

def phase_train(only: str | None = None) -> dict:
    """Measured fwd+bwd(+AdamW) train-step times at full FLUX width, 1024^2
    bs=1, remat. A true (19,38) bf16 train step cannot fit one 16GB chip
    (24GB of bf16 params alone); the full-depth number is grounded by a
    TWO-DEPTH measured fit of the fwd+bwd cost (fwd+bwd only fits (4,8))
    plus the measured optimizer-update cost scaled linearly in params.

    `only` ("ladder" | "dots" | "full_int4_512" | "full_int4_1024" |
    "full_int8_512"): run one row group — the supervisor gives each its own
    subprocess because one RESOURCE_EXHAUSTED poisons the axon client for
    the rest of the process (round-4 evidence: the dots-row OOM took every
    full_mlp2 row down with it despite clear_caches+gc)."""
    jax = _child_jax()
    import jax.numpy as jnp
    import optax

    from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux
    from gpt_image_edit_tpu.ops.packing import latent_image_ids

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}, platform: {dev.platform}")

    b = 1
    h = w = 128 if on_tpu else 16
    s_txt = 512 if on_tpu else 32
    s_tgt = (h // 2) * (w // 2)

    def build(nd, ns, remat_policy="nothing"):
        cfg = dataclasses.replace(
            FluxConfig() if on_tpu else FluxConfig.tiny(),
            num_layers=nd, num_single_layers=ns, remat=True,
            remat_policy=remat_policy,
        )
        abstract = jax.eval_shape(
            lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0)
        )
        return cfg, _shape_params(jax, jnp, abstract)

    rng = np.random.default_rng(0)
    latents = jnp.asarray(
        rng.standard_normal((b, 2 * s_tgt, 64 if on_tpu else 16)), jnp.bfloat16
    )
    ids = jnp.concatenate(
        [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)],
        axis=0,
    )

    def make_loss(cfg):
        embeds = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
        pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
        target = jnp.zeros((b, 2 * s_tgt, cfg.out_channels), jnp.float32)

        def loss_fn(p, lat):
            pred = apply_flux(
                p, cfg, hidden_states=lat, encoder_hidden_states=embeds,
                pooled_projections=pooled,
                timestep=jnp.full((b,), 0.5, jnp.float32),
                img_ids=ids, guidance=jnp.full((b,), 3.5, jnp.float32),
            )
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        return loss_fn

    # --- fwd+bwd-only at two depths for the full-depth fit. Ladder
    # re-sized to what actually fits (VERDICT r3 #3): round 3's (4,8) and
    # even the (3,6) retry OOMed — (2,6) is ~7.3GB params+grads and safe;
    # (2,5) is the fallback second point ---
    fb_rows = []
    fb_depths = [(2, 4), (2, 6), (2, 5)] if on_tpu else [(1, 2), (2, 3)]
    reps = 3
    run_ladder = only in (None, "ladder")
    for nd, ns in fb_depths if run_ladder else []:
        if len(fb_rows) >= 2:
            break
        params = grads = None
        try:
            cfg, params = build(nd, ns)
            loss_fn = make_loss(cfg)

            @jax.jit
            def grad_step(p, lat):
                loss, grads = jax.value_and_grad(loss_fn)(p, lat)
                return loss, grads

            loss, grads = grad_step(params, latents)
            float(loss)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                loss, grads = grad_step(params, latents)
            float(loss)
            dt = (time.perf_counter() - t0) / reps
            n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        except Exception as e:
            log(f"fwd+bwd depth ({nd},{ns}) failed ({type(e).__name__}): "
                f"{str(e)[:200]}")
            # an OOM-ed row must not poison the rest of the phase (round 3:
            # the (4,8) OOM took every later row down with it): drop the big
            # locals, clear compile caches (executables pin buffers; the
            # persistent .jax_cache on disk makes recompiles cheap) and
            # collect so the next build() starts from a clean high-water mark
            params = grads = None
            jax.clear_caches()
            import gc

            gc.collect()
            continue
        fb_rows.append((nd, ns, dt, n_params))
        log(f"fwd+bwd depth ({nd},{ns}): {dt * 1000:.1f} ms "
            f"({n_params / 1e9:.2f}B params)")
        del params, grads
        _log_experiment("train_fwd_bwd", nd=nd, ns=ns, t_s=round(dt, 4),
                        n_params=n_params)
        _write_partial({"fwd_bwd_rows":
                        [[d, s, round(t, 4)] for d, s, t, _ in fb_rows]})

    # --- full train step (grad + AdamW) at the smallest depth ---
    # guarded: a failure here (e.g. OOM after a poisoned row) must still
    # return the measured fwd+bwd rows instead of crashing the phase
    try:
        if not run_ladder:
            raise _SkipRow
        nd, ns = fb_depths[0]
        cfg, params = build(nd, ns)
        loss_fn = make_loss(cfg)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        tx = optax.adamw(1e-6)
        opt = tx.init(params)

        @jax.jit
        def train_step(p, opt, lat):
            loss, grads = jax.value_and_grad(loss_fn)(p, lat)
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, loss

        params, opt, loss = train_step(params, opt, latents)
        float(loss)
        tms = []  # per-rep sync + min/median (VERDICT r4 #6)
        for _ in range(reps):
            t0 = time.perf_counter()
            params, opt, loss = train_step(params, opt, latents)
            float(loss)
            tms.append(time.perf_counter() - t0)
        tms.sort()
        dt_step, dt_step_med = tms[0], tms[len(tms) // 2]
    except _SkipRow:
        dt_step = None
        params = opt = None
    except Exception as e:
        log(f"full train-step row failed ({type(e).__name__}): {str(e)[:200]}")
        jax.clear_caches()
        # the full_mlp2 ladder below can still land its row even when this
        # one OOMed; fall through with dt_step unset
        dt_step = None
        params = opt = None
        import gc

        gc.collect()

    res: dict = {"fwd_bwd_rows":
                 [[d, s, round(t, 4)] for d, s, t, _ in fb_rows]}
    tokens = 2 * s_tgt + s_txt
    if dt_step is not None:
        # MFU under both accountings (VERDICT r2 #3): 4x counts the remat
        # re-forward as useful FLOPs; standard practice is 3x (fwd + 2x bwd).
        mfu4 = 4 * 2 * n_params * tokens * b / dt_step / 197e12
        mfu3 = 3 * 2 * n_params * tokens * b / dt_step / 197e12
        log(f"train step depth ({nd},{ns}): {dt_step * 1000:.1f} ms, "
            f"MFU {mfu3:.3f} (3x standard) / {mfu4:.3f} (4x remat-credited)")
        res.update({
            "train_step_ms_depth": round(dt_step * 1000, 1),
            "train_depth": [nd, ns],
            "train_mfu_3x": round(mfu3, 3),
            "train_mfu_4x_remat": round(mfu4, 3),
            "params_bench": n_params,
        })
        _log_experiment("train_step", nd=nd, ns=ns, t_s=round(dt_step, 4),
                        t_median_s=round(dt_step_med, 4),
                        mfu_3x=round(mfu3, 3), mfu_4x=round(mfu4, 3))
        _write_partial(res)

    # remat_policy="dots" comparison: saves matmul outputs so the bwd
    # recompute is elementwise-only (spends spare HBM on MFU); self-contained
    # so the supervisor can run it in its own subprocess (--only dots)
    dt_dots = None
    if on_tpu and (dt_step is not None or only == "dots"):
        try:
            if dt_step is not None:
                del params, opt
            nd_d, ns_d = fb_depths[0]
            cfg_d, params_d = build(nd_d, ns_d, remat_policy="dots")
            loss_d = make_loss(cfg_d)
            n_params_d = sum(
                x.size for x in jax.tree_util.tree_leaves(params_d)
            )
            tx_d = optax.adamw(1e-6)
            opt_d = tx_d.init(params_d)

            @jax.jit
            def train_step_d(p, opt, lat):
                loss, grads = jax.value_and_grad(loss_d)(p, lat)
                updates, opt = tx_d.update(grads, opt, p)
                return optax.apply_updates(p, updates), opt, loss

            params_d, opt_d, loss = train_step_d(params_d, opt_d, latents)
            float(loss)
            tms_d = []  # per-rep sync + min/median (VERDICT r4 #6)
            for _ in range(reps):
                t0 = time.perf_counter()
                params_d, opt_d, loss = train_step_d(params_d, opt_d, latents)
                float(loss)
                tms_d.append(time.perf_counter() - t0)
            tms_d.sort()
            dt_dots, dt_dots_med = tms_d[0], tms_d[len(tms_d) // 2]
            mfu3_d = 3 * 2 * n_params_d * tokens * b / dt_dots / 197e12
            mfu4_d = 4 * 2 * n_params_d * tokens * b / dt_dots / 197e12
            log(f"train step depth ({nd_d},{ns_d}) remat_policy=dots: "
                f"{dt_dots * 1000:.1f} ms (median {dt_dots_med * 1000:.1f}), "
                f"MFU {mfu3_d:.3f} (3x)")
            del params_d, opt_d
            res["train_step_ms_dots_policy"] = round(dt_dots * 1000, 1)
            _log_experiment("train_step_dots", nd=nd_d, ns=ns_d,
                            t_s=round(dt_dots, 4),
                            t_median_s=round(dt_dots_med, 4),
                            mfu_3x=round(mfu3_d, 3), mfu_4x=round(mfu4_d, 3))
            _write_partial(res)
        except Exception as e:
            log(f"dots-policy train row failed ({type(e).__name__}): "
                f"{str(e)[:200]}")
            jax.clear_caches()

    # full-depth estimate: measured two-depth fwd+bwd fit + measured
    # optimizer-update cost scaled linearly in param count
    if len(fb_rows) >= 2 and dt_step is not None:
        (d1, s1, t1, p1), (d2, s2, t2, p2) = fb_rows
        # per-block-unit cost from the two points (dual counts 1, single 0.5x
        # width but same token count -> use the same (nd + 2ns)-unit scale as
        # the inference fit)
        u1, u2 = d1 + 2 * s1, d2 + 2 * s2
        slope = (t2 - t1) / (u2 - u1)
        const = t1 - slope * u1
        t_fb_full = slope * (19 + 2 * 38) + const
        t_opt = dt_step - t1  # optimizer+update overhead at fb_depths[0]
        full_params = 11.9e9 if on_tpu else p1 * (19 + 2 * 38) / u1
        t_full = t_fb_full + t_opt * (full_params / p1)
        log(f"full-depth (19,38) estimate: fwd+bwd {t_fb_full:.2f}s (two-depth "
            f"fit) + optimizer {t_opt * full_params / p1:.2f}s (measured at "
            f"({d1},{s1}), scaled by params) = {t_full:.2f}s/step")
        log("note: a true (19,38) bf16 single-chip train step is infeasible on "
            "16GB HBM (24GB params alone); multi-chip training is validated by "
            "dryrun_multichip and tests/test_trainer_integration.py")
        res["train_step_s_full_depth_est"] = round(t_full, 2)
        _write_partial(res)
    elif dt_step is not None:
        log("two-depth fit unavailable; reporting the single train-step row")

    # --- TRUE full-depth measured train row: the only_tune_mlp2 stage ---
    # (a real reference training mode, ref:univa/train/train_denoiser.py
    # get_trainable_params only_tune_mlp2). FLUX frozen quantized weight-only
    # (the repo's model_config.quantize_frozen semantics) + remat; grads flow
    # through the FULL 57-block stack into the MLP2 projector. This measures
    # real full-depth fwd+bwd wall time on one chip — the number the
    # two-depth fit above extrapolates. int8 (11.8GB) OOMed at both 1024^2
    # and 512^2 in round 3; the int4 tree (5.9GB) is the fit-on-16GB ladder.
    if on_tpu:
        full_tokens = None
        mlp2_rows = [(64, "q4"), (128, "q4"), (64, "q")]
        if only is not None:
            mlp2_rows = {
                "full_int4_512": [(64, "q4")],
                "full_int4_1024": [(128, "q4")],
                "full_int8_512": [(64, "q")],
            }.get(only, [])
        for hh, qk in mlp2_rows:
            label = {"q": "int8", "q4": "int4"}[qk]
            try:
                t_full_mlp2, t_full_med = _train_full_mlp2(
                    jax, jnp, optax, hh, s_txt, qkey=qk
                )
                full_tokens = 2 * (hh // 2) ** 2 + s_txt
                # MFU under the SAME two accountings as the depth rows
                # (VERDICT r4 #6: mfu_2p5x retired) — 3x = standard
                # fwd+2x-bwd multiplier, 4x = remat-credited. For this
                # stage the true FLOP cost is ~2.5-3x fwd (activation-grad
                # bwd only, no weight grads), so these are multiplier
                # conventions for cross-row comparison, not utilization
                # claims (noted in the experiment row).
                flops_fwd = 2 * 11.9e9 * full_tokens
                mfu3f = 3 * flops_fwd / t_full_mlp2 / 197e12
                mfu4f = 4 * flops_fwd / t_full_mlp2 / 197e12
                log(f"train_full: only_tune_mlp2 (19,38) {label}-frozen FLUX "
                    f"at {hh * 8}^2: {t_full_mlp2 * 1000:.1f} ms/step "
                    f"(median {t_full_med * 1000:.1f}) MEASURED full depth "
                    f"(MFU {mfu3f:.3f} @3x / {mfu4f:.3f} @4x-remat)")
                key = f"train_full_mlp2_ms_{label}_{hh * 8}sq"
                res[key] = round(t_full_mlp2 * 1000, 1)
                res["train_full_mlp2_ms_measured"] = round(
                    t_full_mlp2 * 1000, 1
                )
                res["train_full_mlp2_mfu_3x"] = round(mfu3f, 3)
                res["train_full_mlp2_mfu_4x_remat"] = round(mfu4f, 3)
                _log_experiment("train_full_mlp2", quant=label, hw=hh * 8,
                                t_s=round(t_full_mlp2, 4),
                                t_median_s=round(t_full_med, 4),
                                mfu_3x=round(mfu3f, 3),
                                mfu_4x=round(mfu4f, 3),
                                acct="multiplier-only; true cost ~2.5-3x fwd "
                                     "(act-grad bwd, no weight grads)")
                _write_partial(res)
                if hh == 128:
                    break  # got the 1024^2 row; done
            except Exception as e:
                log(f"train_full ({label}) at {hh * 8}^2 failed "
                    f"({type(e).__name__}): {str(e)[:200]}")
                jax.clear_caches()
                import gc

                gc.collect()
                if "train_full_mlp2_ms_measured" in res and qk == "q":
                    break  # int8 retry failed but an int4 row already landed

    return res


# --------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["scan", "e2e", "train"])
    ap.add_argument("--only", help="e2e: vlm|vlm_w8a8|vlm_long|t5|vae; train: "
                    "ladder|dots|full_int4_512|full_int4_1024|full_int8_512 "
                    "— per-row subprocess isolation")
    ap.add_argument("--out")
    args = ap.parse_args()

    if args.phase is None:
        sys.exit(supervise())

    if args.out:
        global _PARTIAL_OUT
        _PARTIAL_OUT = args.out
    if args.phase == "e2e":
        res = phase_e2e(only=args.only)
    elif args.phase == "train":
        res = phase_train(only=args.only)
    else:
        res = phase_scan()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f)
    else:
        log(json.dumps(res))


if __name__ == "__main__":
    main()
