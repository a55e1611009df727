#!/usr/bin/env python
"""Headline benchmark: 28-step 1024x1024 FLUX-Kontext edit throughput per chip.

Measures the jitted denoise scan (text 512 + target 4096 + reference 4096
tokens, bf16, guidance-distilled single pass) at full FLUX width (24 heads x
128). A single v5e chip (16GB) cannot hold the full 19+38-block 12B model, so
depth-scaled variants are timed and the full-depth step time is obtained by a
least-squares linear fit in (num_dual, num_single) — block costs are uniform,
so the fit is exact up to noise. The extrapolated full-model rate is what the
JSON reports; raw measurements go to stderr.

vs_baseline: BASELINE.json targets >=2 img/s on v5e-8 => 0.25 img/s/chip.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    import jax

    # persistent compile cache: the 28-step scan compiles take ~6-8 min each;
    # cached across runs/rounds this drops to seconds
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
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
        params = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), abstract
        )
        return cfg, params

    def run_once(cfg, params):
        s_tgt = (h // 2) * (w // 2)
        latents = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, s_tgt, cfg.in_channels)),
            jnp.bfloat16,
        )
        image_latents = latents * 0.5
        ids = jnp.concatenate(
            [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)],
            axis=0,
        )
        embeds = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
        pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
        sigmas = jnp.asarray(flow_sigmas(steps, s_tgt))
        guidance = jnp.full((b,), 3.5, jnp.float32)

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

        # NOTE: on the axon TPU tunnel block_until_ready() is a no-op; the
        # only reliable sync is fetching a value. Chain scans (each feeding
        # the next) and fetch one scalar at the end.
        def sync(lat):
            return float(jnp.sum(lat.astype(jnp.float32)))

        lat = call(latents)
        sync(lat)  # compile + warm + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            lat = call(lat)
        sync(lat)
        return (time.perf_counter() - t0) / reps

    rows = []
    for nd, ns in depths:
        cfg, params = build(nd, ns)
        t = run_once(cfg, params)
        log(f"depth ({nd:2d} dual, {ns:2d} single): {t:.3f}s / {steps}-step scan "
            f"({t / steps * 1000:.1f} ms/step)")
        rows.append((nd, ns, t))
        del params

    # Ground-truth cross-check: the TRUE full-depth (19+38) model fits one
    # chip with int8 quantized weights (11.8GB). Two variants:
    #   weight-only (bf16 compute) — validates the bf16 extrapolation;
    #   W8A8 (int8 MXU matmuls)   — the fast serving mode (~22% faster).
    # Constructed shape-only (a bf16 tree first would OOM the chip).
    def _full_depth_int8(qkey, attn_impl="auto"):
        cfg = dataclasses.replace(
            FluxConfig(), num_layers=19, num_single_layers=38,
            rope_dtype="bfloat16", attention_impl=attn_impl,
        )
        abstract = jax.eval_shape(
            lambda key: init_flux(key, cfg, jnp.bfloat16), jax.random.key(0)
        )
        flat, _ = jax.tree_util.tree_flatten_with_path(abstract)
        leaves = []
        for kp, s in flat:
            path = "/".join(str(getattr(k, "key", k)) for k in kp)
            if path.endswith("kernel") and len(s.shape) >= 2 and np.prod(s.shape) >= 1 << 22:
                leaves.append({
                    qkey: jnp.ones(s.shape, jnp.int8),
                    "scale": jnp.full(s.shape[:-2] + (1, s.shape[-1]), 0.01, jnp.float32),
                })
            else:
                leaves.append(jnp.full(s.shape, 0.01, s.dtype))
        by_path = {
            tuple(getattr(k, "key", getattr(k, "idx", k)) for k in kp): leaf
            for (kp, _), leaf in zip(flat, leaves)
        }

        def _build_tree(node, prefix=()):
            if isinstance(node, dict):
                return {kk: _build_tree(vv, prefix + (kk,)) for kk, vv in node.items()}
            if isinstance(node, list):
                return [_build_tree(vv, prefix + (i,)) for i, vv in enumerate(node)]
            return by_path[prefix]

        params = _build_tree(abstract)
        t = run_once(cfg, params)
        del params
        return t

    measured = {}  # label -> seconds / 28-step scan (TRUE full-depth model)
    if on_tpu:
        # (a W8A8 + int8-QK^T attention row was measured 835.4 ms/step vs
        # plain W8A8's 827.5 on v5e — the extra q/k quantization pass costs
        # more than the int8 QK dot saves; `--quantize w8a8-qk8` stays
        # opt-in for hardware with a wider int8:bf16 MXU ratio, and the
        # third full-depth run also fragmented HBM enough to OOM the train
        # bench below, so only the two product rows are timed here)
        for qkey, label, attn in [
            ("q", "int8 weight-only", "auto"),
            ("q_w8a8", "W8A8", "auto"),
        ]:
            try:
                t = _full_depth_int8(qkey, attn)
                log(f"{label} full depth (19 dual, 38 single): {t:.3f}s / "
                    f"{steps}-step scan ({t / steps * 1000:.1f} ms/step) "
                    f"=> {1.0 / t:.4f} img/s/chip MEASURED full model")
                measured[label] = t
            except Exception as e:
                log(f"{label} full-depth run failed ({type(e).__name__}): {str(e)[:200]}")

    def _train_step_bench():
        """Measured fwd+bwd train-step time + MFU at full FLUX width, 1024^2
        bs=1, remat (VERDICT r1 #9). Depth-scaled like inference; reports the
        measured depth AND the full-depth linear extrapolation."""
        import optax

        nd, ns = 2, 4
        cfg = dataclasses.replace(
            FluxConfig(), num_layers=nd, num_single_layers=ns, remat=True
        )
        abstract = jax.eval_shape(
            lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0)
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), abstract
        )
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        from gpt_image_edit_tpu.models.flux import apply_flux

        s_tgt = (h // 2) * (w // 2)
        rng = np.random.default_rng(0)
        latents = jnp.asarray(
            rng.standard_normal((b, 2 * s_tgt, cfg.in_channels)), jnp.bfloat16
        )
        ids = jnp.concatenate(
            [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)],
            axis=0,
        )
        embeds = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
        pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
        target = jnp.zeros((b, 2 * s_tgt, cfg.out_channels), jnp.float32)
        tx = optax.adamw(1e-6)
        opt = tx.init(params)

        def loss_fn(p, lat):
            pred = apply_flux(
                p, cfg, hidden_states=lat, encoder_hidden_states=embeds,
                pooled_projections=pooled,
                timestep=jnp.full((b,), 0.5, jnp.float32),
                img_ids=ids, guidance=jnp.full((b,), 3.5, jnp.float32),
            )
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        @jax.jit
        def train_step(p, opt, lat):
            loss, grads = jax.value_and_grad(loss_fn)(p, lat)
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, loss

        params, opt, loss = train_step(params, opt, latents)
        float(loss)  # compile + sync
        t0 = time.perf_counter()
        reps_t = 3
        for _ in range(reps_t):
            params, opt, loss = train_step(params, opt, latents)
        float(loss)
        dt = (time.perf_counter() - t0) / reps_t
        # fwd+bwd ~= 3x forward matmul FLOPs (remat adds ~1 more forward
        # through the blocks -> use 4x for the remat path), tokens = 8704
        flops = 4 * 2 * n_params * (2 * s_tgt + s_txt) * b
        mfu = flops / dt / 197e12
        # full-depth extrapolation via per-block inference cost ratio
        t_full_est = dt * (19 + 2 * 38) / (nd + 2 * ns)
        return {
            "train_step_ms_depth_2_4": round(dt * 1000, 1),
            "train_mfu_depth_2_4": round(mfu, 3),
            "train_step_s_full_depth_est": round(t_full_est, 2),
            "params_bench": n_params,
        }

    # least-squares fit t = a*nd + b*ns + c
    A = np.array([[nd, ns, 1.0] for nd, ns, _ in rows])
    y = np.array([t for _, _, t in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    full_dual, full_single = (19, 38) if on_tpu else (2, 3)
    t_full = float(coef @ [full_dual, full_single, 1.0])
    imgs_per_sec = b / t_full
    log(f"fit: dual {coef[0]*1000:.1f} ms, single {coef[1]*1000:.1f} ms, "
        f"const {coef[2]*1000:.1f} ms -> full ({full_dual}+{full_single}) "
        f"scan {t_full:.2f}s => {imgs_per_sec:.4f} img/s/chip")

    # Train-step throughput row (fwd+bwd+optimizer, remat, full width):
    # tracked round-over-round on stderr; headline JSON stays single-line.
    if on_tpu:
        try:
            train_row = _train_step_bench()
            log("train: " + json.dumps(train_row))
        except Exception as e:
            log(f"train bench failed ({type(e).__name__}): {str(e)[:200]}")

    # Headline = the BEST MEASURED full-model serving configuration (the
    # `--quantize w8a8` product mode); the bf16 extrapolation is the
    # secondary cross-check above. Falls back to the fit when the measured
    # runs were unavailable (e.g. CPU smoke).
    baseline_per_chip = 0.25  # 2 img/s on 8 chips (BASELINE.json)
    if measured:
        label, t_best = min(measured.items(), key=lambda kv: kv[1])
        value = b / t_best
        metric = (
            f"1024x1024 28-step FLUX-Kontext edits/sec/chip "
            f"(MEASURED full 19+38-block model, {label} serving mode; "
            f"bf16 extrapolation {imgs_per_sec:.4f})"
        )
    else:
        value = imgs_per_sec
        metric = ("1024x1024 28-step FLUX-Kontext edits/sec/chip "
                  "(full-depth extrapolated from depth-scaled timings)")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 5),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / baseline_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
