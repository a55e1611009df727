#!/usr/bin/env python
"""Profile ONE full-width FLUX denoise forward on the TPU and print an
op-class time breakdown (parsed from the captured xplane trace).

Usage:
  python scripts/profile_step.py [w8a8|int8|bf16] [--depth ND NS]
  python scripts/profile_step.py vlm [--vlm-quant int8|w8a8]   # 7B prefill

Used to locate the non-2x parts of the W8A8 serving path (activation quant,
scale muls, unquantized ops, bf16 attention) — VERDICT r1 item #2 — and the
VLM-prefill share of the composed e2e edit latency (r2 item #2).
"""

import dataclasses
import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    rows = []  # (name, total_ps, count)
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = defaultdict(lambda: [0, 0])
        for line in plane.lines:
            # XLA Ops line has per-op events
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
        for name, (ps, cnt) in agg.items():
            rows.append((name, ps, cnt))
    return rows


def classify(name):
    n = name.lower()
    if "custom-call" in n or "flash" in n or "pallas" in n or "tpu_custom_call" in n:
        return "flash_attention(custom-call)"
    if "convolution" in n or "dot" in n:
        return "matmul"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(elementwise/epilogue)"
    if "copy" in n:
        return "copy"
    if "convert" in n:
        return "convert"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


def _report(rows, mode):
    by_class = defaultdict(lambda: [0, 0])
    for name, ps, cnt in rows:
        c = classify(name)
        by_class[c][0] += ps
        by_class[c][1] += cnt
    total = sum(v[0] for v in by_class.values())
    print(f"\n== op-class breakdown ({mode}, total {total/1e9:.2f} ms on-device) ==")
    for c, (ps, cnt) in sorted(by_class.items(), key=lambda kv: -kv[1][0]):
        print(f"  {c:36s} {ps/1e9:9.2f} ms  {100*ps/max(total,1):5.1f}%  ({cnt} events)")
    print("\n== top 25 ops ==")
    for name, ps, cnt in sorted(rows, key=lambda r: -r[1])[:25]:
        print(f"  {ps/1e9:8.2f} ms  x{cnt:4d}  {name[:110]}")


def profile_vlm():
    """Profile the 7B VLM denoise_embeds prefill (ViT 448^2 view + trunk at
    the 1024-token serving bucket + MLP2) — the e2e path's second-largest
    component after the denoise scan."""
    import jax
    import jax.numpy as jnp

    quant = "int8"
    if "--vlm-quant" in sys.argv:
        quant = sys.argv[sys.argv.index("--vlm-quant") + 1]

    from gpt_image_edit_tpu.models.qwen2p5vl import language, vision
    from gpt_image_edit_tpu.models.qwen2p5vl.config import Qwen2p5VLConfig
    from gpt_image_edit_tpu.models.qwen2p5vl.model import (
        denoise_projector, init as init_vlm,
    )
    from gpt_image_edit_tpu.models.qwen2p5vl.vision import vision_precompute
    from gpt_image_edit_tpu.utils.quantize import quantize_params

    tiny = "--tiny" in sys.argv  # CPU smoke only
    cfg = Qwen2p5VLConfig.tiny() if tiny else Qwen2p5VLConfig()
    b, seq, grid = (1, 64, (1, 4, 4)) if tiny else (1, 1024, (1, 32, 32))
    abstract = jax.eval_shape(lambda k: init_vlm(k, cfg), jax.random.key(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), abstract
    )
    params = quantize_params(
        params, mode={"int8": "weight_only"}.get(quant, quant),
        min_size=1 << 20,
    )
    aux = vision_precompute(np.asarray([grid]), cfg.vision)
    n_patches = grid[0] * grid[1] * grid[2]
    patch_dim = (cfg.vision.in_channels * cfg.vision.temporal_patch_size
                 * cfg.vision.patch_size ** 2)
    pixels = jnp.full((n_patches, patch_dim), 0.01, jnp.bfloat16)
    x_emb = jnp.full((b, seq, cfg.text.hidden_size), 0.01, jnp.bfloat16)
    pos = jnp.broadcast_to(
        jnp.arange(seq)[None, None], (3, b, seq)
    ).astype(jnp.int32)

    @jax.jit
    def fwd(p, pixels, x):
        img = vision.apply(p["visual"], cfg.vision, pixels, aux)
        x = jax.lax.dynamic_update_slice(
            x, img[None, :, :].astype(x.dtype), (0, 0, 0)
        )
        hidden = language.trunk(p["lm"], cfg.text, x, pos)
        return denoise_projector(p["projector"], hidden)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    t0 = time.time()
    o = fwd(params, pixels, x_emb)
    sync(o)
    print(f"[vlm/{quant}] compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        x_emb = (x_emb * (1.0 + 0.0 * jnp.mean(o.astype(jnp.float32)))).astype(
            x_emb.dtype
        )
        o = fwd(params, pixels, x_emb)
    sync(o)
    print(f"[vlm/{quant}] prefill: {(time.perf_counter()-t0)/reps*1000:.1f} ms",
          flush=True)
    logdir = tempfile.mkdtemp(prefix="prof_vlm_")
    with jax.profiler.trace(logdir):
        o = fwd(params, pixels, x_emb)
        sync(o)
    _report(parse_xplane(logdir), f"vlm/{quant}")


def _profile_named(name, fwd, *args, reps=4):
    """Shared warmup + timed reps + xplane report for the aux components."""
    import jax
    import jax.numpy as jnp

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    t0 = time.time()
    o = fwd(*args)
    sync(o)
    print(f"[{name}] compile+run: {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fwd(*args)
        sync(o)
        best = min(best, time.perf_counter() - t0)
    print(f"[{name}] fwd: {best * 1000:.1f} ms (min of {reps})", flush=True)
    logdir = tempfile.mkdtemp(prefix=f"prof_{name}_")
    with jax.profiler.trace(logdir):
        o = fwd(*args)
        sync(o)
    _report(parse_xplane(logdir), name)


def profile_t5():
    """int8 T5-XXL encode at the serving bucket — the e2e row measured
    1.52s on-chip where roofline says ~0.1s; find the pathological op."""
    import jax
    import jax.numpy as jnp

    from gpt_image_edit_tpu.models import t5 as t5_model
    from gpt_image_edit_tpu.utils.synthetic import quantized_shape_params

    quant = "--bf16" not in sys.argv
    cfg = t5_model.T5Config()
    abstract = jax.eval_shape(lambda k: t5_model.init(k, cfg), jax.random.key(0))
    if quant:
        params = quantized_shape_params(
            abstract, qkey="q", min_elems=1 << 20, float_dtype=jnp.bfloat16
        )
    else:
        from gpt_image_edit_tpu.utils.synthetic import shape_params

        params = shape_params(abstract, float_dtype=jnp.bfloat16)
    ids = jnp.zeros((1, 512), jnp.int32)
    fwd = jax.jit(lambda p, i: t5_model.apply(p, cfg, i))
    _profile_named("t5" + ("_int8" if quant else "_bf16"), fwd, params, ids)


def profile_vae():
    """bf16 VAE encode/decode at 1024^2 — the e2e rows measured 0.28-3.6s
    where conv roofline says ~0.02s; find where the time goes."""
    import jax
    import jax.numpy as jnp

    from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
    from gpt_image_edit_tpu.models.vae import model as vae_model
    from gpt_image_edit_tpu.utils.synthetic import shape_params

    dt = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    vcfg = VaeConfig()
    vabs = jax.eval_shape(lambda k: init_vae(k, vcfg), jax.random.key(0))
    vparams = shape_params(vabs, float_dtype=dt)
    img = jnp.full((1, 1024, 1024, 3), 0.1, dt)
    enc = jax.jit(lambda p, x: vae_model.encode_to_scaled_latents(p, vcfg, x))
    _profile_named(f"vae_enc_{jnp.dtype(dt).name}", enc, vparams, img)
    z = enc(vparams, img)
    dec = jax.jit(lambda p, z: vae_model.decode_from_scaled_latents(p, vcfg, z))
    _profile_named(f"vae_dec_{jnp.dtype(dt).name}", dec, vparams, z)


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    mode = sys.argv[1] if len(sys.argv) > 1 else "w8a8"
    if mode == "vlm":
        return profile_vlm()
    if mode == "t5":
        return profile_t5()
    if mode == "vae":
        return profile_vae()
    nd, ns = 19, 38
    if "--depth" in sys.argv:
        i = sys.argv.index("--depth")
        nd, ns = int(sys.argv[i + 1]), int(sys.argv[i + 2])

    import jax.numpy as jnp

    from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux
    from gpt_image_edit_tpu.ops.packing import latent_image_ids

    attn_impl = {"w8a8a": "pallas_int8", "w8a8q": "pallas_qk8"}.get(mode, "auto")
    rope_dtype = "bfloat16" if "--bf16rope" in sys.argv else "float32"
    scan_unroll = 1
    if "--scan-unroll" in sys.argv:
        scan_unroll = int(sys.argv[sys.argv.index("--scan-unroll") + 1])
    cfg = dataclasses.replace(
        FluxConfig(), num_layers=nd, num_single_layers=ns,
        attention_impl=attn_impl, rope_dtype=rope_dtype,
        scan_blocks="--unrolled" not in sys.argv,
        scan_unroll=scan_unroll,
    )
    abstract = jax.eval_shape(lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0))
    flat, _ = jax.tree_util.tree_flatten_with_path(abstract)
    leaves = []
    for kp, s in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        big = path.endswith("kernel") and len(s.shape) >= 2 and np.prod(s.shape) >= 1 << 22
        if big and mode in ("w8a8", "w8a8a", "w8a8q", "int8"):
            qkey = "q" if mode == "int8" else "q_w8a8"
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

    def _build(node, prefix=()):
        if isinstance(node, dict):
            return {kk: _build(vv, prefix + (kk,)) for kk, vv in node.items()}
        if isinstance(node, list):
            return [_build(vv, prefix + (i,)) for i, vv in enumerate(node)]
        return by_path[prefix]

    params = _build(abstract)

    b = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 1
    h, w, s_txt = 128, 128, 512
    s_tgt = (h // 2) * (w // 2)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((b, 2 * s_tgt, cfg.in_channels)), jnp.bfloat16)
    ids = jnp.concatenate(
        [latent_image_ids(h // 2, w // 2, 0), latent_image_ids(h // 2, w // 2, 1)], axis=0
    )
    embeds = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)

    @jax.jit
    def step(params, lat):
        return apply_flux(
            params, cfg,
            hidden_states=lat,
            encoder_hidden_states=embeds,
            pooled_projections=pooled,
            timestep=jnp.full((b,), 0.5, jnp.float32),
            img_ids=ids,
            guidance=jnp.full((b,), 3.5, jnp.float32),
        )

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    t0 = time.time()
    out = step(params, latents)
    sync(out)
    print(f"[{mode}] compile+run: {time.time()-t0:.1f}s", flush=True)

    # timed reps (chained)
    lat = latents
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        lat = step(params, lat.astype(jnp.bfloat16))  # output shape == input shape
    sync(lat)
    dt = (time.perf_counter() - t0) / reps
    print(f"[{mode}] step time: {dt*1000:.1f} ms", flush=True)

    logdir = tempfile.mkdtemp(prefix=f"prof_{mode}_")
    with jax.profiler.trace(logdir):
        o = step(params, latents)
        sync(o)
    _report(parse_xplane(logdir), mode)


if __name__ == "__main__":
    main()
