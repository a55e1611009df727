# fwd+bwd train-step timing: full-width FLUX at reduced depth, 1024^2 shapes
import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux
from gpt_image_edit_tpu.ops.packing import latent_image_ids

for nd, ns, remat in [(2, 4, False), (2, 4, True)]:
    cfg = dataclasses.replace(FluxConfig(), num_layers=nd, num_single_layers=ns, remat=remat)
    abstract = jax.eval_shape(lambda k: init_flux(k, cfg, jnp.bfloat16), jax.random.key(0))
    params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 0.01, s.dtype), abstract)
    b, h, w, s_txt = 1, 128, 128, 512
    s_tgt = (h//2)*(w//2)
    lat = jnp.asarray(np.random.default_rng(0).standard_normal((b, 2*s_tgt, 64)), jnp.bfloat16)
    ids = jnp.concatenate([latent_image_ids(h//2,w//2,0), latent_image_ids(h//2,w//2,1)],0)
    embeds = jnp.zeros((b, s_txt, 4096), jnp.bfloat16)
    pooled = jnp.zeros((b, 768), jnp.bfloat16)
    tgt = jnp.asarray(np.random.default_rng(1).standard_normal((b, s_tgt, 64)), jnp.float32)

    def loss(p, x):
        pred = apply_flux(p, cfg, hidden_states=x, encoder_hidden_states=embeds,
                          pooled_projections=pooled, timestep=jnp.full((b,),0.5),
                          img_ids=ids, guidance=jnp.full((b,),1.0))
        return jnp.mean((pred[:, :s_tgt].astype(jnp.float32) - tgt) ** 2)

    f = jax.jit(jax.grad(loss))
    g = f(params, lat); float(jnp.sum(g["proj_out"]["kernel"][0].astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(3):
        g = f(params, lat)
    float(jnp.sum(g["proj_out"]["kernel"][0].astype(jnp.float32)))
    dt=(time.perf_counter()-t0)/3
    # full-model extrapolation: blocks scale linearly
    scale = (19*340+38*141)/(nd*340+ns*141)
    print(f"depth ({nd},{ns}) remat={remat}: {dt*1000:.0f} ms/step fwd+bwd -> full-depth est {dt*scale:.2f} s/step @1024^2 bs1")
