import time, jax, jax.numpy as jnp, numpy as np
from gpt_image_edit_tpu.ops.pallas.flash_attention import flash_attention
b, s, h, d = 1, 8704, 24, 128
q = jnp.asarray(np.random.default_rng(0).standard_normal((b,s,h,d)), jnp.bfloat16)
k = jnp.asarray(np.random.default_rng(1).standard_normal((b,s,h,d)), jnp.bfloat16)
v = jnp.asarray(np.random.default_rng(2).standard_normal((b,s,h,d)), jnp.bfloat16)
f = jax.jit(jax.grad(lambda q,k,v: jnp.sum(flash_attention(q,k,v).astype(jnp.float32)), argnums=(0,1,2)))
g = f(q,k,v); float(jnp.sum(g[0][0,0,0].astype(jnp.float32)))
t0=time.perf_counter()
x = q
for i in range(3):
    g = f(x,k,v); x = g[0].astype(jnp.bfloat16)
float(jnp.sum(x[0,0,0].astype(jnp.float32)))
dt = (time.perf_counter()-t0)/3
flops = 4*h*s*s*d*3.5
print(f"fwd+bwd (MMDiT shape): {dt*1000:.1f} ms, ~{flops/dt/1e12:.0f} TFLOPs effective; dk finite: {np.isfinite(float(jnp.sum(g[1].astype(jnp.float32))))}")
