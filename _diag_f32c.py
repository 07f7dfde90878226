import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.ops.pdip import pdip_solve, PDIPSettings
H = jnp.asarray(np.load("/tmp/qpH.npy"), jnp.float32)
g = jnp.asarray(np.load("/tmp/qpg.npy"), jnp.float32)
C = jnp.asarray(np.load("/tmp/qpC.npy"), jnp.float32)
d = jnp.asarray(np.load("/tmp/qpd.npy"), jnp.float32)
for it in (15,):
    res_e = pdip_solve(H, g, C, d, PDIPSettings(iters=it))           # eager
    res_j = jax.jit(pdip_solve, static_argnums=4)(H, g, C, d, PDIPSettings(iters=it))
    for tag, r in (("eager", res_e), ("jit", res_j)):
        print(f"{tag}: mu={float(r.mu):.3e} r_prim={float(r.r_prim):.2e} r_dual={float(r.r_dual):.2e} smax={float(jnp.max(r.v[320:])):.4f}")
