import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.ops.pdip import pdip_solve, PDIPSettings
H = np.load("/tmp/qpH.npy"); g = np.load("/tmp/qpg.npy")
C = np.load("/tmp/qpC.npy"); d = np.load("/tmp/qpd.npy")
nU = 320
print("scales: |H|max", np.abs(H).max(), "|g|max", np.abs(g).max(), "|d|max", np.abs(d).max(), "dmin", d.min())
for cs_name, cs in (("none", 1.0), ("1/|g|", 1.0/max(1.0, np.abs(g).max())), ("1/|H|", 1.0/np.abs(H).max())):
    for it in (15, 25):
        res = pdip_solve(jnp.asarray(H*cs), jnp.asarray(g*cs), jnp.asarray(C), jnp.asarray(d), PDIPSettings(iters=it))
        obj = float(0.5*res.v@jnp.asarray(H)@res.v + jnp.asarray(g)@res.v)
        print(f"cs={cs_name:6s} iters={it}: r_prim={float(res.r_prim):.2e} r_dual={float(res.r_dual)/cs:.2e} mu={float(res.mu):.2e} obj={obj:.1f} smax={float(jnp.max(res.v[nU:])):.4f}")
