import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
cfg = WalkConfig(sqp_iters=6, pdip_iters=25, condip_prox=0.01)
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
sc = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), sc)
_, tr = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=400))(sc)
com, ref = np.asarray(tr.com_pos), np.asarray(tr.com_ref)
err = np.abs(com[:,:2]-ref[:,:2]).max(axis=1)
bad = np.where(err > 0.05)[0]
print("max err:", err.max(), "first>0.05:", bad[0] if len(bad) else None)
rp = np.asarray(tr.r_prim)
print("r_prim p50/p95/max:", np.percentile(rp,50), np.percentile(rp,95), rp.max())
print("err @200..400 step20:", np.round(err[200:400:20], 4))
