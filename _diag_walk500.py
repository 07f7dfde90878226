import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
_, tr = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=500))(sc)
com, ref = np.asarray(tr.com_pos), np.asarray(tr.com_ref)
err = np.abs(com[:,:2]-ref[:,:2]).max(axis=1)
print("max err:", err.max(), "argmax:", err.argmax())
bad = np.where(err > 0.05)[0]
print("first tick >0.05:", bad[0] if len(bad) else None)
rp = np.asarray(tr.r_prim)
print("r_prim max:", rp.max(), "@", rp.argmax(), " p50:", np.percentile(rp,50))
print("err at ticks 260-280:", np.round(err[260:280], 4))
