import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
carry, tick = closed_loop.rollout(sc, cfg, T_sim=500, return_tick=True)
tick_j = jax.jit(tick)
for t in range(300):
    carry, tr = tick_j(carry, t)
    if 255 <= t < 300:
        com = np.asarray(tr.com_pos); ref = np.asarray(tr.com_ref)
        print(f"t={t} err={np.abs(com[:2]-ref[:2]).max():.4f} com_y={com[1]:+.4f} ref_y={ref[1]:+.4f} "
              f"r_prim={float(tr.r_prim):.3e} lyap={float(tr.lyap_violation):.3e} "
              f"hw={np.asarray(tr.hw).round(2)} fz={np.asarray(tr.forces).reshape(8,3)[:,2].sum():.0f}", flush=True)
