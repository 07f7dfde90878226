import sys, jax
jax.config.update("jax_platforms", "cpu")
if "--x64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
carry, tick = closed_loop.rollout(sc, cfg, T_sim=500, return_tick=True)
tick_j = jax.jit(tick)
T = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 260
for t in range(T):
    carry, tr = tick_j(carry, t)
    if t % 10 == 0 or (t > 195 and t < 215):
        err = np.abs(np.asarray(tr.com_pos[:2]) - np.asarray(tr.com_ref[:2])).max()
        print(f"t={t:4d} err={err:.4f} r_prim={float(tr.r_prim):.3e} lyap={float(tr.lyap_violation):.2e} com={np.asarray(tr.com_pos)[:2].round(3)}", flush=True)
