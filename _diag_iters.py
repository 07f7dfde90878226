import sys, jax
import numpy as np
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
si, pi, cp = int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3])
soft = len(sys.argv) > 4 and sys.argv[4] == "soft"
cfg = WalkConfig(sqp_iters=si, pdip_iters=pi, condip_prox=cp, condip_soft=soft)
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
_, tr = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=400))(sc)
com, ref = np.asarray(tr.com_pos), np.asarray(tr.com_ref)
err = np.abs(com[:,:2]-ref[:,:2]).max(axis=1)
rp = np.asarray(tr.r_prim)
print(f"sqp={si} pdip={pi} prox={cp} soft={soft}: max_err={err.max():.4f} @ {err.argmax()}")
print("  err@[100,150,200,250,300,350,399]:", np.round(err[[100,150,200,250,300,350,399]],4))
print(f"  r_prim p50={np.percentile(rp,50):.4f} p90={np.percentile(rp,90):.4f} max={rp.max():.2f}")
