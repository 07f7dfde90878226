import time, jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
t0 = time.time()
f = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=10))
lowered = f.lower(sc); t1 = time.time()
comp = lowered.compile(); t2 = time.time()
out = f(sc); _ = float(jnp.sum(out[1].com_pos)); t3 = time.time()
print(f"trace/lower {t1-t0:.1f}s compile {t2-t1:.1f}s run10 {t3-t2:.1f}s")
