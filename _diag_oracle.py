import jax, pickle, os, sys
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
from cmpc_tpu.ops import oracle

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
T0 = 190
CK = "/tmp/carry190.pkl"
if os.path.exists(CK):
    init = pickle.load(open(CK, "rb"))
else:
    carry, _ = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=T0))(sc)
    init = {"com_pos": np.asarray(carry.plant.com_pos), "com_vel": np.asarray(carry.plant.com_vel),
            "hw": np.asarray(carry.plant.hw), "plan_pos": np.asarray(carry.plan_pos),
            "theta_hat": np.asarray(carry.theta_hat), "z": np.asarray(carry.solver.z)}
    pickle.dump(init, open(CK, "wb"))
jax.config.update("jax_enable_x64", True)
print("warmup done", flush=True)
out = oracle.rollout_oracle(sc, cfg, int(sys.argv[1]) if len(sys.argv)>1 else 80,
                            verbose_every=1, t0=T0, init=init)
err = np.abs(out["com_pos"][:, :2] - out["com_ref"][:, :2]).max(axis=1)
print("err tail:", np.round(err[-20:], 4))
print("max viol:", np.nanmax(out["max_violation"]))
np.save("/tmp/oracle_out.npy", out["com_pos"])
