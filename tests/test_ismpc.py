"""IS-MPC legacy baseline: solver + Kalman filter + LIP closed loop
(original_code/ parity at the behavior level, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.ops import ismpc, kalman
from cmpc_tpu.sim import ismpc_loop


def test_kalman_converges_on_lip():
    """Filtering a noiseless LIP trajectory must converge to the truth."""
    cfg = WalkConfig()
    km = kalman.lip_kalman_model(cfg.eta, cfg.world_time_step)
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(np.r_[0.01, 0.0, 0.0, 0.02, 0.0, 0.0,
                               cfg.h, 0.0, 0.0])
    s = kalman.KalmanState(x=jnp.zeros(9).at[6].set(cfg.h - 0.05),
                           P=jnp.eye(9))
    u = jnp.zeros(3)
    from cmpc_tpu.models.lip import lip_dynamics
    for _ in range(100):
        x_true = x_true + cfg.world_time_step * lip_dynamics(
            x_true, u, cfg.eta, cfg.g)
        s = kalman.predict(km, s, u)
        s = kalman.update(km, s, x_true)
    np.testing.assert_allclose(np.asarray(s.x), np.asarray(x_true),
                               atol=2e-3)


def test_ismpc_solver_keeps_zmp_in_box():
    """A single solve from rest: horizon ZMP must respect the moving box
    and the node-1 state must be finite/sane."""
    cfg = WalkConfig()
    icfg = ismpc.ISMPCConfig(eta=cfg.eta, g=cfg.g,
                             foot_size=cfg.foot_size,
                             delta=cfg.world_time_step, admm_iters=100)
    x0 = jnp.zeros(9).at[6].set(cfg.h)
    mc = (jnp.zeros(icfg.N), jnp.zeros(icfg.N),
          jnp.zeros(icfg.N))
    st, (com_pos, com_vel, com_acc, zmp_pos, u0) = ismpc.solve(
        ismpc.init_state(icfg), x0, *mc, icfg)
    half = cfg.foot_size / 2.0
    nX = 9 * (icfg.N + 1)
    z = np.asarray(st.z)
    X = z[:nX].reshape(icfg.N + 1, 9)
    assert np.all(np.abs(X[1:, 2]) <= half + 1e-2)   # zmp x in box
    assert np.all(np.abs(X[1:, 5]) <= half + 1e-2)   # zmp y in box
    assert np.isfinite(np.asarray(u0)).all()
    assert abs(float(com_pos[2]) - cfg.h) < 0.05


def test_ismpc_closed_loop_walks():
    """500 ticks of the LIP closed loop: bounded ZMP-CoM offset, forward
    progress, no instability (the divergent component stays bounded —
    the point of the periodic-tail stability constraint)."""
    cfg = WalkConfig(sqp_iters=1)
    _, tr = jax.jit(lambda: ismpc_loop.run(T_sim=500, cfg=cfg))()
    com = np.asarray(tr.com_pos)
    zmp = np.asarray(tr.zmp_pos)
    assert np.isfinite(com).all()
    # walks forward during steps 1-3
    assert com[-1, 0] > 0.05
    # lateral CoM stays within the support corridor
    assert np.abs(com[:, 1]).max() < 0.15
    # CoM-ZMP never diverges (unstable LIP would blow past this fast)
    assert np.abs(com[:, :2] - zmp[:, :2]).max() < 0.2
    # height holds
    assert np.abs(com[:, 2] - cfg.h).max() < 0.02
