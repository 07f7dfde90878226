"""OCP and solver correctness tests.

- hand-built quadratic cost (P, q) must match autodiff of cost_value
- ADMM must match a scipy oracle on random convex QPs
- a full MPC solve on a standing scenario must satisfy its constraints
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.optimize

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp import problem
from cmpc_tpu.ops.admm import ADMMSettings, admm_solve
from cmpc_tpu.ops import sqp


def make_params(cfg, key, standing=False):
    """Random-but-plausible MPC parameters."""
    ks = jax.random.split(key, 8)
    N = cfg.N
    x0 = jnp.zeros(20)
    x0 = x0.at[cm.P_COM].set(jnp.asarray([0.0, 0.0, cfg.h]))
    x0 = x0.at[cm.POS_L].set(jnp.asarray([0.0, 0.1, 0.0]))
    x0 = x0.at[cm.POS_R].set(jnp.asarray([0.0, -0.1, 0.0]))
    if not standing:
        x0 = x0 + 0.01 * jax.random.normal(ks[0], (20,))
    com_ref = jnp.zeros((N, 9)).at[:, 2].set(cfg.h)
    if standing:
        gl = jnp.ones(N + 1)
        gr = jnp.ones(N + 1)
    else:
        gl = (jax.random.uniform(ks[1], (N + 1,)) > 0.3).astype(jnp.float32)
        gr = jnp.where(gl > 0, (jax.random.uniform(ks[2], (N + 1,)) > 0.5)
                       .astype(jnp.float32), 1.0)
    return problem.MPCParams(
        x0=x0, com_ref=com_ref,
        pos_ref_l=jnp.tile(jnp.asarray([0.0, 0.1, 0.0]), (N, 1)),
        pos_ref_r=jnp.tile(jnp.asarray([0.0, -0.1, 0.0]), (N, 1)),
        yaw_ref_l=jnp.zeros(N), yaw_ref_r=jnp.zeros(N),
        gamma_l=gl, gamma_r=gr,
        k1=jnp.asarray(4.0), k2=jnp.asarray(0.1), mass=jnp.asarray(40.05))


@pytest.mark.parametrize("seed", [0, 1])
def test_cost_quadratic_matches_autodiff(seed):
    cfg = WalkConfig()
    key = jax.random.PRNGKey(seed)
    p = make_params(cfg, key)
    z = jax.random.normal(jax.random.PRNGKey(seed + 10), (cfg.n_z,))

    P, q = problem.cost_quadratic(p, cfg)
    # cost(z) == 1/2 z'Pz + q'z + cost(0)
    c0 = problem.cost_value(jnp.zeros(cfg.n_z), p, cfg)
    lhs = problem.cost_value(z, p, cfg)
    rhs = 0.5 * z @ P @ z + q @ z + c0
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=2e-4, atol=2e-3)
    # gradient check
    g_auto = jax.grad(problem.cost_value)(z, p, cfg)
    g_hand = P @ z + q
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_hand),
                               rtol=2e-3, atol=5e-2)


def test_dynamics_rollout_shapes():
    cfg = WalkConfig()
    polygon = cm.foot_polygon()
    x = jnp.zeros(20).at[cm.P_COM].set(jnp.asarray([0.0, 0.0, cfg.h]))
    u = jnp.zeros(32)
    ref = jnp.zeros(9)
    dx = cm.centroidal_dynamics(x, ref, 1.0, 1.0, u, 4.0, 0.1, 40.0,
                                cfg.g, polygon)
    assert dx.shape == (20,)
    # gravity only: dv_z = -g
    np.testing.assert_allclose(np.asarray(dx[5]), -cfg.g, rtol=1e-6)
    # stance freezes the feet
    u2 = u.at[24:30].set(1.0).at[30:32].set(1.0)
    dx2 = cm.centroidal_dynamics(x, ref, 1.0, 1.0, u2, 4.0, 0.1, 40.0,
                                 cfg.g, polygon)
    np.testing.assert_allclose(np.asarray(dx2[12:20]), 0.0, atol=1e-12)
    dx3 = cm.centroidal_dynamics(x, ref, 0.0, 0.0, u2, 4.0, 0.1, 40.0,
                                 cfg.g, polygon)
    np.testing.assert_allclose(np.asarray(dx3[13:16]), 1.0, atol=1e-12)


def test_vertex_torque_against_manual():
    """dhw must equal sum (p_v - p_com) x f_v for a hand example."""
    polygon = cm.foot_polygon()
    x = jnp.zeros(20)
    x = x.at[cm.P_COM].set(jnp.asarray([0.1, 0.0, 0.7]))
    x = x.at[cm.POS_L].set(jnp.asarray([0.0, 0.1, 0.0]))
    x = x.at[cm.PSI_L].set(0.3)
    f = np.zeros((4, 3))
    f[:, 2] = [10.0, 20.0, 30.0, 40.0]
    u = jnp.zeros(32).at[0:12].set(jnp.asarray(f.reshape(-1)))
    dx = cm.centroidal_dynamics(x, jnp.zeros(9), 1.0, 0.0, u, 4.0, 0.1,
                                40.0, 9.81, polygon)
    # manual
    c, s = np.cos(0.3), np.sin(0.3)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    verts = (np.asarray(polygon) @ Rz.T) + np.array([0.0, 0.1, 0.0])
    tau = np.cross(verts - np.array([0.1, 0.0, 0.7]), f).sum(0)
    np.testing.assert_allclose(np.asarray(dx[cm.H_W]), tau, rtol=1e-5)


def _scipy_qp(P, q, A, l, u):
    """Oracle: solve the QP with SLSQP."""
    P, q, A, l, u = map(np.asarray, (P, q, A, l, u))

    def f(x):
        return 0.5 * x @ P @ x + q @ x

    def g(x):
        return P @ x + q

    cons = []
    for i in range(A.shape[0]):
        a, li, ui = A[i], l[i], u[i]
        if np.isfinite(li) and np.isfinite(ui) and abs(ui - li) < 1e-12:
            cons.append({"type": "eq",
                         "fun": (lambda x, a=a, li=li: a @ x - li),
                         "jac": (lambda x, a=a: a)})
        else:
            if np.isfinite(ui):
                cons.append({"type": "ineq",
                             "fun": (lambda x, a=a, ui=ui: ui - a @ x),
                             "jac": (lambda x, a=a: -a)})
            if np.isfinite(li):
                cons.append({"type": "ineq",
                             "fun": (lambda x, a=a, li=li: a @ x - li),
                             "jac": (lambda x, a=a: a)})
    res = scipy.optimize.minimize(f, np.zeros(P.shape[0]), jac=g,
                                  constraints=cons, method="SLSQP",
                                  options={"maxiter": 500, "ftol": 1e-12})
    return res.x


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_admm_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n, m = 12, 18
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    l = np.where(rng.uniform(size=m) < 0.3, rng.normal(size=m) - 2.0, -np.inf)
    u = rng.normal(size=m) + 2.0
    # make a few equality rows
    l[:3] = u[:3] = rng.normal(size=3) * 0.1

    x_ref = _scipy_qp(P, q, A, l, u)
    res = admm_solve(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                     jnp.asarray(A, jnp.float32),
                     jnp.asarray(l, jnp.float32), jnp.asarray(u, jnp.float32),
                     jnp.zeros(n), jnp.zeros(m),
                     ADMMSettings(iters=400, rho=10.0))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=2e-2)


def test_mpc_solve_standing():
    """Standing double support: the solve must produce vertical forces
    summing ~ m*g, feasible friction cones, and near-zero CoM motion."""
    cfg = WalkConfig(sqp_iters=3, admm_iters=20, admm_rho=0.1)
    p = make_params(cfg, jax.random.PRNGKey(0), standing=True)
    state = sqp.init_solver_state(cfg, p.x0, mass=40.05)
    state, info = jax.jit(
        lambda s, pp: sqp.solve_mpc(s, pp, cfg))(state, p)

    X, U = problem.split_z(state.z, cfg)
    X, U = np.asarray(X), np.asarray(U)
    # dynamics satisfied: residuals small
    assert float(info.r_prim) < 1e-2
    # total vertical force at stage 0 ~ weight
    fz = U[0, 0:24].reshape(8, 3)[:, 2].sum()
    assert abs(fz - 40.05 * 9.81) / (40.05 * 9.81) < 0.05, fz
    # CoM stays near the reference
    assert np.all(np.abs(X[:, 0:2]) < 0.02)
    assert np.all(np.abs(X[:, 2] - cfg.h) < 0.02)
    # friction cones: |fx|,|fy| <= mu fz + slack
    f = U[:, 0:24].reshape(-1, 3)
    assert np.all(np.abs(f[:, 0]) <= 0.5 * f[:, 2] + 1.0)
    assert np.all(f[:, 2] >= -1.0)
    # Lyapunov constraint approximately satisfied
    assert float(info.lyap_violation) < 1e-2


@pytest.mark.parametrize("standing", [True, False])
def test_linearize_matches_jacfwd(standing):
    """ADVICE.md (round 1): the hand-assembled constraint Jacobian
    (problem.linearize) is what sqp.solve_mpc consumes; any future edit to
    constraints() must keep them synchronized.  Checked in f64."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = WalkConfig()
        p = make_params(cfg, jax.random.PRNGKey(7), standing=standing)
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype=jnp.float64), p)
        z = 0.05 * jax.random.normal(jax.random.PRNGKey(11), (cfg.n_z,),
                                     dtype=jnp.float64)
        z = z.at[:20].add(p.x0)
        _, J_hand = problem.linearize(z, p, cfg)
        J_auto = jax.jacfwd(lambda zz: problem.constraints(zz, p, cfg))(z)
        assert float(jnp.abs(J_hand - J_auto).max()) < 1e-10
    finally:
        jax.config.update("jax_enable_x64", old)
