"""Direct unit tests of the production inner-QP solver (ops/pdip.py).

VERDICT round-2 #3: the default mpc_solver="condip" path was exercised only
indirectly.  These tests pin the Mehrotra IPM against a scipy SLSQP oracle
on (a) random strictly convex inequality QPs and (b) a condensed MPC QP at
a walking-phase base point — the problem class it actually solves in
production (role of IPOPT's barrier subproblems,
centroidal_mpc_vertices.py:126-130).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.optimize

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp import condense, problem
from cmpc_tpu.ops import sqp
from cmpc_tpu.ops.pdip import PDIPSettings, pdip_solve

from tests.test_ocp_solver import make_params


def _scipy_ineq_qp(H, g, C, d):
    """Oracle: min 1/2 v'Hv + g'v  s.t.  Cv <= d."""
    H, g, C, d = map(np.asarray, (H, g, C, d))
    res = scipy.optimize.minimize(
        lambda v: 0.5 * v @ H @ v + g @ v,
        np.zeros(H.shape[0]),
        jac=lambda v: H @ v + g,
        constraints=[{"type": "ineq",
                      "fun": lambda v: d - C @ v,
                      "jac": lambda v: -C}],
        method="SLSQP", options={"maxiter": 800, "ftol": 1e-12})
    assert res.success, res.message
    return res.x


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pdip_matches_scipy_random(seed):
    rng = np.random.default_rng(seed)
    n, m = 14, 22
    L = rng.normal(size=(n, n))
    H = L @ L.T + 0.5 * np.eye(n)
    g = rng.normal(size=n)
    C = rng.normal(size=(m, n))
    # keep v=0 strictly feasible for some rows, tight for others
    d = rng.uniform(-0.5, 2.0, size=m)

    v_ref = _scipy_ineq_qp(H, g, C, d)
    res = pdip_solve(jnp.asarray(H, jnp.float32), jnp.asarray(g, jnp.float32),
                     jnp.asarray(C, jnp.float32), jnp.asarray(d, jnp.float32),
                     PDIPSettings(iters=20))
    np.testing.assert_allclose(np.asarray(res.v), v_ref, atol=5e-3)
    assert float(res.r_prim) < 1e-4
    # duals: nonnegative, complementary slackness approximately holds
    lam = np.asarray(res.lam)
    slack = d - C @ np.asarray(res.v)
    assert lam.min() >= 0.0
    assert float(np.abs(lam * slack).max()) < 1e-2


@pytest.mark.parametrize("seed", [0, 1])
def test_pdip_batched_matches_single(seed):
    """vmap over a QP batch must reproduce the single solves bitwise-ish."""
    rng = np.random.default_rng(seed)
    B, n, m = 4, 10, 16
    Hs, gs, Cs, ds = [], [], [], []
    for _ in range(B):
        L = rng.normal(size=(n, n))
        Hs.append(L @ L.T + np.eye(n))
        gs.append(rng.normal(size=n))
        Cs.append(rng.normal(size=(m, n)))
        ds.append(rng.uniform(0.1, 2.0, size=m))
    Hs, gs, Cs, ds = map(lambda a: jnp.asarray(np.stack(a), jnp.float32),
                         (Hs, gs, Cs, ds))
    batched = jax.vmap(lambda H, g, C, d: pdip_solve(
        H, g, C, d, PDIPSettings(iters=15)))(Hs, gs, Cs, ds)
    for b in range(B):
        single = pdip_solve(Hs[b], gs[b], Cs[b], ds[b],
                            PDIPSettings(iters=15))
        np.testing.assert_allclose(np.asarray(batched.v[b]),
                                   np.asarray(single.v), atol=1e-5)


def _walking_params(cfg):
    """A single-support MPC parameter set with a landing inside the horizon
    (the hard case: gamma flips mid-horizon)."""
    p = make_params(cfg, jax.random.PRNGKey(3), standing=True)
    N = cfg.N
    # left support, right lands at node 6
    gl = jnp.ones(N + 1)
    gr = jnp.concatenate([jnp.zeros(6), jnp.ones(N + 1 - 6)])
    x0 = p.x0.at[cm.V_COM].set(jnp.asarray([0.15, 0.02, 0.0]))
    x0 = x0.at[cm.POS_R].set(jnp.asarray([0.1, -0.1, 0.0]))
    pos_ref_r = jnp.tile(jnp.asarray([0.25, -0.1, 0.0]), (N, 1))
    com_ref = p.com_ref.at[:, 0].set(
        0.01 * jnp.arange(1, N + 1)).at[:, 3].set(0.15)
    return p._replace(x0=x0, gamma_l=gl, gamma_r=gr,
                      pos_ref_r=pos_ref_r, com_ref=com_ref)


def test_pdip_on_condensed_mpc_qp():
    """The IPM on a real condensed MPC QP (landing-in-horizon tick) must
    satisfy the KKT conditions.  (scipy SLSQP cannot solve this QP —
    'positive directional derivative' failures — which is exactly why the
    IPM exists; the check is therefore first-principles KKT, not an
    oracle comparison.)  f64: machine precision; f32: loose sanity bound
    (measured ~4e-2 relative stationarity from rounding alone)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = WalkConfig()
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), _walking_params(cfg))
        state = sqp.init_solver_state(cfg, p.x0, mass=40.05)
        state = sqp.SolverState(z=jnp.asarray(state.z, jnp.float64),
                                y=jnp.asarray(state.y, jnp.float64))
        U = sqp.prep_warmstart(state, p, cfg)
        X = sqp._rollout_X(p.x0, U, p, cfg)
        z = problem.join_z(X, U)
        nU = 32 * cfg.N
        qp = condense.build(z, p, cfg, 0.1, jnp.ones(nU, jnp.float64),
                            lam_soft=None, soft=False)

        def kkt(res, dtype):
            H, g, C, d = map(lambda a: np.asarray(a, np.float64),
                             (qp.H, qp.g, qp.C, qp.d))
            v = np.asarray(res.v, np.float64)
            lam = np.asarray(res.lam, np.float64)
            scale = max(1.0, np.abs(g).max())
            assert float(np.maximum(C @ v - d, 0.0).max()) < 1e-3
            assert lam.min() >= 0.0
            r_stat = np.abs(H @ v + g + C.T @ lam).max() / scale
            slack = np.maximum(d - C @ v, 0.0)
            comp = float(np.abs(lam * slack).max()) / scale
            return r_stat, comp

        res64 = pdip_solve(qp.H, qp.g, qp.C, qp.d, PDIPSettings(iters=25))
        r_stat, comp = kkt(res64, np.float64)
        assert r_stat < 1e-8, r_stat
        assert comp < 1e-6, comp

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        res32 = pdip_solve(f32(qp.H), f32(qp.g), f32(qp.C), f32(qp.d),
                           PDIPSettings(iters=25))
        r_stat, comp = kkt(res32, np.float32)
        # f32 leaves a ~10% relative KKT error on this badly-scaled QP
        # (measured r_stat 0.110 with the round-5 SOFT_MARGIN 1e-2
        # tightening; ~4e-2 at the r3 margin — the tightened Lyapunov
        # rows push the endgame complementarity spread) — acceptable in
        # the closed loop because the SQP re-solves every tick, but
        # pinned here so a regression past rounding-level error is
        # caught.
        assert r_stat < 0.15, r_stat
        assert comp < 1.0, comp
    finally:
        jax.config.update("jax_enable_x64", old)


def test_substitution_path():
    """explicit_inv=False (cho_solve substitution per RHS) must agree with
    the explicit-inverse path — pins the otherwise-dormant branch that f64
    CPU diagnostics use (PDIPSettings.explicit_inv docstring)."""
    rng = np.random.default_rng(7)
    n, m = 12, 20
    L = rng.normal(size=(n, n))
    H = jnp.asarray(L @ L.T + np.eye(n), jnp.float32)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    C = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    d = jnp.asarray(rng.uniform(0.1, 2.0, size=m), jnp.float32)
    res_inv = pdip_solve(H, g, C, d, PDIPSettings(iters=15))
    res_sub = pdip_solve(H, g, C, d,
                         PDIPSettings(iters=15, explicit_inv=False))
    np.testing.assert_allclose(np.asarray(res_sub.v), np.asarray(res_inv.v),
                               atol=1e-4)
    assert float(res_sub.r_prim) < 1e-4
