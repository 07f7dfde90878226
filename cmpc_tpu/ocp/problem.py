"""The centroidal MPC optimal-control problem, declaratively.

This module is the normative port of the NLP that the reference builds as a
CasADi ``Opti`` graph (centroidal_mpc_vertices.py:126-353, spec'd in
SURVEY.md §2.2).  Three pieces:

* :func:`cost_value`     — the scalar cost (for testing / line search).
* :func:`cost_quadratic` — the cost's exact (P, q): the cost is a fixed
  quadratic in the decision variables, so instead of re-deriving it with
  autodiff every solve we build the (mostly diagonal) Hessian directly.
* :func:`constraints` + :func:`constraint_bounds` — all equality and
  inequality constraints as one stacked vector c(z) with static bounds
  l <= c(z) <= u (equalities have l == u).  The SQP layer linearizes this
  once per iteration with jacfwd.

Decision vector z (n_z = 20*(N+1) + 32*N): [vec(X), vec(U)], X node-major.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.models import centroidal as cm

W_HW = 1000.0      # angular-momentum cost (centroidal_mpc_vertices.py:312)
W_XY = 1.0         # CoM x/y tracking (:313-314)
W_FOOT = 1000.0    # stance foot pose tracking (:316-319)
W_SHARE = 10.0     # vertex-force sharing regularizer (:320-327)
W_SWING = 10.0     # swing-phase force suppression (:328-335)
W_COM_Z0 = 2000.0  # CoM z weight, decaying 2000 -> 1000 (:301-305)


class MPCParams(NamedTuple):
    """Per-solve parameters (the reference's opt.set_value payload,
    centroidal_mpc_vertices.py:168-181,511-600)."""

    x0: jnp.ndarray         # (20,)
    com_ref: jnp.ndarray    # (N, 9) pos/vel/acc reference at nodes 1..N
    pos_ref_l: jnp.ndarray  # (N, 3)
    pos_ref_r: jnp.ndarray  # (N, 3)
    yaw_ref_l: jnp.ndarray  # (N,)
    yaw_ref_r: jnp.ndarray  # (N,)
    gamma_l: jnp.ndarray    # (N+1,) contact gates
    gamma_r: jnp.ndarray    # (N+1,)
    k1: jnp.ndarray         # ()
    k2: jnp.ndarray         # ()
    mass: jnp.ndarray       # ()


def _wz(cfg: WalkConfig):
    """CoM z tracking weight schedule (:301-305)."""
    i = np.arange(cfg.N)
    wmin = W_COM_Z0 / 2.0
    return jnp.asarray((W_COM_Z0 - wmin) * np.exp(-i) + wmin)


def _wf_rate(cfg: WalkConfig) -> float:
    """Force rate-of-change weight (:339-341); zero at mpc_rate 10."""
    return 0.0 if cfg.mpc_rate == 10 else 1.0


def split_z(z, cfg: WalkConfig):
    nX = cm.N_X * (cfg.N + 1)
    X = z[:nX].reshape(cfg.N + 1, cm.N_X)
    U = z[nX:].reshape(cfg.N, cm.N_U)
    return X, U


def join_z(X, U):
    return jnp.concatenate([X.reshape(-1), U.reshape(-1)])


# ---------------------------------------------------------------------------
# cost
# ---------------------------------------------------------------------------

def cost_value(z, p: MPCParams, cfg: WalkConfig):
    """Direct translation of the cost sum (:309-351). Used by tests to
    validate the hand-built quadratic and by diagnostics."""
    X, U = split_z(z, cfg)
    N = cfg.N
    gl, gr = p.gamma_l, p.gamma_r
    wz = _wz(cfg)

    c = W_HW * jnp.sum(X[:N, cm.H_W] ** 2)
    dcom = X[1:, cm.P_COM] - p.com_ref[:, 0:3]
    c += W_XY * jnp.sum(dcom[:, 0] ** 2) + W_XY * jnp.sum(dcom[:, 1] ** 2)
    c += jnp.sum(wz * dcom[:, 2] ** 2)
    c += W_FOOT * jnp.sum(((X[1:, cm.POS_L] - p.pos_ref_l)
                           * gl[1:, None]) ** 2)
    c += W_FOOT * jnp.sum(((X[1:, cm.POS_R] - p.pos_ref_r)
                           * gr[1:, None]) ** 2)
    c += W_FOOT * jnp.sum(((X[1:, cm.PSI_L] - p.yaw_ref_l) * gl[1:]) ** 2)
    c += W_FOOT * jnp.sum(((X[1:, cm.PSI_R] - p.yaw_ref_r) * gr[1:]) ** 2)

    fl = U[:, 0:12].reshape(N, 4, 3)
    fr = U[:, 12:24].reshape(N, 4, 3)
    # aux average force: (1/4) * sum(f) * gamma^2 (:275-279)
    avg_l = fl.sum(1) * (gl[:N, None] ** 2) / 4.0
    avg_r = fr.sum(1) * (gr[:N, None] ** 2) / 4.0
    c += W_SHARE * jnp.sum(((avg_l[:, None, :] - fl) ** 2)
                           * gl[:N, None, None])
    c += W_SHARE * jnp.sum(((avg_r[:, None, :] - fr) ** 2)
                           * gr[:N, None, None])
    c += W_SWING * jnp.sum((fl ** 2) * (1.0 - gl[:N, None, None]))
    c += W_SWING * jnp.sum((fr ** 2) * (1.0 - gr[:N, None, None]))

    wf = _wf_rate(cfg)
    dfl = jnp.diff(fl[:, :, 2], axis=0)    # (N-1, 4) vertical rate
    dfr = jnp.diff(fr[:, :, 2], axis=0)
    c += wf * jnp.sum((dfl ** 2) * gl[:N - 1, None])
    c += wf * jnp.sum((dfr ** 2) * gr[:N - 1, None])
    return c


def cost_quadratic_parts(p: MPCParams, cfg: WalkConfig):
    """The exact cost Hessian/gradient in BLOCK form: (dX_diag, Puu, q)
    with P = blockdiag(diag(dX_diag), Puu) — the cost has no X-U cross
    terms, the X block is purely diagonal, and only the U block couples
    (4x4 vertex blocks + the z-rate tridiagonal).  The condensing fast
    path (ocp/condense.build(structured=True)) consumes the parts
    directly: materializing the dense (540, 540) P per SQP iteration at
    batch 256 moved ~300 MB of HBM per scatter op and dominated
    condense.build's 23 ms (measured, tools/profile_solve.py); the parts
    are ~100x smaller."""
    N = cfg.N
    nX = cm.N_X * (N + 1)
    nU = cm.N_U * N
    gl, gr = p.gamma_l, p.gamma_r
    wz = _wz(cfg)

    # ---- X diagonal
    dX = jnp.zeros((N + 1, cm.N_X))
    dX = dX.at[1:, 0].set(2 * W_XY)
    dX = dX.at[1:, 1].set(2 * W_XY)
    dX = dX.at[1:, 2].set(2 * wz)
    dX = dX.at[:N, cm.H_W].set(2 * W_HW)
    dX = dX.at[1:, cm.POS_L].set(2 * W_FOOT * (gl[1:, None] ** 2))
    dX = dX.at[1:, cm.PSI_L].set(2 * W_FOOT * (gl[1:] ** 2))
    dX = dX.at[1:, cm.POS_R].set(2 * W_FOOT * (gr[1:, None] ** 2))
    dX = dX.at[1:, cm.PSI_R].set(2 * W_FOOT * (gr[1:] ** 2))

    # ---- U blocks: per stage, per foot, per axis a 4x4 over vertex forces
    eye4 = jnp.eye(4)
    ones4 = jnp.ones((4, 4))

    def fblock(g):  # g scalar gate -> (4,4)
        M = eye4 - (g ** 2 / 4.0) * ones4
        return 2 * W_SHARE * g * (M.T @ M) + 2 * W_SWING * (1 - g) * eye4

    bl = jax.vmap(fblock)(gl[:N])   # (N,4,4)
    br = jax.vmap(fblock)(gr[:N])

    Puu = jnp.zeros((nU, nU))

    # static index maps for the force blocks (within the U coordinates)
    stage_base = 32 * np.arange(N)                           # (N,)
    vtx = 3 * np.arange(4)                                   # (4,)
    axes = np.arange(3)
    # idx[i, foot, a, j] = stage_base[i] + 12*foot + 3*j + a
    idx_l = (stage_base[:, None, None] + vtx[None, :, None]
             + axes[None, None, :])                          # (N,4,3)
    idx_r = idx_l + 12
    for foot_idx, blocks in ((idx_l, bl), (idx_r, br)):
        for a in range(3):
            rows = foot_idx[:, :, a]                         # (N,4)
            Puu = Puu.at[rows[:, :, None], rows[:, None, :]].add(blocks)

    # force z-rate tridiagonal coupling (gate at stage i)
    wf = _wf_rate(cfg)
    if wf != 0.0 and N > 1:
        zcols_l = idx_l[:, :, 2]                             # (N,4)
        zcols_r = idx_r[:, :, 2]
        for zcols, g in ((zcols_l, gl), (zcols_r, gr)):
            gi = g[:N - 1]                                   # (N-1,)
            a_, b_ = zcols[:-1], zcols[1:]                   # (N-1,4)
            Puu = Puu.at[a_, a_].add(2 * wf * gi[:, None])
            Puu = Puu.at[b_, b_].add(2 * wf * gi[:, None])
            Puu = Puu.at[a_, b_].add(-2 * wf * gi[:, None])
            Puu = Puu.at[b_, a_].add(-2 * wf * gi[:, None])

    # ---- linear term
    qX = jnp.zeros((N + 1, cm.N_X))
    qX = qX.at[1:, 0].set(-2 * W_XY * p.com_ref[:, 0])
    qX = qX.at[1:, 1].set(-2 * W_XY * p.com_ref[:, 1])
    qX = qX.at[1:, 2].set(-2 * wz * p.com_ref[:, 2])
    qX = qX.at[1:, cm.POS_L].set(
        -2 * W_FOOT * (gl[1:, None] ** 2) * p.pos_ref_l)
    qX = qX.at[1:, cm.PSI_L].set(-2 * W_FOOT * (gl[1:] ** 2) * p.yaw_ref_l)
    qX = qX.at[1:, cm.POS_R].set(
        -2 * W_FOOT * (gr[1:, None] ** 2) * p.pos_ref_r)
    qX = qX.at[1:, cm.PSI_R].set(-2 * W_FOOT * (gr[1:] ** 2) * p.yaw_ref_r)
    q = jnp.concatenate([qX.reshape(-1), jnp.zeros(32 * N)])
    return dX.reshape(-1), Puu, q


def cost_quadratic(p: MPCParams, cfg: WalkConfig):
    """Exact dense (P, q) with cost(z) = 1/2 z^T P z + q^T z + const,
    assembled from :func:`cost_quadratic_parts` (the ADMM path and the
    tests consume the dense form; the condensing fast path uses the
    parts directly)."""
    dX_diag, Puu, q = cost_quadratic_parts(p, cfg)
    nX = dX_diag.shape[0]
    nz = cfg.n_z
    P = jnp.zeros((nz, nz))
    P = P.at[np.arange(nX), np.arange(nX)].set(dX_diag)
    P = P.at[nX:, nX:].set(Puu)
    return P, q


# ---------------------------------------------------------------------------
# constraints
# ---------------------------------------------------------------------------

def _friction_matrix(mu: float):
    """Pyramid rows A f <= 0 (centroidal_mpc_vertices.py:44-48)."""
    return np.array([[1, 0, -mu], [-1, 0, -mu],
                     [0, 1, -mu], [0, -1, -mu]], dtype=np.float64)


def constraints(z, p: MPCParams, cfg: WalkConfig):
    """Stacked constraint values c(z), bounded by :func:`constraint_bounds`.

    Row order: [init(20), dynamics(20N), lyapunov(N), momentum(1),
    height(N), friction_l(16N), friction_r(16N), fz_l(4N), fz_r(4N),
    box_l(3N), box_r(3N)].
    """
    X, U = split_z(z, cfg)
    N = cfg.N
    gl, gr = p.gamma_l, p.gamma_r
    polygon = cm.foot_polygon(cfg.foot_length, cfg.foot_width)

    # equalities ---------------------------------------------------------
    init = X[0] - p.x0
    step = jax.vmap(
        lambda x, r, a, b, u: cm.euler_step(
            x, r, a, b, u, p.k1, p.k2, p.mass, cfg.g, polygon, cfg.delta)
    )(X[:-1], p.com_ref, gl[:N], gr[:N], U)
    dyn = (X[1:] - step).reshape(-1)

    # Lyapunov decrease (:217-220) ----------------------------------------
    z1 = X[1:, cm.P_COM] - p.com_ref[:, 0:3]           # (N,3)
    z2 = p.k1 * z1 + (X[1:, cm.V_COM] - p.com_ref[:, 3:6])
    fl = U[:, 0:12].reshape(N, 4, 3)
    fr = U[:, 12:24].reshape(N, 4, 3)
    Vl = fl.sum(1) * gl[:N, None] / p.mass
    Vr = fr.sum(1) * gr[:N, None] / p.mass
    gravity = jnp.array([0.0, 0.0, -cfg.g])
    u_n = (-(p.k1 + p.k2) * z2 + p.k1 ** 2 * z1 - gravity
           + p.com_ref[:, 6:9] - X[:N, cm.THETA] / p.mass)
    lyap = (-p.k1 * jnp.sum(z1 * z1, -1) - p.k2 * jnp.sum(z2 * z2, -1)
            + jnp.sum(z1 * z2, -1) + jnp.sum(z2 * (Vl + Vr - u_n), -1))

    # angular momentum non-increase at the first node only (:222-224)
    mom = (jnp.sum(X[1, cm.H_W] ** 2) - jnp.sum(X[0, cm.H_W] ** 2))[None]

    # CoM height ceiling, nodes 0..N-1 (:229-230)
    height = X[:N, 2] - cfg.com_z_max

    # friction cones + unilaterality, gated (:236-254) --------------------
    A = jnp.asarray(_friction_matrix(cfg.mu))
    fric_l = (jnp.einsum("kc,nvc->nvk", A, fl)
              * gl[:N, None, None]).reshape(-1)
    fric_r = (jnp.einsum("kc,nvc->nvk", A, fr)
              * gr[:N, None, None]).reshape(-1)
    fz_l = (-fl[:, :, 2] * gl[:N, None]).reshape(-1)
    fz_r = (-fr[:, :, 2] * gr[:N, None]).reshape(-1)

    # stance-foot box around reference, gated by gamma at node i+1
    # (:258-271); two-sided bounds live in constraint_bounds.
    box_l = ((X[1:, cm.POS_L] - p.pos_ref_l) * gl[1:, None]).reshape(-1)
    box_r = ((X[1:, cm.POS_R] - p.pos_ref_r) * gr[1:, None]).reshape(-1)

    return jnp.concatenate([init, dyn, lyap, mom, height,
                            fric_l, fric_r, fz_l, fz_r, box_l, box_r])


class LinearizeParts(NamedTuple):
    """Per-block constraint linearization (the pieces of J without the
    dense (m, n_z) scatter): dynamics-stage Jacobians, Lyapunov-row
    gradients, and the momentum-row endpoints.  All other row families
    (height/friction/fz/box) are closed-form in the contact gates.  The
    condensing fast path (ocp/condense.build(structured=True)) consumes
    these directly — materializing J at batch 256 is a ~390 MB buffer
    whose scatter traffic dominated linearize's 9-17 ms."""

    c: jnp.ndarray       # (m,) constraint values
    A_blk: jnp.ndarray   # (N, 20, 20) d step / d x_i
    B_blk: jnp.ndarray   # (N, 20, 32) d step / d u_i
    gx: jnp.ndarray      # (N, 20) lyap row grad wrt x_i
    gxn: jnp.ndarray     # (N, 20) lyap row grad wrt x_{i+1}
    gu: jnp.ndarray      # (N, 32) lyap row grad wrt u_i
    hw0: jnp.ndarray     # (3,) momentum row: -2*hw0 at x_0
    hw1: jnp.ndarray     # (3,) momentum row: +2*hw1 at x_1


def linearize_parts(z, p: MPCParams, cfg: WalkConfig) -> LinearizeParts:
    X, U = split_z(z, cfg)
    N = cfg.N
    gl, gr = p.gamma_l, p.gamma_r
    polygon = cm.foot_polygon(cfg.foot_length, cfg.foot_width)

    c = constraints(z, p, cfg)

    def step_fn(x, r, a, b, u):
        return cm.euler_step(x, r, a, b, u, p.k1, p.k2, p.mass, cfg.g,
                             polygon, cfg.delta)

    A_blk, B_blk = jax.vmap(jax.jacfwd(step_fn, argnums=(0, 4)))(
        X[:-1], p.com_ref, gl[:N], gr[:N], U)          # (N,20,20),(N,20,32)

    def lyap_i(x_i, x_ip1, u_i, ref, gli, gri):
        z1 = x_ip1[cm.P_COM] - ref[0:3]
        z2 = p.k1 * z1 + (x_ip1[cm.V_COM] - ref[3:6])
        fl = u_i[0:12].reshape(4, 3)
        fr = u_i[12:24].reshape(4, 3)
        V = (fl.sum(0) * gli + fr.sum(0) * gri) / p.mass
        gravity = jnp.array([0.0, 0.0, -cfg.g])
        u_n = (-(p.k1 + p.k2) * z2 + p.k1 ** 2 * z1 - gravity
               + ref[6:9] - x_i[cm.THETA] / p.mass)
        return (-p.k1 * z1 @ z1 - p.k2 * z2 @ z2 + z1 @ z2
                + z2 @ (V - u_n))

    gx, gxn, gu = jax.vmap(jax.grad(lyap_i, argnums=(0, 1, 2)))(
        X[:-1], X[1:], U, p.com_ref, gl[:N], gr[:N])   # (N,20)x2,(N,32)

    return LinearizeParts(c=c, A_blk=A_blk, B_blk=B_blk, gx=gx, gxn=gxn,
                          gu=gu, hw0=-2.0 * X[0, cm.H_W],
                          hw1=2.0 * X[1, cm.H_W])


def linearize(z, p: MPCParams, cfg: WalkConfig):
    """(c(z), J(z)) with the Jacobian assembled analytically per block.

    Replaces `jax.jacfwd(constraints)` — which pushes n_z=540 tangents
    through the whole constraint stack — with per-stage 52-tangent
    jacobians for the dynamics rows (linearize_parts), per-stage scalar
    gradients for the Lyapunov rows, and closed-form entries for
    everything else (the friction/fz/box/height rows are linear with
    gamma-scaled constant coefficients).  ~10x fewer flops and a much
    smaller jaxpr.
    """
    N = cfg.N
    nX = cm.N_X * (N + 1)
    nz = cfg.n_z
    m = num_constraints(cfg)
    gl, gr = p.gamma_l, p.gamma_r

    parts = linearize_parts(z, p, cfg)
    c, A_blk, B_blk = parts.c, parts.A_blk, parts.B_blk
    gx, gxn, gu = parts.gx, parts.gxn, parts.gu
    J = jnp.zeros((m, nz))

    # ---- init rows: I on X0
    J = J.at[jnp.arange(20), jnp.arange(20)].set(1.0)

    # ---- dynamics rows: X[i+1] - f(X[i], U[i]) -> [+I | -A_i | -B_i]
    rows_dyn = 20 + 20 * np.arange(N)[:, None] + np.arange(20)[None, :]
    cols_x_next = 20 * (np.arange(N) + 1)[:, None] + np.arange(20)[None, :]
    J = J.at[rows_dyn, cols_x_next].set(1.0)
    cols_x = (20 * np.arange(N))[:, None, None] + np.arange(20)[None, None]
    J = J.at[rows_dyn[:, :, None],
             np.broadcast_to(cols_x, (N, 20, 20))].add(-A_blk)
    cols_u = (nX + 32 * np.arange(N))[:, None, None] \
        + np.arange(32)[None, None]
    J = J.at[rows_dyn[:, :, None],
             np.broadcast_to(cols_u, (N, 20, 32))].add(-B_blk)

    n_eq = 20 * (N + 1)

    # ---- Lyapunov rows: scalar gradient per stage wrt (x_i, x_{i+1}, u_i)
    rows_ly = n_eq + np.arange(N)
    J = J.at[rows_ly[:, None],
             (20 * np.arange(N))[:, None] + np.arange(20)[None]].add(gx)
    J = J.at[rows_ly[:, None],
             (20 * (np.arange(N) + 1))[:, None]
             + np.arange(20)[None]].add(gxn)
    J = J.at[rows_ly[:, None],
             (nX + 32 * np.arange(N))[:, None]
             + np.arange(32)[None]].add(gu)

    # ---- momentum row: |hw1|^2 - |hw0|^2
    r_mom = n_eq + N
    hw_cols0 = np.arange(6, 9)
    hw_cols1 = 20 + np.arange(6, 9)
    J = J.at[r_mom, hw_cols1].set(parts.hw1)
    J = J.at[r_mom, hw_cols0].set(parts.hw0)

    # ---- height rows: X[i][2], i = 0..N-1
    rows_h = n_eq + N + 1 + np.arange(N)
    J = J.at[rows_h, 20 * np.arange(N) + 2].set(1.0)

    # ---- friction rows: A_mu on stage forces, gamma-gated
    Amu = jnp.asarray(_friction_matrix(cfg.mu))        # (4,3)
    f0 = n_eq + 2 * N + 1
    i_idx = np.arange(N)[:, None, None, None]
    v_idx = np.arange(4)[None, :, None, None]
    k_idx = np.arange(4)[None, None, :, None]
    c_idx = np.arange(3)[None, None, None, :]
    rows_fr = f0 + 16 * i_idx + 4 * v_idx + k_idx      # (N,4,4,1)
    cols_l = nX + 32 * i_idx + 3 * v_idx + c_idx       # (N,4,1,3)
    coef = jnp.broadcast_to(Amu[None, None], (N, 4, 4, 3))
    J = J.at[np.broadcast_to(rows_fr, (N, 4, 4, 3)),
             np.broadcast_to(cols_l, (N, 4, 4, 3))].set(
        coef * gl[:N, None, None, None])
    J = J.at[np.broadcast_to(rows_fr + 16 * N, (N, 4, 4, 3)),
             np.broadcast_to(cols_l + 12, (N, 4, 4, 3))].set(
        coef * gr[:N, None, None, None])

    # ---- fz rows: -gamma on vertical force comps
    z0 = f0 + 32 * N
    rows_fz = z0 + 4 * np.arange(N)[:, None] + np.arange(4)[None]
    cols_fz_l = nX + 32 * np.arange(N)[:, None] + 3 * np.arange(4)[None] + 2
    J = J.at[rows_fz, cols_fz_l].set(-gl[:N, None]
                                     * jnp.ones((N, 4)))
    J = J.at[rows_fz + 4 * N, cols_fz_l + 12].set(-gr[:N, None]
                                                  * jnp.ones((N, 4)))

    # ---- stance box rows: gamma at X[i+1] foot-position cols
    b0 = z0 + 8 * N
    rows_bx = b0 + 3 * np.arange(N)[:, None] + np.arange(3)[None]
    cols_bl = 20 * (np.arange(N) + 1)[:, None] + 13 + np.arange(3)[None]
    J = J.at[rows_bx, cols_bl].set(gl[1:, None] * jnp.ones((N, 3)))
    J = J.at[rows_bx + 3 * N, cols_bl + 4].set(gr[1:, None]
                                               * jnp.ones((N, 3)))

    return c, J


@functools.lru_cache(maxsize=8)
def constraint_bounds(cfg: WalkConfig):
    """Static (l, u) for l <= c(z) <= u. Equalities: l == u == 0."""
    N = cfg.N
    neg = -np.inf
    n_eq = 20 * (N + 1)
    l = [np.zeros(n_eq)]
    u = [np.zeros(n_eq)]
    # lyapunov, momentum, height, friction, fz: one-sided <= 0
    n_ineq0 = N + 1 + N + 16 * N + 16 * N + 4 * N + 4 * N
    l.append(np.full(n_ineq0, neg))
    u.append(np.zeros(n_ineq0))
    # stance boxes: +-(bx, by, bz) per node per foot
    box = np.tile(np.asarray(cfg.stance_box), N)
    l.extend([-box, -box])
    u.extend([box, box])
    return np.concatenate(l), np.concatenate(u)


def num_constraints(cfg: WalkConfig) -> int:
    return constraint_bounds(cfg)[0].shape[0]
