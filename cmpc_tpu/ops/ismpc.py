"""IS-MPC: the legacy LIP-model linear MPC with the stability ("periodic
tail") constraint — batched TPU port of original_code/ismpc.py.

The whole QP is *linear time-invariant*: the constraint matrix, cost
Hessian, and therefore the ADMM KKT inverse are compile-time constants.
Only q, l, u change per solve (initial state + moving ZMP constraint), so a
solve is a fixed count of dense matvecs — ideal MXU batching.

Decision vector z = [vec(X) 9*(N+1), vec(U) 3*N], X node-major.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

from cmpc_tpu.models.lip import lip_matrices

W_ZMP = 100.0  # zmp tracking weight (original_code/ismpc.py:45-48)


class ISMPCConfig(NamedTuple):
    N: int = 100
    delta: float = 0.01
    eta: float = 3.6913           # sqrt(g/h) for h=0.72
    g: float = 9.81
    foot_size: float = 0.1
    admm_iters: int = 60
    rho: float = 1.0
    sigma: float = 1e-6
    alpha: float = 1.6
    eq_rho_scale: float = 1e3


class ISMPCStatic(NamedTuple):
    """Compile-time constants of the QP."""

    A: jnp.ndarray        # (m, n) constraint matrix
    Minv: jnp.ndarray     # (n, n) inverse ADMM KKT matrix
    P_diag: jnp.ndarray   # (n,) diagonal cost Hessian
    rho_vec: jnp.ndarray  # (m,)
    dyn_rhs: jnp.ndarray  # (9N,) constant drift terms of the dynamics rows


def _zmp_cols(N):
    """z-vector columns of the ZMP components of nodes 1..N, per axis."""
    node = 9 * (np.arange(N) + 1)
    return node + 2, node + 5, node + 8


@functools.lru_cache(maxsize=4)
def build_static(cfg: ISMPCConfig) -> ISMPCStatic:
    N = cfg.N
    nX, nU = 9 * (N + 1), 3 * N
    n = nX + nU
    A_lip, B_lip = lip_matrices(cfg.eta)
    Ad = np.eye(3) + cfg.delta * A_lip
    Bd = cfg.delta * B_lip[:, 0]

    rows = []
    # init (9): x_0
    init = np.zeros((9, n))
    init[:, :9] = np.eye(9)
    rows.append(init)
    # dynamics (9N): x_{i+1} - Ad_blk x_i - Bd_blk u_i == delta*drift
    dyn = np.zeros((9 * N, n))
    for i in range(N):
        r = 9 * i
        dyn[r:r + 9, 9 * (i + 1):9 * (i + 2)] = np.eye(9)
        for ax in range(3):
            dyn[r + 3 * ax:r + 3 * ax + 3,
                9 * i + 3 * ax:9 * i + 3 * ax + 3] = -Ad
            dyn[r + 3 * ax:r + 3 * ax + 3, nX + 3 * i + ax] = -Bd
    rows.append(dyn)
    # zmp rows (3N): value = zmp component, bounds mid -+ foot/2
    cx, cy, cz = _zmp_cols(N)
    zmp = np.zeros((3 * N, n))
    zmp[np.arange(N), cx] = 1.0
    zmp[N + np.arange(N), cy] = 1.0
    zmp[2 * N + np.arange(N), cz] = 1.0
    rows.append(zmp)
    # stability periodic tail (3): per axis
    # (v0 + eta*(p0 - z0)) - (vN + eta*(pN - zN)) == 0
    st = np.zeros((3, n))
    for ax in range(3):
        b0, bN = 3 * ax, 9 * N + 3 * ax
        st[ax, b0 + 0] = cfg.eta
        st[ax, b0 + 1] = 1.0
        st[ax, b0 + 2] = -cfg.eta
        st[ax, bN + 0] = -cfg.eta
        st[ax, bN + 1] = -1.0
        st[ax, bN + 2] = cfg.eta
    rows.append(st)

    A = np.vstack(rows)
    m = A.shape[0]

    P_diag = np.zeros(n)
    P_diag[nX:] = 2.0                   # |U|^2
    P_diag[cx] += 2.0 * W_ZMP
    P_diag[cy] += 2.0 * W_ZMP
    P_diag[cz] += 2.0 * W_ZMP

    rho_vec = np.full(m, cfg.rho)
    is_eq = np.ones(m, dtype=bool)
    is_eq[9 + 9 * N:9 + 9 * N + 3 * N] = False   # zmp boxes are inequalities
    rho_vec[is_eq] *= cfg.eq_rho_scale

    M = np.diag(P_diag + cfg.sigma) + (A.T * rho_vec) @ A
    Minv = np.linalg.inv(M)

    drift = np.zeros(9 * N)
    for i in range(N):
        drift[9 * i + 6:9 * i + 9] = cfg.delta * np.array(
            [0.0, -cfg.g, 0.0])

    return ISMPCStatic(
        A=jnp.asarray(A, jnp.float32),
        Minv=jnp.asarray(Minv, jnp.float32),
        P_diag=jnp.asarray(P_diag, jnp.float32),
        rho_vec=jnp.asarray(rho_vec, jnp.float32),
        dyn_rhs=jnp.asarray(drift, jnp.float32),
    )


class ISMPCState(NamedTuple):
    z: jnp.ndarray
    y: jnp.ndarray


def init_state(cfg: ISMPCConfig) -> ISMPCState:
    n = 9 * (cfg.N + 1) + 3 * cfg.N
    m = 9 + 9 * cfg.N + 3 * cfg.N + 3
    return ISMPCState(z=jnp.zeros(n), y=jnp.zeros(m))


def solve(state: ISMPCState, x0, mc_x, mc_y, mc_z, cfg: ISMPCConfig):
    """One IS-MPC solve. x0 (9,); mc_* (N,) moving ZMP box centers.

    Returns (new_state, lip_state dict-like tuple): com pos/vel/acc and zmp
    pos/vel at node 1 (original_code/ismpc.py:97-101).
    """
    st = build_static(cfg)
    N = cfg.N
    nX = 9 * (N + 1)
    half = cfg.foot_size / 2.0

    cx, cy, cz = _zmp_cols(N)
    q = jnp.zeros(nX + 3 * N)
    q = q.at[jnp.asarray(cx)].set(-2.0 * W_ZMP * mc_x)
    q = q.at[jnp.asarray(cy)].set(-2.0 * W_ZMP * mc_y)
    q = q.at[jnp.asarray(cz)].set(-2.0 * W_ZMP * mc_z)

    mid = jnp.concatenate([mc_x, mc_y, mc_z])
    l = jnp.concatenate([x0, st.dyn_rhs, mid - half, jnp.zeros(3)])
    u = jnp.concatenate([x0, st.dyn_rhs, mid + half, jnp.zeros(3)])

    z, y = state.z, state.y
    zc = jnp.clip(_mm(st.A, z), l, u)
    sigma, alpha = cfg.sigma, cfg.alpha

    def body(_, carry):
        x, zcv, yv = carry
        rhs = sigma * x - q + _mm(st.A.T, st.rho_vec * zcv - yv)
        xt = _mm(st.Minv, rhs)
        axt = _mm(st.A, xt)
        x_new = alpha * xt + (1 - alpha) * x
        zt = alpha * axt + (1 - alpha) * zcv
        z_new = jnp.clip(zt + yv / st.rho_vec, l, u)
        y_new = yv + st.rho_vec * (zt - z_new)
        return (x_new, z_new, y_new)

    z, _, y = jax.lax.fori_loop(0, cfg.admm_iters, body, (z, zc, y))

    x1 = z[9:18]
    u0 = z[nX:nX + 3]
    com_pos = x1[jnp.asarray([0, 3, 6])]
    com_vel = x1[jnp.asarray([1, 4, 7])]
    zmp_pos = x1[jnp.asarray([2, 5, 8])]
    com_acc = cfg.eta ** 2 * (com_pos - zmp_pos) + jnp.array(
        [0.0, 0.0, -cfg.g])
    return ISMPCState(z=z, y=y), (com_pos, com_vel, com_acc, zmp_pos, u0)


def moving_constraint(t, plan_pos, timing_ss, timing_ds, timing_start,
                      init_mid_xy, cfg: ISMPCConfig):
    """ZMP box centers over the horizon from the footstep plan with
    piecewise-linear blending (original_code/ismpc.py:109-122).

    plan_pos: (S, 3); timing_*: static (S,) numpy arrays.
    """
    S = plan_pos.shape[0]
    time_array = t + jnp.arange(cfg.N)
    mc_x = jnp.full(cfg.N, init_mid_xy[0])
    mc_y = jnp.full(cfg.N, init_mid_xy[1])
    for j in range(S - 1):
        ds_start = float(timing_start[j] + timing_ss[j])
        fs_end = float(timing_start[j] + timing_ss[j] + timing_ds[j])
        sigma = jnp.clip((time_array - ds_start) / (fs_end - ds_start),
                         0.0, 1.0)
        cur_x = plan_pos[j, 0] if j > 0 else init_mid_xy[0]
        cur_y = plan_pos[j, 1] if j > 0 else init_mid_xy[1]
        mc_x = mc_x + sigma * (plan_pos[j + 1, 0] - cur_x)
        mc_y = mc_y + sigma * (plan_pos[j + 1, 1] - cur_y)
    return mc_x, mc_y, jnp.zeros(cfg.N)
