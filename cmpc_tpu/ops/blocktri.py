"""Block-tridiagonal (stage-structured) linear algebra for the MPC QP.

The decision vector z = [vec(X), vec(U)] reordered stage-major,
s_i = (x_i, u_i), makes every matrix the ADMM/PDAS solver needs
block-tridiagonal: each cost/constraint row of the OCP touches at most two
*adjacent* stages (dynamics i: s_i,s_{i+1}; Lyapunov i: theta_i, u_i,
x_{i+1}; momentum: s_0,s_1; force-rate cost: u_i,u_{i+1}; everything else
stage-local).  Profiling the dense path on TPU showed the per-solve cost
is dominated by exactly the two dense 540-dim operations this kills:
inv(P + A' rho A) (147 ms/batch-256) and the PDAS re-solves
(3 x 132 ms/batch).  The block path replaces them with
(N+1) x 52^3 Cholesky factors + banded sweeps (~100x fewer flops).

The terminal stage (x_N alone, 20-dim) is padded to the uniform 52-dim
stage width with identity diagonal / zero couplings, keeping every scan
step one fixed-shape batched matmul on the MXU.

This is the "condensed-KKT / Riccati over stages" design of SURVEY.md §7
step 5, in pure XLA (a Pallas fusion can follow; the op mix is already
MXU-shaped).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class StagePerm(NamedTuple):
    """Static permutation data (host-built once per WalkConfig)."""

    perm: np.ndarray      # (n,) stage-major position -> original z index
    n: int                # true variable count
    n_pad: int            # padded count = n_stages * width
    n_stages: int
    width: int


def stage_perm(N: int, n_x: int = 20, n_u: int = 32) -> StagePerm:
    """Stage-major ordering [x_0, u_0, x_1, u_1, ..., x_N] of
    z = [vec(X), vec(U)]."""
    nX = n_x * (N + 1)
    order = []
    for i in range(N):
        order.extend(range(n_x * i, n_x * (i + 1)))          # x_i
        order.extend(range(nX + n_u * i, nX + n_u * (i + 1)))  # u_i
    order.extend(range(n_x * N, n_x * (N + 1)))              # x_N
    perm = np.asarray(order, dtype=np.int32)
    width = n_x + n_u
    return StagePerm(perm=perm, n=nX + n_u * N,
                     n_pad=(N + 1) * width, n_stages=N + 1, width=width)


def build_blocks(P, A, rho_diag, sigma, sp: StagePerm):
    """Stage blocks of M = P + sigma I + A' diag(rho) A in stage-major
    order.  Returns (D (S, w, w), O (S-1, w, w)).

    P: (n, n) cost Hessian; A: (m, n) constraint matrix; both in the
    ORIGINAL ordering (columns are gathered via the permutation — a cheap
    memory op next to the dense A' rho A it replaces).
    """
    S, w, n = sp.n_stages, sp.width, sp.n
    pad = sp.n_pad - n

    Ap = A[:, sp.perm]
    Ap = jnp.concatenate([Ap, jnp.zeros((A.shape[0], pad))], axis=1)
    Pp = P[sp.perm][:, sp.perm]
    Pp = jnp.pad(Pp, ((0, pad), (0, pad)))

    Ast = Ap.reshape(A.shape[0], S, w)                   # (m, S, w)
    Arho = Ast * rho_diag[:, None, None]
    # D_i = P_ii + sigma I + A_i' rho A_i
    D = jnp.einsum("msi,msj->sij", Arho, Ast,
                   precision=jax.lax.Precision.HIGHEST)
    Pblk = Pp.reshape(S, w, S, w)
    D = D + Pblk[jnp.arange(S), :, jnp.arange(S), :] \
        + sigma * jnp.eye(w)
    # identity on padded (dummy) variables so the factorization is SPD
    if pad:
        dummy = jnp.zeros(sp.n_pad).at[n:].set(1.0).reshape(S, w)
        D = D + jax.vmap(jnp.diag)(dummy)
    # O_i = P_{i,i+1} + A_i' rho A_{i+1}
    O = jnp.einsum("msi,msj->sij", Arho[:, :-1], Ast[:, 1:],
                   precision=jax.lax.Precision.HIGHEST)
    O = O + Pblk[jnp.arange(S - 1), :, jnp.arange(1, S), :]
    return D, O


class BlockFactor(NamedTuple):
    C: jnp.ndarray    # (S, w, w) lower-triangular Cholesky factors
    B: jnp.ndarray    # (S-1, w, w) subdiagonal of the block factor


def factor(D, O) -> BlockFactor:
    """Block Cholesky of the SPD block-tridiagonal matrix:
    M = L L' with L block-bidiagonal (C_i on the diagonal, B_i below).

    Batched triangular solves are used in the sweeps: measured FASTER on
    TPU than pre-inverting the 52x52 factors (619 vs 356 solves/s at
    bench settings — batched small jnp.linalg.inv lowers poorly)."""
    S = D.shape[0]
    # sequential over stages; S is small (N+1 = 11) so a python loop
    # unrolled at trace time keeps shapes explicit and XLA happy
    Cs, Bs = [], []
    C = jnp.linalg.cholesky(D[0])
    Cs.append(C)
    for i in range(1, S):
        # B_{i-1} = O_{i-1}' C_{i-1}^{-T}
        Bi = solve_triangular(Cs[i - 1], O[i - 1], lower=True).T
        Si = D[i] - _mm(Bi, Bi.T)
        Cs.append(jnp.linalg.cholesky(Si))
        Bs.append(Bi)
    return BlockFactor(C=jnp.stack(Cs),
                       B=(jnp.stack(Bs) if Bs
                          else jnp.zeros((0,) + C.shape)))


def solve(fac: BlockFactor, b, sp: StagePerm):
    """Solve M x = b given the block factor. b: (n,) original ordering."""
    S, w, n = sp.n_stages, sp.width, sp.n
    bp = jnp.concatenate([b[sp.perm], jnp.zeros(sp.n_pad - n)])
    bs = bp.reshape(S, w)

    ys = [solve_triangular(fac.C[0], bs[0], lower=True)]
    for i in range(1, S):
        rhs = bs[i] - fac.B[i - 1] @ ys[i - 1]
        ys.append(solve_triangular(fac.C[i], rhs, lower=True))

    xs = [None] * S
    xs[S - 1] = solve_triangular(fac.C[S - 1], ys[S - 1], lower=True,
                                 trans=1)
    for i in range(S - 2, -1, -1):
        rhs = ys[i] - fac.B[i].T @ xs[i + 1]
        xs[i] = solve_triangular(fac.C[i], rhs, lower=True, trans=1)

    xp = jnp.stack(xs).reshape(-1)[:n]
    out = jnp.zeros(n).at[jnp.asarray(sp.perm)].set(xp)
    return out
