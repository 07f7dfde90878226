"""Batched OSQP-style ADMM quadratic-program solver, pure JAX.

The TPU-native replacement for the reference's native QP/NLP backends
(OSQP via CasADi, utils.py:40-92; inner iterations of IPOPT).  Solves

    min 1/2 x^T P x + q^T x    s.t.  l <= A x <= u

with the operator-splitting scheme of OSQP (Stellato et al., 2020):
one dense factorization of (P + sigma*I + A^T diag(rho) A) per call, then
fixed-count matrix-vector iterations — every step is a batched matmul, so
thousands of scenarios run in lockstep on the MXU under vmap with no
data-dependent control flow (fixed iteration count instead of a tolerance
exit keeps the batch converged together; SURVEY.md §7 hard part #3).

Equality rows (l == u) get a 1e3-boosted rho, matching OSQP's default
treatment.  Rows are inf-norm equilibrated to tame the mixed units of the
MPC constraint stack (forces ~1e2 N vs stance boxes ~5e-5 m).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ADMMSettings(NamedTuple):
    iters: int = 50
    rho: float = 10.0
    sigma: float = 1e-6
    alpha: float = 1.6
    eq_rho_scale: float = 1e3


class ADMMResult(NamedTuple):
    x: jnp.ndarray        # primal solution
    y: jnp.ndarray        # dual (for warm starting)
    zc: jnp.ndarray       # projected constraint values
    r_prim: jnp.ndarray   # ||Ax - z||_inf
    r_dual: jnp.ndarray   # ||Px + q + A'y||_inf


def _row_scaling(A, l, u):
    """Inf-norm row equilibration; keeps inf bounds infinite."""
    d = 1.0 / jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-6)
    return A * d[:, None], l * d, u * d, d


def admm_solve(P, q, A, l, u, x0, y0, settings: ADMMSettings) -> ADMMResult:
    """One QP solve. All inputs are per-scenario (vmap over a batch axis).

    x0: primal warm start; y0: dual warm start in the *unscaled* row space.
    """
    A, l, u, d = _row_scaling(A, l, u)
    y = y0 / d  # wait-free mapping of the warm-started dual into scaled rows

    is_eq = (jnp.isfinite(l) & jnp.isfinite(u) & (jnp.abs(u - l) < 1e-12))
    rho = jnp.where(is_eq, settings.rho * settings.eq_rho_scale, settings.rho)
    sigma = settings.sigma
    alpha = settings.alpha

    M = P + sigma * jnp.eye(P.shape[0]) + (A.T * rho) @ A
    # One dense factorization per solve; explicit inverse so that the fixed
    # ADMM iterations are pure matmuls (batched well on the MXU).
    Minv = jnp.linalg.inv(M)

    zc = jnp.clip(A @ x0, l, u)
    x = x0

    def body(_, carry):
        x, zc, y = carry
        rhs = sigma * x - q + A.T @ (rho * zc - y)
        xt = Minv @ rhs
        axt = A @ xt
        x_new = alpha * xt + (1 - alpha) * x
        zt = alpha * axt + (1 - alpha) * zc
        z_new = jnp.clip(zt + y / rho, l, u)
        y_new = y + rho * (zt - z_new)
        return (x_new, z_new, y_new)

    x, zc, y = jax.lax.fori_loop(0, settings.iters, body, (x, zc, y))

    r_prim = jnp.max(jnp.abs(A @ x - zc))
    r_dual = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    return ADMMResult(x=x, y=y * d, zc=zc, r_prim=r_prim, r_dual=r_dual)
