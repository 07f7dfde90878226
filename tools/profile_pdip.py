"""Sub-op timing of one PDIP iteration at batch B: CtDC formation,
Cholesky factorization, triangular solves, full body.  Targets the perf
work inside ops/pdip.py (it is ~92% of the MPC solve per
tools/profile_solve.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_mmd = jnp.matmul   # default precision (bf16 passes on TPU)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n, m = 320, 541
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A = jax.random.normal(k1, (B, n, n)) / jnp.sqrt(n)
    H = jnp.einsum("bij,bkj->bik", A, A) + 0.5 * jnp.eye(n)
    C = jax.random.normal(k2, (B, m, n))
    dscale = jax.random.uniform(k3, (B, m), minval=0.1, maxval=10.0)
    rhs = jax.random.normal(k4, (B, n))
    print("device:", jax.devices()[0], " B =", B)

    @jax.jit
    def f_ctdc(C, dscale):
        return jax.vmap(lambda Cb, db: _mm(Cb.T * db, Cb))(C, dscale)

    @jax.jit
    def f_ctdc_default(C, dscale):
        return jax.vmap(lambda Cb, db: _mmd(Cb.T * db, Cb))(C, dscale)

    M = f_ctdc(C, dscale) + H

    @jax.jit
    def f_chol(M):
        return jax.vmap(lambda Mb: cho_factor(Mb)[0])(M)

    chol = f_chol(M)

    @jax.jit
    def f_solve(chol, rhs):
        return jax.vmap(lambda cb, rb: cho_solve((cb, False), rb))(chol, rhs)

    @jax.jit
    def f_cmv(C, rhs):
        """the C @ dv / C.T @ vec products (4 per newton pair)"""
        return jax.vmap(lambda Cb, rb: _mm(Cb, rb))(C, rhs)

    print(f"CtDC highest  : {timeit(f_ctdc, C, dscale):8.2f} ms")
    print(f"CtDC default  : {timeit(f_ctdc_default, C, dscale):8.2f} ms")
    print(f"cho_factor    : {timeit(f_chol, M):8.2f} ms")
    print(f"cho_solve(1)  : {timeit(f_solve, chol, rhs):8.2f} ms")
    print(f"C @ v         : {timeit(f_cmv, C, rhs):8.2f} ms")


if __name__ == "__main__":
    main()
