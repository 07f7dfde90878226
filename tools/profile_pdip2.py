"""Comparative program timing for the PDIP iteration: 15-iteration scans of
progressively larger bodies, so per-op dispatch noise amortizes and the
marginal cost of each piece is the difference between rows."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def timeit(fn, *args, reps=5):
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
    ITERS = 15
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A = jax.random.normal(k1, (B, n, n)) / jnp.sqrt(n)
    H = jnp.einsum("bij,bkj->bik", A, A) + 0.5 * jnp.eye(n)
    C = jax.random.normal(k2, (B, m, n))
    d0 = jax.random.uniform(k3, (B, m), minval=0.1, maxval=10.0)
    r0 = jax.random.normal(k4, (B, n))
    print("device:", jax.devices()[0], " B =", B, " iters =", ITERS,
          flush=True)

    def scan15(body_one):
        def prog(H, C, d0, r0):
            def body(carry, _):
                d, r = carry
                out = body_one(H, C, d, r)
                # perturb carry so nothing is loop-invariant
                pert = out.reshape(-1)[:r.shape[0]] * 1e-6 + r
                return (d * 1.000001, pert), out
            (_, _), outs = jax.lax.scan(body, (d0, r0), None, length=ITERS)
            return outs
        return jax.jit(jax.vmap(prog, in_axes=(0, 0, 0, 0)))

    def ctdc(H, C, d, r):
        return H + _mm(C.T * d, C)

    def ctdc_chol(H, C, d, r):
        M = ctdc(H, C, d, r)
        return cho_factor(M)[0]

    def ctdc_chol_4solve(H, C, d, r):
        M = ctdc(H, C, d, r)
        ch = cho_factor(M)
        x = r
        for _ in range(4):
            x = cho_solve(ch, x + r)
        return x[None, :] * jnp.ones((n, 1))

    def ctdc_chol_inv(H, C, d, r):
        M = ctdc(H, C, d, r)
        ch = cho_factor(M)
        Minv = cho_solve(ch, jnp.eye(n, dtype=H.dtype))
        x = r
        for _ in range(6):
            x = _mm(Minv, x + r)
        return Minv

    def ctdc_inv_linalg(H, C, d, r):
        M = ctdc(H, C, d, r)
        return jnp.linalg.inv(M)

    rows = [
        ("ctdc only", scan15(ctdc)),
        ("ctdc+chol", scan15(ctdc_chol)),
        ("ctdc+chol+4 vec solves", scan15(ctdc_chol_4solve)),
        ("ctdc+chol+explicit inv", scan15(ctdc_chol_inv)),
        ("ctdc+linalg.inv", scan15(ctdc_inv_linalg)),
    ]
    for name, f in rows:
        t = timeit(f, H, C, d0, r0)
        print(f"{name:26s}: {t:8.2f} ms ({t / ITERS:6.2f} ms/iter)",
              flush=True)


if __name__ == "__main__":
    main()
