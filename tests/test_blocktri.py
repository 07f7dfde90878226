"""Stage-structured linear algebra: the OCP matrices must be exactly
block-tridiagonal in stage-major order, and the block Cholesky solve must
match the dense solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.ocp import problem
from cmpc_tpu.ops import blocktri

from tests.test_ocp_solver import make_params


@pytest.fixture(autouse=True, scope="module")
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.mark.parametrize("seed", [0, 1])
def test_structure_and_solve(seed):
    cfg = WalkConfig()
    sp = blocktri.stage_perm(cfg.N)
    p = make_params(cfg, jax.random.PRNGKey(seed), standing=(seed == 0))
    z = 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 3), (cfg.n_z,))
    P, q = problem.cost_quadratic(p, cfg)
    c, J = problem.linearize(z, p, cfg)
    m = J.shape[0]
    rho = jnp.where(jnp.arange(m) < 20 * (cfg.N + 1), 1e3, 10.0)
    sigma = 1e-4
    M = P + sigma * jnp.eye(cfg.n_z) + (J.T * rho) @ J

    # structure: no coupling beyond adjacent stages
    Mp = np.asarray(M)[sp.perm][:, sp.perm]
    w = sp.width
    for i in range(sp.n_stages):
        for j in range(sp.n_stages):
            if abs(i - j) > 1:
                blk = Mp[i * w:min((i + 1) * w, sp.n),
                         j * w:min((j + 1) * w, sp.n)]
                assert np.abs(blk).max() == 0.0, (i, j)

    D, O = blocktri.build_blocks(P, J, rho, sigma, sp)
    fac = blocktri.factor(D, O)
    b = jax.random.normal(jax.random.PRNGKey(seed + 9), (cfg.n_z,))
    x_bt = blocktri.solve(fac, b, sp)
    x_ref = jnp.linalg.solve(M, b)
    np.testing.assert_allclose(np.asarray(x_bt), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-10)


def test_vmap_batch():
    cfg = WalkConfig()
    sp = blocktri.stage_perm(cfg.N)
    B = 3
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    @jax.jit
    @jax.vmap
    def solve_one(key):
        p = make_params(cfg, key, standing=True)
        z = jnp.zeros(cfg.n_z)
        P, q = problem.cost_quadratic(p, cfg)
        _, J = problem.linearize(z, p, cfg)
        rho = jnp.full(J.shape[0], 10.0)
        D, O = blocktri.build_blocks(P, J, rho, 1e-4, sp)
        fac = blocktri.factor(D, O)
        return blocktri.solve(fac, q, sp)

    out = solve_one(keys)
    assert out.shape == (B, cfg.n_z)
    assert np.isfinite(np.asarray(out)).all()


def test_blocktri_f32_residual():
    """ADVICE.md (round 1): the production MPC path runs the block solve in
    f32 on TPU (sigma=1e-6 + prox); assert the f32 relative residual stays
    small at bench-like conditioning so an f32 regression is caught on CPU.

    The module fixture enables x64 for the other tests; this one must run
    in strict f32, so it locally disables it (restored on exit)."""
    jax.config.update("jax_enable_x64", False)
    try:
        _f32_body()
    finally:
        jax.config.update("jax_enable_x64", True)


def _f32_body():
    cfg = WalkConfig()
    sp = blocktri.stage_perm(cfg.N)
    p = make_params(cfg, jax.random.PRNGKey(2), standing=False)
    p32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype=jnp.float32), p)
    z = jnp.zeros(cfg.n_z, jnp.float32).at[:20].set(p32.x0)
    P, q = problem.cost_quadratic(p32, cfg)
    c, J = problem.linearize(z, p32, cfg)
    m = J.shape[0]
    rho = jnp.where(jnp.arange(m) < 20 * (cfg.N + 1), 1e3, 10.0)
    # bench-like: sigma 1e-6 plus the SQP prox term on the diagonal
    sigma = 1e-6 + cfg.sqp_prox
    M = (P + sigma * jnp.eye(cfg.n_z, dtype=jnp.float32)
         + (J.T * rho) @ J).astype(jnp.float32)
    D, O = blocktri.build_blocks(P, J, rho, sigma, sp)
    fac = blocktri.factor(D, O)
    b = jnp.asarray(
        np.random.default_rng(5).normal(size=cfg.n_z), jnp.float32)
    x = blocktri.solve(fac, b, sp)
    assert x.dtype == jnp.float32
    rel = float(jnp.linalg.norm(M @ x - b) / jnp.linalg.norm(b))
    assert rel < 1e-4, rel
