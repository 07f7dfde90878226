"""Unit tests for ops/batched_chol — the blocked, matmul-shaped SPD
factorization/inversion that replaces XLA's substitution-loop lowering in
the interior-point Newton solve (ops/pdip.py, PDIPSettings.inv_method)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmpc_tpu.ops import batched_chol as bc


@pytest.fixture()
def x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.mark.parametrize("n,nb,B", [(320, 32, 3), (320, 64, 2), (64, 32, 2)])
def test_blocked_cholesky_matches_numpy(n, nb, B, x64):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, n, n)).astype(np.float64) * 0.1
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 10.0 * np.eye(n))
    L, _ = bc.blocked_cholesky(M, nb)
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(M),
                               atol=1e-12)


@pytest.mark.parametrize("n,nb", [(320, 64), (96, 32)])
def test_spd_inverse_exact(n, nb, x64):
    rng = np.random.default_rng(1)
    A = rng.normal(size=(2, n, n)).astype(np.float64) * 0.1
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 5.0 * np.eye(n))
    Minv = bc.spd_inverse(M, nb)
    np.testing.assert_allclose(np.asarray(Minv), np.linalg.inv(M),
                               atol=1e-12)


def test_spd_inverse_any_pads_and_unbatches(x64):
    """Non-multiple n (the soft/elastic QP is 331-dim) and bare (n, n)
    inputs go through the identity-padding path."""
    rng = np.random.default_rng(2)
    n = 75
    A = rng.normal(size=(n, n)).astype(np.float64) * 0.1
    M = jnp.asarray(A @ A.T + 5.0 * np.eye(n))
    Minv = bc.spd_inverse_any(M, nb=32)
    assert Minv.shape == (n, n)
    np.testing.assert_allclose(np.asarray(Minv), np.linalg.inv(M),
                               atol=1e-12)


def test_f32_ill_conditioned():
    """The pdip endgame Newton matrix carries a ~1e6 complementarity
    spread (d_clip); the blocked inverse must stay usable in f32 there
    (one refinement pass then recovers full accuracy, ops/pdip.py)."""
    rng = np.random.default_rng(3)
    n = 320
    A = rng.normal(size=(2, n, n)).astype(np.float32) * 0.1
    d = (10.0 ** rng.uniform(-1, 5, size=(2, n))).astype(np.float32)
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                    + np.einsum("bi,ij->bij", d, np.eye(n, dtype=np.float32)))
    Minv = bc.spd_inverse(M.astype(jnp.float32), nb=64)
    ref = np.linalg.inv(np.asarray(M, np.float64))
    rel = np.abs(np.asarray(Minv, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 1e-4, rel


def test_vmap_composes():
    """pdip calls the inverse per-sample under vmap; the flattening in
    spd_inverse_any must compose with an outer batch axis."""
    rng = np.random.default_rng(4)
    n, B = 64, 3
    A = rng.normal(size=(B, n, n)).astype(np.float32) * 0.1
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 5.0 * np.eye(n, dtype=np.float32))
    out = jax.vmap(lambda m: bc.spd_inverse_any(m, nb=32))(M)
    np.testing.assert_allclose(
        np.asarray(out), np.linalg.inv(np.asarray(M, np.float64)),
        atol=1e-3)


def test_pallas_tile_chol_parity_interpret():
    """ADVICE r4 (medium): the production bench path dispatches the tile
    factor to _chol_tile_pallas on TPU, but CPU tests only ever exercised
    the scan path — a subtly wrong kernel would surface only as a bench
    residual drift.  Pin the kernel's numerics against the scan path in
    Pallas interpret mode (bit-for-bit the same algorithm, minus Mosaic
    lowering) on random SPD tiles at the production lane layout."""
    rng = np.random.default_rng(7)
    B, nb = 128, 64
    A = rng.normal(size=(B, nb, nb)).astype(np.float32) * 0.3
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 5.0 * np.eye(nb,
                                                            dtype=np.float32))
    L_scan = bc._chol_tile(M)
    L_pal = bc._chol_tile_pallas(M, interpret=True)
    np.testing.assert_allclose(np.asarray(L_pal), np.asarray(L_scan),
                               rtol=2e-5, atol=2e-5)


def test_tri_inv_blocksub_matches_neumann(x64):
    """The block-forward-substitution inverse (production) must equal the
    Neumann-product inverse (reference implementation) exactly."""
    rng = np.random.default_rng(3)
    B, n, nb = 2, 320, 64
    A = rng.normal(size=(B, n, n)) * 0.1
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 10.0 * np.eye(n))
    L, Dinv = bc.blocked_cholesky(M, nb)
    X_sub = bc.tri_inv_blocksub(L, Dinv)
    X_neu = bc.tri_inv_blocked(L, Dinv)
    np.testing.assert_allclose(np.asarray(X_sub), np.asarray(X_neu),
                               atol=1e-11)
