"""Rigid-body layer tests: internal consistency (energy, gradients,
finite differences) plus parity facts recorded from the reference's DART
simulation (SURVEY.md §2.1 robot-model row; Debug traces)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_tpu.rbd import algorithms as rbd
from cmpc_tpu.rbd.urdf import load_hrp4
from cmpc_tpu.wholebody.setup import initial_q


@pytest.fixture(autouse=True, scope="module")
def _x64():
    """These consistency checks assert f64-level tolerances.  Toggled per
    module (NOT at import time — pytest imports every test module before
    running any test, and a global flip would retrace other modules' f32
    scans with f64 leaves, breaking their carry dtypes)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.fixture(scope="module")
def model():
    return load_hrp4()


def rand_state(model, seed=0, vel_scale=1.0):
    rng = np.random.default_rng(seed)
    q = rbd.RobotQ(
        base_pos=jnp.asarray(rng.normal(size=3) * 0.2),
        base_rot=jnp.asarray(
            np.linalg.qr(rng.normal(size=(3, 3)))[0]
            * np.sign(np.linalg.det(np.linalg.qr(
                rng.normal(size=(3, 3)))[0]))),
        qj=jnp.asarray(rng.normal(size=model.nj) * 0.4))
    # ensure proper rotation
    R = np.asarray(q.base_rot)
    if np.linalg.det(R) < 0:
        R = R @ np.diag([1, 1, -1])
    q = q._replace(base_rot=jnp.asarray(R))
    qv = jnp.asarray(rng.normal(size=model.nv) * vel_scale)
    return q, qv


def test_total_mass(model):
    # SURVEY.md §2.1: HRP-4 total mass ~= 40.05 kg
    assert abs(model.total_mass - 40.05) < 0.01


def test_initial_pose_parity(model):
    """After the reference's initial configuration + ground placement, the
    sole frames sit at y = +-0.10163857... (config.DEFAULT_FOOT_Y, recorded
    from the reference's Debug/'Pos Lfoot pre trj' row 0)."""
    q = initial_q(model)
    f = rbd.fk(model, q)
    _, pl = rbd.site_pose(model, f, "l_sole")
    _, pr = rbd.site_pose(model, f, "r_sole")
    np.testing.assert_allclose(float(pl[1]), 0.10163857612916291, atol=2e-6)
    np.testing.assert_allclose(float(pr[1]), -0.10163857612916291, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pl)[[0, 2]], 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pr)[[0, 2]], 0.0, atol=1e-9)
    # CoM height around the 0.72 m the controller regulates to (+- 5 cm)
    c = rbd.com(model, f)
    assert 0.65 < float(c[2]) < 0.80


def test_mass_matrix_spd_and_kinetic_energy(model):
    q, qv = rand_state(model, seed=1)
    f = rbd.fk(model, q)
    M = rbd.mass_matrix(model, f)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)
    # 1/2 qv' M qv == sum of body kinetic energies from propagated velocities
    vel = rbd.velocities(model, f, qv)
    ke_bodies = 0.5 * float(
        jnp.sum(jnp.asarray(model.mass)
                * jnp.sum(vel.v_com ** 2, axis=1))
        + jnp.sum(vel.omega * jnp.einsum("bij,bj->bi", f.I_w, vel.omega)))
    ke_M = 0.5 * float(qv @ M @ qv)
    np.testing.assert_allclose(ke_M, ke_bodies, rtol=1e-10)


def test_gravity_forces_match_potential_gradient(model):
    """h(q, 0) must equal dV/dq with V = sum_b m_b g z_com_b (joint columns
    exactly; base linear columns = total weight)."""
    g = 9.81
    q, _ = rand_state(model, seed=2)
    f = rbd.fk(model, q)
    h0 = rbd.bias_forces(model, f, jnp.zeros(model.nv), g=g)

    def V(qj):
        fj = rbd.fk(model, q._replace(qj=qj))
        return jnp.sum(jnp.asarray(model.mass) * g * fj.com_w[:, 2])

    dV = jax.grad(V)(q.qj)
    np.testing.assert_allclose(np.asarray(h0[6:]), np.asarray(dV),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(h0[3:6]),
                               [0.0, 0.0, model.total_mass * g], rtol=1e-10)


def test_bias_forces_energy_consistency(model):
    """Without gravity and torques, power qv' M qdd must equal -1/2 qv'
    Mdot qv  (d/dt KE = 0): validates the Coriolis part of h against M."""
    q, qv = rand_state(model, seed=3)
    f = rbd.fk(model, q)
    M = rbd.mass_matrix(model, f)
    h = rbd.bias_forces(model, f, qv, g=0.0)
    qdd = jnp.linalg.solve(M, -h)

    eps = 1e-6
    qe, qve = rbd.integrate(q, qv, qdd, eps)
    Me = rbd.mass_matrix(model, rbd.fk(model, qe))
    ke0 = 0.5 * float(qv @ M @ qv)
    ke1 = 0.5 * float(qve @ Me @ qve)
    # relative energy drift over eps must be O(eps^2)
    assert abs(ke1 - ke0) / max(ke0, 1.0) < 5e-5


def test_site_jacobian_matches_fd(model):
    """J qv == finite-difference site velocity under integrate()."""
    q, qv = rand_state(model, seed=4, vel_scale=0.5)
    f = rbd.fk(model, q)
    om, v = rbd.site_velocity(model, f, qv, "l_sole")

    eps = 1e-7
    qe, _ = rbd.integrate(q, qv, jnp.zeros(model.nv), eps)
    f2 = rbd.fk(model, qe)
    R1, p1 = rbd.site_pose(model, f, "l_sole")
    R2, p2 = rbd.site_pose(model, f2, "l_sole")
    v_fd = (p2 - p1) / eps
    dR = np.asarray(R2 @ R1.T)
    om_fd = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                      dR[1, 0] - dR[0, 1]]) / (2 * eps)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_fd),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(om), om_fd, rtol=1e-4, atol=1e-6)


def test_com_jacobian(model):
    q, qv = rand_state(model, seed=5)
    f = rbd.fk(model, q)
    Jc = rbd.com_jacobian(model, f)
    vel = rbd.velocities(model, f, qv)
    v_com_direct = (jnp.einsum("b,bi->i", jnp.asarray(model.mass),
                               vel.v_com) / model.total_mass)
    np.testing.assert_allclose(np.asarray(Jc @ qv),
                               np.asarray(v_com_direct), rtol=1e-10)


def test_centroidal_momentum_free_fall_invariant(model):
    """In free fall (no contacts, no torques) the centroidal angular
    momentum is conserved: validates momentum against the dynamics."""
    g = 9.81
    q, qv = rand_state(model, seed=6, vel_scale=0.3)
    f = rbd.fk(model, q)
    hw0, _ = rbd.centroidal_momentum(model, f, qv)

    dt = 2e-4
    for _ in range(10):
        qdd = rbd.forward_dynamics(model, q, qv, jnp.zeros(model.nj), (),
                                   g=g)
        q, qv = rbd.integrate(q, qv, qdd, dt)
    f = rbd.fk(model, q)
    hw1, _ = rbd.centroidal_momentum(model, f, qv)
    np.testing.assert_allclose(np.asarray(hw1), np.asarray(hw0), atol=5e-4)


def test_forward_dynamics_static_equilibrium(model):
    """Gravity-compensating torques + matching sole wrenches must produce
    ~zero acceleration (checks S, contact Jacobian transposes, h)."""
    g = 9.81
    model_ = model
    q = initial_q(model_)
    f = rbd.fk(model_, q)
    h = rbd.bias_forces(model_, f, jnp.zeros(model_.nv), g=g)
    Jl = rbd.site_jacobian(model_, f, "l_sole")
    Jr = rbd.site_jacobian(model_, f, "r_sole")
    # wrenches that exactly balance the (unactuated) base rows:
    # [Jl^T Jr^T]_base @ [wl; wr] = h_base  (12 unknowns, 6 equations)
    A = jnp.hstack([Jl[:, 0:6].T, Jr[:, 0:6].T])
    w, *_ = jnp.linalg.lstsq(A, h[0:6])
    wl, wr = w[:6], w[6:]
    # torques from the joint rows of the dynamics equality at qdd = 0
    tau = (h - Jl.T @ wl - Jr.T @ wr)[6:]
    qdd = rbd.forward_dynamics(model_, q, jnp.zeros(model_.nv), tau,
                               (("l_sole", wl), ("r_sole", wr)), g=g)
    assert float(jnp.max(jnp.abs(qdd))) < 1e-6


def test_vmap_and_jit(model):
    """The whole stack must vmap and jit cleanly."""
    B = 4
    rng = np.random.default_rng(7)
    qj = jnp.asarray(rng.normal(size=(B, model.nj)) * 0.3)
    qv = jnp.asarray(rng.normal(size=(B, model.nv)) * 0.3)

    @jax.jit
    @jax.vmap
    def f(qj, qv):
        q = rbd.RobotQ(base_pos=jnp.zeros(3), base_rot=jnp.eye(3), qj=qj)
        fkr = rbd.fk(model, q)
        M = rbd.mass_matrix(model, fkr)
        h = rbd.bias_forces(model, fkr, qv)
        return jnp.linalg.solve(M, -h)

    out = f(qj, qv)
    assert out.shape == (B, model.nv)
    assert np.all(np.isfinite(np.asarray(out)))
