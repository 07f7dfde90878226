"""Whole-body layer tests: ID QP torques + contact plant close the loop.

The reference validates this layer only by watching the robot walk in the
DART GUI; here the acceptance is quantitative: the ID controller must hold
the robot in double-support balance on the penalty-contact plant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_tpu.rbd import algorithms as rbd
from cmpc_tpu.rbd.urdf import load_hrp4
from cmpc_tpu.wholebody import inverse_dynamics as wbid
from cmpc_tpu.wholebody import plant as wbplant
from cmpc_tpu.wholebody.setup import initial_q
from cmpc_tpu.wholebody.state import retrieve_state


@pytest.fixture(autouse=True, scope="module")
def _x64():
    """Toggled per module, not at import time (see tests/test_rbd.py)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.fixture(scope="module")
def model():
    return load_hrp4()


def standing_state(model):
    q = initial_q(model)
    # settle onto the penalty springs: weight ~393 N over 8 corners at
    # kn=4e4 each => ~1.2 mm static penetration
    q = q._replace(base_pos=q.base_pos + jnp.array([0.0, 0.0, -0.0012]))
    return wbplant.WBPlantState(q=q, qv=jnp.zeros(model.nv))


def make_desired(model, st):
    """Hold the current measured state (zero vel/acc targets)."""
    z3, z6 = jnp.zeros(3), jnp.zeros(6)
    return wbid.WBDesired(
        pose_l=st.pose_l, vel_l=z6, acc_l=z6,
        pose_r=st.pose_r, vel_r=z6, acc_r=z6,
        com_pos=st.com_pos, com_vel=z3, com_acc=z3,
        torso_rotvec=st.torso_rotvec, torso_omega=z3, torso_alpha=z3,
        base_rotvec=st.base_rotvec, base_omega=z3, base_alpha=z3,
        joint_pos=st.joint_pos)


def test_id_standing_torques_sane(model):
    """Double-support, desired == current: the QP must return torques that
    nearly satisfy the dynamics equality with modest magnitudes."""
    ps = standing_state(model)
    st = retrieve_state(model, ps.q, ps.qv)
    desired = make_desired(model, st)
    tau, res = wbid.joint_torques(model, ps.q, ps.qv, desired, st,
                                  contact_l=1.0, contact_r=1.0)
    tau = np.asarray(tau)
    assert tau.shape == (model.nj,)
    assert np.all(np.isfinite(tau))
    # knee/hip torques at stance are tens of N m on a 40 kg biped
    assert np.max(np.abs(tau)) < 150.0
    assert float(res.r_prim) < 1e-2


def test_standing_balance_closed_loop(model):
    """ID + plant must keep the robot standing for 0.5 s of simulation
    (50 control ticks): CoM height within 2 cm, no drift blow-up."""
    ps = standing_state(model)
    st0 = retrieve_state(model, ps.q, ps.qv)
    desired = make_desired(model, st0)
    com0 = np.asarray(st0.com_pos)

    @jax.jit
    def tick(ps):
        st = retrieve_state(model, ps.q, ps.qv)
        tau, _ = wbid.joint_torques(model, ps.q, ps.qv, desired, st,
                                    contact_l=1.0, contact_r=1.0)
        return wbplant.wb_plant_step(model, ps, tau), st

    for _ in range(50):
        ps, st = tick(ps)

    st = retrieve_state(model, ps.q, ps.qv)
    com = np.asarray(st.com_pos)
    assert np.all(np.isfinite(np.asarray(ps.qv)))
    assert abs(com[2] - com0[2]) < 0.02
    assert np.linalg.norm(com[:2] - com0[:2]) < 0.03
    # base stays upright
    assert np.linalg.norm(np.asarray(st.base_rotvec)) < 0.15


def test_plant_drop_settles(model):
    """Drop from 5 mm above ground with zero torque: feet must make contact
    and vertical velocity must decay (contact model dissipates)."""
    q = initial_q(model)
    q = q._replace(base_pos=q.base_pos + jnp.array([0.0, 0.0, 0.005]))
    ps = wbplant.WBPlantState(q=q, qv=jnp.zeros(model.nv))

    @jax.jit
    def tick(ps):
        return wbplant.wb_plant_step(model, ps, jnp.zeros(model.nj))

    for _ in range(30):
        ps = tick(ps)
    # no explosion; robot is near/on the ground, not falling through
    f = rbd.fk(model, ps.q)
    _, pl = rbd.site_pose(model, f, "l_sole")
    assert np.isfinite(np.asarray(ps.qv)).all()
    assert -0.02 < float(pl[2]) < 0.02


def test_id_vmaps(model):
    """The ID solve must vmap over a batch of robots."""
    ps = standing_state(model)
    st = retrieve_state(model, ps.q, ps.qv)
    desired = make_desired(model, st)
    B = 3
    qjs = jnp.stack([ps.q.qj + 0.001 * i for i in range(B)])

    @jax.jit
    @jax.vmap
    def solve(qj):
        q = ps.q._replace(qj=qj)
        stb = retrieve_state(model, q, ps.qv)
        tau, _ = wbid.joint_torques(model, q, ps.qv, desired, stb,
                                    contact_l=1.0, contact_r=1.0)
        return tau

    taus = solve(qjs)
    assert taus.shape == (B, model.nj)
    assert np.all(np.isfinite(np.asarray(taus)))
