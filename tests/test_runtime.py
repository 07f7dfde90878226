"""Runtime subsystems: trace save/load/summarize, checkpoint/resume,
offline plots (the formalization of the reference's logger/debug-dump
validation, SURVEY.md §4)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_tpu.runtime import checkpoint, plots, trace


def _fake_trace(T=50):
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.01)
    from cmpc_tpu.sim.closed_loop import Trace
    return Trace(
        com_pos=mk(T, 3) + jnp.asarray([0, 0, 0.72]),
        com_vel=mk(T, 3), com_pos_des=mk(T, 3), com_acc_des=mk(T, 3),
        com_ref=mk(T, 3) + jnp.asarray([0, 0, 0.72]),
        hw=mk(T, 3), hw_des=mk(T, 3), theta_hat=mk(T, 3),
        pose_l=mk(T, 6), pose_r=mk(T, 6), forces=mk(T, 24),
        mpc_contact_l=mk(T, 3), mpc_contact_r=mk(T, 3),
        r_prim=jnp.abs(mk(T)), lyap_violation=jnp.abs(mk(T)),
        adapted=jnp.zeros(T, bool).at[jnp.asarray([10, 20])].set(True),
        x0=mk(T, 20))


def test_trace_save_load_roundtrip(tmp_path):
    tr = _fake_trace()
    p = str(tmp_path / "trace.npz")
    trace.save(p, tr, meta={"run": "test"})
    loaded = trace.load(p)
    np.testing.assert_allclose(loaded["com_pos"], np.asarray(tr.com_pos))
    assert os.path.exists(p + ".json")


def test_trace_summary():
    tr = _fake_trace()
    s = trace.summarize(tr)
    assert s.ticks == 50
    assert s.adaptation_ticks == (10, 20)
    assert not s.fell
    assert s.com_rmse_xy < 0.1


def test_checkpoint_roundtrip(tmp_path):
    from cmpc_tpu.ops.sqp import SolverState
    tree = {"solver": SolverState(z=jnp.arange(5.0), y=jnp.ones(3)),
            "key": jnp.asarray([1, 2], jnp.uint32),
            "stats": (jnp.asarray(1.5), jnp.asarray(7))}
    p = str(tmp_path / "ckpt_3.npz")
    checkpoint.save(p, tree, step=3)
    like = {"solver": SolverState(z=jnp.zeros(5), y=jnp.zeros(3)),
            "key": jnp.zeros(2, jnp.uint32),
            "stats": (jnp.asarray(0.0), jnp.asarray(0))}
    restored, step = checkpoint.restore(p, like)
    assert step == 3
    np.testing.assert_allclose(np.asarray(restored["solver"].z),
                               np.arange(5.0))
    assert checkpoint.latest(str(tmp_path)) == p


def test_checkpoint_structure_mismatch(tmp_path):
    p = str(tmp_path / "ckpt_0.npz")
    checkpoint.save(p, {"a": jnp.zeros(2)})
    with pytest.raises(KeyError):
        checkpoint.restore(p, {"b": jnp.zeros(2)})


def test_plots_render(tmp_path):
    tr = _fake_trace()
    flat = {k: np.asarray(v) for k, v in tr._asdict().items()}
    paths = plots.plot_all(flat, str(tmp_path / "plots"),
                           plan_pos=np.zeros((4, 3)))
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000
