"""Multi-process (DCN-path) execution of the sharded scenario sweep.

VERDICT r3 next #8: parallel/mesh.py's multi-host claim was a docstring.
This test launches TWO OS processes, each with 2 virtual CPU devices,
joined by ``jax.distributed.initialize`` — the same mechanism that spans
TPU hosts over DCN — and runs `parallel/mesh.sweep` on a 4-device global
mesh whose psum reductions cross the process boundary.

Pass criteria: both processes complete, report the full global scenario
count, and agree on every reduced statistic (the collectives make the
stats replicated across hosts — disagreement means the DCN reduction is
broken).
"""

import json
import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_sweep():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            cwd=root, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    a, b = sorted(outs, key=lambda o: o["process"])
    assert a["process"] == 0 and b["process"] == 1
    # the sweep saw the GLOBAL batch (2 scenarios per device, 4 devices)
    assert a["n"] == b["n"] == 8.0
    # replicated collectives: every host holds identical reduced stats
    for key in ("com_rmse_xy", "max_tilt", "mean_lyap_violation",
                "mean_r_prim"):
        assert a[key] == b[key], (key, a[key], b[key])
        assert 0.0 <= a[key] < 10.0, (key, a[key])
