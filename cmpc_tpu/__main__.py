"""Command-line runner: `python -m cmpc_tpu <command>`.

The reference's only entry point is `python3 code/simulation.py`, which
opens a GUI and waits for a keypress (code/README.md:24-28).  This CLI is
its headless, batched equivalent:

  walk     one closed-loop scenario on the centroidal plant -> trace,
           plots, summary (the flat-ground walk of simulation.py, or
           --payload for simulation_payload.py).
  walk-wb  the same scenario through the full whole-body pipeline
           (MPC -> ID -> articulated contact plant).
  sweep    a randomized Monte-Carlo robustness sweep sharded over all
           local devices (new capability; SURVEY.md §2.5).
  ismpc    the legacy IS-MPC/LIP baseline closed loop (original_code/).
"""

from __future__ import annotations

import argparse
import json
import time


def _common(p):
    p.add_argument("--out", default="runs/latest",
                   help="output directory for trace/plots/summary")
    p.add_argument("--ticks", type=int, default=None,
                   help="simulation ticks (default: full walk)")
    p.add_argument("--steps", type=int, default=20, help="footstep count")
    p.add_argument("--payload", action="store_true",
                   help="payload scenario (2 kg box, gains k1=7 k2=1)")
    p.add_argument("--push", type=float, nargs=3, default=None,
                   metavar=("FX", "FY", "FZ"),
                   help="external push force N (default: reference's "
                        "[0,3,0] for t in (800,900))")
    p.add_argument("--plots", action="store_true", help="render plots")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cmpc_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("walk", "walk-wb"):
        _common(sub.add_parser(name))
    sp = sub.add_parser("sweep")
    sp.add_argument("--out", default="runs/sweep")
    sp.add_argument("--n", type=int, default=64, help="scenario count")
    sp.add_argument("--ticks", type=int, default=400)
    sp.add_argument("--seed", type=int, default=0)
    ip = sub.add_parser("ismpc")
    ip.add_argument("--out", default="runs/ismpc")
    ip.add_argument("--ticks", type=int, default=500)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmpc_tpu.config import (WalkConfig, nominal_scenario,
                                 payload_scenario)
    from cmpc_tpu.runtime import plots as rplots
    from cmpc_tpu.runtime import trace as rtrace

    t0 = time.time()
    if args.cmd in ("walk", "walk-wb"):
        cfg = WalkConfig(num_steps=args.steps)
        if args.payload:
            sc = payload_scenario(cfg)
            if args.push is not None:
                # payload_scenario defaults to no push; combine both flags
                sc = sc._replace(
                    push_force=jnp.asarray(args.push, dtype=jnp.float32),
                    push_start=jnp.asarray(801), push_end=jnp.asarray(899))
        elif args.push is not None:
            sc = nominal_scenario(cfg, push=tuple(args.push))
        else:
            sc = nominal_scenario(cfg)
        if args.cmd == "walk":
            from cmpc_tpu.sim import closed_loop
            _, tr = jax.jit(lambda s: closed_loop.rollout(
                s, cfg, T_sim=args.ticks))(sc)
        else:
            from cmpc_tpu.rbd.urdf import load_hrp4
            from cmpc_tpu.sim import wholebody_loop
            model = load_hrp4(payload=False)
            _, tr = jax.jit(lambda s: wholebody_loop.rollout(
                model, s, cfg, T_sim=args.ticks))(sc)
        summary = rtrace.summarize(tr)
        rtrace.save(f"{args.out}/trace.npz", tr,
                    meta={"cmd": args.cmd, "cfg": str(cfg),
                          "wall_s": time.time() - t0,
                          "summary": summary._asdict()})
        if args.plots:
            flat = {k: np.asarray(v) for k, v in tr._asdict().items()}
            rplots.plot_all(flat, args.out)
        print(json.dumps(summary._asdict()))

    elif args.cmd == "sweep":
        from cmpc_tpu.parallel import mesh as pmesh
        cfg = WalkConfig(sqp_iters=2, admm_iters=15)
        m = pmesh.make_mesh()
        n = max(args.n, len(jax.devices()))
        n -= n % len(jax.devices())
        batch = pmesh.shard_scenarios(pmesh.make_batch(cfg, n=n,
                                                       seed=args.seed), m)
        stats = pmesh.sweep(batch, cfg, T_sim=args.ticks, mesh=m)
        out = {k: float(v) for k, v in stats._asdict().items()}
        out["wall_s"] = time.time() - t0
        print(json.dumps(out))

    elif args.cmd == "ismpc":
        from cmpc_tpu.sim import ismpc_loop
        _, tr = ismpc_loop.run(T_sim=args.ticks)
        com = np.asarray(tr.com_pos)
        zmp = np.asarray(tr.zmp_pos)
        print(json.dumps({
            "ticks": int(com.shape[0]),
            "final_com": com[-1].tolist(),
            "zmp_span_y": float(zmp[:, 1].max() - zmp[:, 1].min()),
            "wall_s": time.time() - t0}))


if __name__ == "__main__":
    main()
