"""Trace capture, persistence and summary metrics.

The TPU-native re-design of the reference's observability layer
(SURVEY.md §2.1 L5: logger.py / logger2.py / logger3.py / logger_theta.py
append-to-python-list logging + Debug/* text dumps).  Rollouts already
return every logged quantity as stacked arrays (sim/closed_loop.Trace,
sim/wholebody_loop.WBTrace); this module gives them a stable on-disk form:

* :func:`save` / :func:`load` — one compressed .npz per run, with the
  pytree field names preserved (the reference's 12 ad-hoc Debug text files
  become one artifact).
* :func:`summarize` — the quantitative health metrics the reference only
  eyeballed on live plots: CoM tracking RMSE/max, angular-momentum RMS,
  solver residual percentiles, adaptation-event ticks.

Device-transfer note: summaries reduce on device and fetch scalars; `save`
is the only bulk device->host copy and is meant for post-run analysis on
CPU hosts (the tunneled-TPU path keeps traces on device).
"""

from __future__ import annotations

import json
import os
from typing import Any, NamedTuple

import jax
import numpy as np


def _flatten(tr: Any, prefix: str = "") -> dict:
    out = {}
    if hasattr(tr, "_asdict"):
        items = tr._asdict().items()
    elif isinstance(tr, dict):
        items = tr.items()
    else:
        return {prefix.rstrip("/"): np.asarray(tr)}
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def save(path: str, trace: Any, meta: dict | None = None) -> None:
    """Persist a rollout trace pytree (NamedTuple/dict of arrays) to .npz
    (+ sidecar .json for run metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(trace)
    np.savez_compressed(path, **flat)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load(path: str) -> dict:
    """Load a saved trace as {field: np.ndarray} (nested names use '/')."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


class TraceSummary(NamedTuple):
    ticks: int
    com_rmse_xy: float
    com_max_err_xy: float
    com_z_drift: float
    hw_rms: float
    r_prim_p50: float
    r_prim_p99: float
    adaptation_ticks: tuple
    fell: bool


def summarize(trace: Any, fall_threshold: float = 0.3) -> TraceSummary:
    """Health metrics from a rollout trace (works for both loop flavors)."""
    tr = trace._asdict() if hasattr(trace, "_asdict") else dict(trace)
    com = np.asarray(tr["com_pos"])
    ref = np.asarray(tr["com_ref"])
    err = np.linalg.norm(com[:, :2] - ref[:, :2], axis=-1)
    hw = np.asarray(tr["hw"])
    if "r_prim" in tr:
        r_prim = np.asarray(tr["r_prim"])
    elif "r_prim_mpc" in tr:
        r_prim = np.asarray(tr["r_prim_mpc"])
    else:
        raise KeyError(
            "trace has neither 'r_prim' nor 'r_prim_mpc'; summarize() "
            "needs solver residuals to report accuracy percentiles")
    adapted = np.asarray(tr.get("adapted", np.zeros(len(com), bool)))
    return TraceSummary(
        ticks=int(com.shape[0]),
        com_rmse_xy=float(np.sqrt(np.mean(err ** 2))),
        com_max_err_xy=float(err.max()),
        com_z_drift=float(np.abs(com[:, 2] - com[0, 2]).max()),
        hw_rms=float(np.sqrt(np.mean(np.sum(hw ** 2, axis=-1)))),
        r_prim_p50=float(np.percentile(r_prim, 50)),
        r_prim_p99=float(np.percentile(r_prim, 99)),
        adaptation_ticks=tuple(np.nonzero(adapted)[0].tolist()),
        fell=bool(err.max() > fall_threshold),
    )
