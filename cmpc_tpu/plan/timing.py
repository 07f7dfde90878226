"""Static gait timing tables.

The reference resolves "what step / phase / contact is active at tick t" with
Python loops over a list-of-dicts plan at every query
(footstep_planner_vertices.py:82-103).  Step *durations* are fixed by
construction (only step *positions* are adapted online,
centroidal_mpc_vertices.py:656-675), so the entire time structure of the walk
is known statically.  Here it is precomputed once, in numpy, into flat index
tables; everything traced (jit/vmap/scan) just gathers from them.

Tables have length ``cfg.pad_ticks`` (walk + horizon lookahead), so horizon
slices ``t + i*mpc_rate`` never go out of bounds — the reference would crash
past the end of the walk instead (SURVEY.md §2.2 quirks).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cmpc_tpu.config import WalkConfig


@dataclasses.dataclass(frozen=True)
class GaitTiming:
    """Immutable numpy tables. Fields of length S index footsteps; fields of
    length P = cfg.pad_ticks index control ticks."""

    # per step
    ss: np.ndarray           # (S,) single-support ticks
    ds: np.ndarray           # (S,) double-support ticks
    start: np.ndarray        # (S,) start tick of each step
    foot_is_left: np.ndarray  # (S,) True if plan[j] is a left-foot placement
    # per tick
    step_idx: np.ndarray     # (P,) active step index (clipped to S-1)
    t_in_step: np.ndarray    # (P,)
    is_ds: np.ndarray        # (P,) bool: double-support phase
    gamma_l: np.ndarray      # (P,) float: left-foot contact gate in {0,1}
    gamma_r: np.ndarray      # (P,)
    left_ref_idx: np.ndarray   # (P,) plan index of the left contact reference
    right_ref_idx: np.ndarray  # (P,)
    stance_left_idx: np.ndarray   # (P,) plan idx for x0 stance override
    stance_right_idx: np.ndarray  # (P,)
    update_event: np.ndarray  # (P,) bool: footstep-adaptation trigger tick
    adapt_target: np.ndarray  # (P,) plan index the adaptation writes (step+1)
    stance_from_table: np.ndarray  # (P,) bool: use static per-tick contact ref
    total_ticks: int

    @property
    def num_steps(self) -> int:
        return len(self.ss)


def _parity_pair(idx: np.ndarray, first_swing: str):
    """Contact-reference plan indices for (left, right) at step index `idx`.

    Reproduces the parity trick of gen_pos_contacts_ref_at_time
    (footstep_planner_vertices.py:106-147): plan entries whose index parity
    matches plan[0] belong to the `first_swing` foot.  The reference's
    `index < 2` special case is algebraically identical to the general
    formula, so a single expression covers both.
    """
    a = idx + (idx - 1) % 2   # odd-parity partner
    b = idx + idx % 2         # even-parity partner
    if first_swing == "rfoot":
        return a, b           # left gets odd plan entries, right gets even
    return b, a


def build_timing(cfg: WalkConfig) -> GaitTiming:
    S = cfg.num_steps
    scale = cfg.ss_duration + cfg.ds_duration
    ss = np.full(S, cfg.ss_duration, dtype=np.int32)
    ds = np.full(S, cfg.ds_duration, dtype=np.int32)
    # Step 0: long double support, no swing
    # (footstep_planner_vertices.py:28-31).
    ss[0] = 0
    ds[0] = 2 * scale
    dur = ss + ds
    start = np.concatenate([[0], np.cumsum(dur)[:-1]]).astype(np.int32)
    total = int(dur.sum())

    P = cfg.pad_ticks
    t = np.arange(P)
    # step index: number of steps fully elapsed before t (clipped at S-1)
    step_idx = np.minimum(np.searchsorted(np.cumsum(dur), t, side="right"),
                          S - 1).astype(np.int32)
    t_in_step = (t - start[step_idx]).astype(np.int32)
    is_ds = t_in_step >= ss[step_idx]

    # plan[0]'s foot is `first_swing` (footstep_planner_vertices.py:19,56-65);
    # feet alternate thereafter.
    idx = np.arange(S)
    foot_is_left = ((idx % 2 == 0) == (cfg.first_swing == "lfoot"))

    support_is_left = foot_is_left[step_idx]
    gamma_l = (is_ds | support_is_left).astype(np.float64)
    gamma_r = (is_ds | ~support_is_left).astype(np.float64)

    lref, rref = _parity_pair(step_idx, cfg.first_swing)
    lref = np.minimum(lref, S - 1).astype(np.int32)
    rref = np.minimum(rref, S - 1).astype(np.int32)

    # Stance-position override for the MPC initial state: for t below the
    # first-step duration the reference reads the static per-tick contact
    # reference (cutoff hard-coded as 200 = step-0 duration); after that it
    # looks the *live* plan up at t - ss_duration
    # (centroidal_mpc_vertices.py:493-509).
    cutoff = int(dur[0])
    stance_from_table = t < cutoff
    lag_idx = np.minimum(
        np.searchsorted(np.cumsum(dur), np.maximum(t - cfg.ss_duration, 0),
                        side="right"), S - 1).astype(np.int32)
    sl, sr = _parity_pair(lag_idx, cfg.first_swing)
    stance_left_idx = np.minimum(sl, S - 1).astype(np.int32)
    stance_right_idx = np.minimum(sr, S - 1).astype(np.int32)

    # Footstep-adaptation event: first tick of each step where phase(t)=='ss'
    # and phase(t + N*mpc_rate - 1)=='ds'; the edge flag resets during ds
    # (centroidal_mpc_vertices.py:656-675).  Static because timing is static.
    look = np.minimum(t + cfg.N * cfg.mpc_rate - 1, P - 1)
    cond = (~is_ds) & is_ds[look]
    update_event = np.zeros(P, dtype=bool)
    for j in range(S):
        lo, hi = int(start[j]), int(min(start[j] + dur[j], P))
        w = np.nonzero(cond[lo:hi])[0]
        if len(w):
            update_event[lo + w[0]] = True
    adapt_target = np.minimum(step_idx + 1, S - 1).astype(np.int32)

    return GaitTiming(
        ss=ss, ds=ds, start=start, foot_is_left=foot_is_left,
        step_idx=step_idx, t_in_step=t_in_step, is_ds=is_ds,
        gamma_l=gamma_l, gamma_r=gamma_r,
        left_ref_idx=lref, right_ref_idx=rref,
        stance_left_idx=stance_left_idx, stance_right_idx=stance_right_idx,
        update_event=update_event, adapt_target=adapt_target,
        stance_from_table=stance_from_table, total_ticks=total,
    )
