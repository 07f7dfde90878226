"""Checkpoint / resume for long-running sweeps.

The reference has no checkpointing (SURVEY.md §5); its closest analogue is
warm-starting each solve from the previous solution.  Batched Monte-Carlo
sweeps here can run for hours across hosts, so sweep state — scenario
cursor, RNG key, accumulated statistics, and optionally the full solver
warm-start pytree — checkpoints atomically to disk.

Implementation: generic pytree <-> .npz with key-path flattening (no
framework dependency; orbax is overkill for flat sweep state and its async
machinery fights the tunneled-TPU transfer constraints).  Writes are
atomic (tmp file + rename) so a killed run never leaves a torn checkpoint.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save(path: str, tree: Any, step: int | None = None,
         meta: dict | None = None) -> None:
    """Atomically write a pytree checkpoint."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in leaves}
    if step is not None:
        arrays["__step__"] = np.asarray(step)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def restore(path: str, like: Any) -> tuple[Any, int]:
    """Restore a checkpoint into the structure of `like`.

    Returns (tree, step); step is -1 if the checkpoint carries none.
    """
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    step = int(data.pop("__step__", -1))
    leaves_like = jax.tree_util.tree_flatten_with_path(like)
    paths = [_path_str(p) for p, _ in leaves_like[0]]
    missing = [p for p in paths if p not in data]
    if missing:
        raise KeyError(f"checkpoint {path} missing leaves: {missing[:5]}")
    leaves = [data[p] for p in paths]
    return jax.tree_util.tree_unflatten(leaves_like[1], leaves), step


def latest(directory: str, prefix: str = "ckpt_") -> str | None:
    """Path of the highest-numbered checkpoint file, or None."""
    if not os.path.isdir(directory):
        return None
    cands = [f for f in os.listdir(directory)
             if f.startswith(prefix) and f.endswith(".npz")]
    if not cands:
        return None
    key = lambda f: int("".join(ch for ch in f if ch.isdigit()) or -1)
    return os.path.join(directory, max(cands, key=key))
