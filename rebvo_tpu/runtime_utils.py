"""Runtime utilities: checkpoint/resume and per-stage profiling.

Checkpointing covers the FULL VO state pytree (keyline arrays, filter
states, pose), enabling true mid-run resume — a capability the
reference lacks (SURVEY.md §5: 'There is no mid-run resume of filter
state'). Profiling offers the per-stage timing channel the reference
exposes via TIME_DEBUG + dtp0/dtp1 (rebvo.h:54-60, rebvo_third_t.cpp:
303-305), plus a jax.profiler trace hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np


# ---------------------------------------------------------------------------
# Checkpoint / resume of arbitrary state pytrees
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    import jax
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


def save_state(path: str, state) -> None:
    """Serialise a pytree of arrays to npz, keyed by tree path."""
    import jax
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    np.savez_compressed(path, **{
        _path_str(p): np.asarray(v) for p, v in leaves})


def load_state(path: str, template):
    """Restore a pytree saved by save_state into `template`'s structure."""
    import jax
    import jax.numpy as jnp
    z = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    vals = []
    for p, tmpl in leaves:
        key = _path_str(p)
        if key not in z.files:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = jnp.asarray(z[key])
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != {tmpl.shape}")
        vals.append(arr.astype(tmpl.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), vals)


# ---------------------------------------------------------------------------
# Per-stage profiling
# ---------------------------------------------------------------------------


class StageTimer:
    """Accumulates wall-clock per named stage; blocks on device arrays so
    timings reflect real execution (async dispatch otherwise hides it)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        import jax
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def __str__(self) -> str:
        return " ".join(f"{k}={v * 1000:.2f}ms"
                        for k, v in sorted(self.report().items()))


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
