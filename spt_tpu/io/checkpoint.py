"""Checkpoint / resume of progressive render state.

The reference's only 'checkpoint' is its in-memory accumulation buffer +
frame counter with reset rules (CPUPathTracer.h:68,72, invalidation at
CPUPathTracer.cpp:119-161).  Here that state is pure arrays, so long renders
(and inverse-rendering optimizer state) serialize to ``.npz`` and resume
exactly — same accumulation, same next-sample index, hence bit-identical
continuation (counter RNG depends only on sample ids).
"""

from __future__ import annotations

import numpy as np


def save_render_state(path: str, tracer) -> None:
    """Persist a PathTracerBase session's progressive state."""
    state = tracer.get_state()
    np.savez(path, accum=np.asarray(state["accum"]),
             frame_count=np.int64(state["frame_count"]))


def load_render_state(path: str, tracer) -> None:
    """Restore a session saved by save_render_state."""
    with np.load(path) as z:
        tracer.set_state({"accum": z["accum"],
                          "frame_count": int(z["frame_count"])})


def save_optimizer_state(path: str, params, opt_state_flat: dict,
                         step: int) -> None:
    """Persist inverse-rendering optimization state (flat array dict)."""
    arrays = {f"param_{k}": np.asarray(v) for k, v in params.items()}
    arrays.update({f"opt_{k}": np.asarray(v) for k, v in opt_state_flat.items()})
    arrays["step"] = np.int64(step)
    np.savez(path, **arrays)


def load_optimizer_state(path: str):
    with np.load(path) as z:
        params = {k[6:]: z[k] for k in z.files if k.startswith("param_")}
        opt = {k[4:]: z[k] for k in z.files if k.startswith("opt_")}
        step = int(z["step"])
    return params, opt, step
