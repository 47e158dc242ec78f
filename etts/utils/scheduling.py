"""Training schedules as pure functions of step
(parity with `TransformerTTS/utils/scheduling.py:31-47`)."""
from __future__ import annotations

import numpy as np

__all__ = ["piecewise_linear_schedule", "reduction_schedule"]


def piecewise_linear_schedule(step: int, schedule) -> float:
    """Linear interpolation over [[step, value], ...] breakpoints; clamps at ends."""
    schedule = np.asarray(schedule, dtype=np.float64)
    xs, ys = schedule[:, 0], schedule[:, 1]
    if step < xs[0]:
        return float(ys[0])
    idx = int(np.where(step >= xs)[0][-1])
    if idx == len(ys) - 1:
        return float(ys[-1])
    x0, x1, y0, y1 = xs[idx], xs[idx + 1], ys[idx], ys[idx + 1]
    return float(y0 + (y1 - y0) * (step - x0) / (x1 - x0))


def reduction_schedule(step: int, schedule) -> int:
    """Step function over [[step, value], ...]; returns the last value whose
    breakpoint is <= step (used for reduction factor r, head-drop count,
    MINE batch size)."""
    schedule = np.asarray(schedule)
    r = schedule[0, 0]
    for bp, val in schedule:
        if bp <= step:
            r = val
        else:
            break
    return int(r)
