"""Scaling-exponent statistics shared by the rehearsal tools.

Round-5 postmortem: the least-squares alpha over all multipliers
AVERAGED AWAY a 29x wall-time jump on the last leg
(ext_multi_signal_dedup: 2.67 s at m=10 -> 77.05 s at m=30 read as a
fitted alpha of 1.14). The fitted exponent describes the trend; the
per-leg local slope catches a tail cliff. Both rehearsal tools now
report max adjacent-leg slope per query and exit non-zero when any leg
exceeds SLOPE_FLAG — so a quadratic regime entered only at the largest
multiplier cannot hide behind the fit again.
"""

from __future__ import annotations

import math

# A leg steeper than n^1.5 is a scale bug to file: banded/blocked
# designs should stay near n log n (~1.2 at these sizes) on EVERY leg.
SLOPE_FLAG = 1.5


def fit_stats(mults: list[float], ts: list[float]) -> tuple[float, float]:
    """(least-squares alpha, max adjacent-leg slope) of log t vs log n.

    Times are floored at 1 ms; JVM fixed overhead makes sub-second
    queries read sub-linear, which is fine — the flag is one-sided.
    """
    if len(mults) < 2:
        # A single leg has no slope to fit; return NaN alpha and a
        # zero (never-flagging) max slope instead of ZeroDivisionError
        # when a tool is invoked with one multiplier.
        return float("nan"), 0.0
    xs = [math.log(m) for m in mults]
    ys = [math.log(max(t, 1e-3)) for t in ts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    max_slope = max(
        (ys[i + 1] - ys[i]) / (xs[i + 1] - xs[i]) for i in range(len(xs) - 1)
    )
    return alpha, max_slope
