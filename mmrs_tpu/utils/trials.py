"""Multi-trial measurement summaries for the benches.

VERDICT r3 #2: a single pipelined pass per metric swung 2.4x between
rounds on this tunnel with zero code change — one number cannot
distinguish device/transport variance from a real regression. Every
headline metric therefore runs >= `n` independent trials and reports
the DISTRIBUTION (median / min / max / IQR); the driver's headline
value is the median.
"""

from __future__ import annotations

from typing import Callable, Dict, List


def summarize(samples: List[float]) -> Dict[str, float]:
    """Median / min / max / IQR for a list of per-trial measurements."""
    xs = sorted(float(x) for x in samples)
    n = len(xs)
    if n == 0:
        raise ValueError("no samples")

    def q(p: float) -> float:  # linear-interpolated quantile
        if n == 1:
            return xs[0]
        pos = p * (n - 1)
        lo = int(pos)
        hi = min(lo + 1, n - 1)
        return xs[lo] + (xs[hi] - xs[lo]) * (pos - lo)

    return {
        "median": q(0.5),
        "min": xs[0],
        "max": xs[-1],
        "iqr": q(0.75) - q(0.25),
        "n": n,
        "trials": xs,
    }


def measure(fn: Callable[[], float], n: int = 5) -> Dict[str, float]:
    """Run a measurement callable n times and summarize. The callable
    owns its own warmup policy (run once before to exclude compiles)."""
    return summarize([fn() for _ in range(n)])


def fmt(label: str, s: Dict[str, float], unit: str = "ms",
        scale: float = 1.0) -> str:
    return (f"{label}: median {s['median'] * scale:.2f} {unit} "
            f"(min {s['min'] * scale:.2f}, max {s['max'] * scale:.2f}, "
            f"IQR {s['iqr'] * scale:.2f}, n={s['n']})")
