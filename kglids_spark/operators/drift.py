"""Distribution-drift detection: histograms + two-sample KS and PSI.

The reference has no drift operator (SURVEY.md §2.4 A14 — ours); the
north_star pins KS + PSI on `n_tok` histograms vs a baseline snapshot.

Design for 10^12 rows: the expensive part — counting — is a fixed-width
histogram computed as sum-of-indicator aggregate expressions inside the
main per-bucket pass (mergeable exact counts, map-side partials). The
KS/PSI arithmetic runs driver-side on the merged ≤(nbins+2)-long count
arrays, which is O(nbins) regardless of data size (SURVEY.md §4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class HistSpec:
    column: str
    lo: float = 0.0
    hi: float = 8192.0
    nbins: int = 64

    @property
    def width(self) -> float:
        return (self.hi - self.lo) / self.nbins

    @property
    def n_cells(self) -> int:
        # [underflow, bin_0..bin_{n-1}, overflow]
        return self.nbins + 2


def histogram_exprs(spec: HistSpec, prefix: str = "hist") -> list[Column]:
    """One sum-of-indicator per cell; all cells evaluate in one scan."""
    col = F.col(spec.column).cast("double")
    cells = [
        F.sum((col < F.lit(spec.lo)).cast("long")).alias(f"{prefix}_under"),
    ]
    for i in range(spec.nbins):
        lo_i = spec.lo + i * spec.width
        hi_i = spec.lo + (i + 1) * spec.width
        cond = (col >= F.lit(lo_i)) & (col < F.lit(hi_i))
        if i == spec.nbins - 1:  # close the last bin on the right
            cond = (col >= F.lit(lo_i)) & (col <= F.lit(spec.hi))
        cells.append(F.sum(cond.cast("long")).alias(f"{prefix}_{i}"))
    cells.append(F.sum((col > F.lit(spec.hi)).cast("long")).alias(f"{prefix}_over"))
    return cells


def histogram_array_expr(spec: HistSpec) -> Column:
    """The same histogram as a single array<long> column (for sketch
    persistence in the checkpoint ledger)."""
    return F.array(*histogram_exprs(spec, prefix="h")).cast("array<long>")


def histogram_df(df: DataFrame, spec: HistSpec, group_cols: list[str] | None = None) -> DataFrame:
    agg = histogram_array_expr(spec).alias("hist")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def merge_histograms(hists: list[list[int]]) -> list[int]:
    if not hists:
        return []
    out = [0] * len(hists[0])
    for h in hists:
        for i, v in enumerate(h):
            out[i] += int(v or 0)
    return out


# ---------------------------------------------------------------------------
# driver-side statistics over merged histograms (O(nbins))


def ks_statistic(h1: list[int], h2: list[int]) -> float:
    """Two-sample KS statistic approximated on a shared binning: max
    |ECDF1 - ECDF2| over bin edges. Exact when values are integers and
    bin width divides the range (true for n_tok in [0, 8192])."""
    n1, n2 = sum(h1), sum(h2)
    if n1 == 0 or n2 == 0:
        return 0.0
    d, c1, c2 = 0.0, 0.0, 0.0
    for a, b in zip(h1, h2):
        c1 += a / n1
        c2 += b / n2
        d = max(d, abs(c1 - c2))
    return d


def psi(h_actual: list[int], h_expected: list[int], eps: float = 1e-6) -> float:
    """Population Stability Index with epsilon smoothing:
    sum((p-q) * ln(p/q)). Conventional thresholds: <0.1 stable,
    0.1-0.2 moderate, >0.2 drifted."""
    n1, n2 = sum(h_actual), sum(h_expected)
    if n1 == 0 or n2 == 0:
        return 0.0
    total = 0.0
    for a, e in zip(h_actual, h_expected):
        p = max(a / n1, eps)
        q = max(e / n2, eps)
        total += (p - q) * math.log(p / q)
    return total


def evaluate_drift(
    actual_hist: list[int],
    baseline_hist: list[int],
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> dict:
    ks = ks_statistic(actual_hist, baseline_hist)
    p = psi(actual_hist, baseline_hist)
    return {
        "ks": ks,
        "psi": p,
        "ks_pass": ks <= ks_threshold,
        "psi_pass": p <= psi_threshold,
    }
