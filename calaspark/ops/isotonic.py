"""Isotonic regression (pool-adjacent-violators) as a grouped Spark
operator (E13/E22 — SURVEY.md §2.5).

Monotone calibration is the standard post-hoc fix for a score whose
RANKING is trustworthy but whose VALUES are not (q136 diagnoses the
miscalibration; this repairs it): fit the best monotone step
function to per-bin empirical rates, minimizing weighted squared
error. PAVA solves it exactly in one left-to-right pass with a
merge stack — O(bins), deterministic, no tolerance knobs.

Spark shape: the algorithm is SEQUENTIAL in the bin order, so it
cannot be a hash aggregate — but it only ever runs at BIN grain.
The fact table folds map-side into (group, bin, n, pos) first;
``isotonic_calibrate`` then runs PAVA per group via
``applyInPandas`` (Arrow-batched, one pandas frame per group — the
declared E22 boundary, same class as ops/sequential.py). At 100 TB
the Python stage sees bins × groups rows (hundreds), never data.

The kernel is a pure function (`pava`) so tests can property-check
it directly: output monotone non-decreasing, pool means preserved,
equal to the O(n²) reference implementation on random inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def pava(weights: list[float], values: list[float]) -> list[float]:
    """Weighted isotonic (non-decreasing) fit via pool-adjacent-
    violators. Returns the fitted value per input position.

    Classic merge-stack formulation: walk left to right keeping a
    stack of pools (weight, mean); whenever the new pool's mean is
    below its predecessor's, merge them (weighted mean) and keep
    merging while the violation propagates left. Each element is
    merged at most once per direction — O(n).
    """
    if len(weights) != len(values):
        raise ValueError("weights and values must align")
    # stack of [weight, weighted_sum, count] pools
    pools: list[list[float]] = []
    counts: list[int] = []
    for w, v in zip(weights, values):
        cw, cs, cn = float(w), float(w) * float(v), 1
        while pools and cs * pools[-1][0] < pools[-1][1] * cw:
            # mean(current) < mean(top): merge (compare via cross-
            # multiplication to avoid two divisions per test)
            pw, ps = pools.pop()
            pn = counts.pop()
            cw, cs, cn = cw + pw, cs + ps, cn + pn
        pools.append([cw, cs])
        counts.append(cn)
    out: list[float] = []
    for (w, s), n in zip(pools, counts):
        mean = s / w if w else 0.0
        out.extend([mean] * n)
    return out


_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("bin", LongType()),
        StructField("n", LongType()),
        StructField("pos", LongType()),
        StructField("raw_rate", DoubleType()),
        StructField("iso_rate", DoubleType()),
    ]
)


def isotonic_calibrate(binned: DataFrame) -> DataFrame:
    """Fit a monotone calibration map per group.

    ``binned`` must be (group: str, bin: long, n: long, pos: long) —
    one row per (group, score bin) with exact counts, i.e. already
    aggregated to category grain. Returns the input plus raw and
    isotonic rates, fitted per group over bins in ascending order.
    """

    def _fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values("bin").reset_index(drop=True)
        w = pdf["n"].astype("float64").tolist()
        r = (pdf["pos"].astype("float64") / pdf["n"].astype("float64")).tolist()
        iso = pava(w, r)
        return pd.DataFrame(
            {
                "group": pdf["group"],
                "bin": pdf["bin"],
                "n": pdf["n"],
                "pos": pdf["pos"],
                "raw_rate": r,
                "iso_rate": iso,
            }
        )

    return binned.groupBy("group").applyInPandas(_fit, _SCHEMA)
