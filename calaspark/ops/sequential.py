"""Grouped SEQUENTIAL recurrences — the operator class windows
provably cannot express (SURVEY.md §2.5 E22's honest use-case, not a
demo): per-key scans where row i's output depends on row i-1's
OUTPUT through a non-associative update, e.g. the clamped ledger
``b_i = clamp(b_{i-1} + delta_i, lo, hi)``.

Why this is not a window: ``sum() over (rows unbounded preceding)``
composes ASSOCIATIVE partial aggregates; clamping after every step
destroys associativity (clamp(a+b) != clamp(clamp(a)+b)), so no
window frame, no ``aggregate()`` fold over a collected array short
of materializing the whole key's history in one row, computes it.
The engine-correct shape is a per-key ORDERED scan.

Scale contract: ``applyInPandas`` — one Arrow batch stream per key
group, plain-Python recurrence over a numpy array inside the worker.
Keys partition freely across executors (the shuffle is the groupBy);
the boundary is the SAME one every grouped-map carries and the E22
matrix documents: a single key's history must fit its worker. For
histories beyond worker memory the recurrence is chunkable by
CARRY (run each chunk from the previous chunk's closing balance)
because the update is a monotone function composition — that
two-phase variant is documented here as the 100-TB escape hatch and
exercised by the equivalence test in tests/test_ops.py
(property: composing chunk scans == one scan).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def clamped_running_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    delta_col: str,
    lo: float,
    hi: float,
    out_col: str = "balance",
    start: float = 0.0,
) -> DataFrame:
    """Per key (ordered by ``order_cols``), the clamped running
    balance ``b_i = min(hi, max(lo, b_{i-1} + delta_i))`` with
    ``b_0 = clamp(start + delta_1)``; appends ``out_col`` (double).

    Determinism: ``order_cols`` must be a TOTAL order within each
    key (tie-break on a unique column) — the recurrence makes order
    disagreements non-commutative, unlike a plain sum.
    """
    if not (lo <= start <= hi):
        raise ValueError(f"start {start} outside clamp [{lo}, {hi}]")
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    # StructType.add MUTATES — and df.schema is cached on the frame,
    # so build the output schema from a fresh copy of the fields
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        b = start
        out = []
        for d in pdf[delta_col].astype("float64"):
            b = min(hi, max(lo, b + d))
            out.append(b)
        pdf[out_col] = out
        return pdf

    return df.groupBy(*key_cols).applyInPandas(scan, schema=schema)


def ewma_running(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per key (ordered by ``order_cols``), the exponentially
    weighted moving average ``s_i = α·x_i + (1−α)·s_{i-1}`` with
    ``s_1 = x_1``; appends ``out_col`` (double).

    Same class as :func:`clamped_running_sum`: the recurrence is
    non-associative in float (each step ROUNDS — reassociation
    changes the result), so no window computes the identical values;
    same chunkable-by-carry scale contract (carry = closing s).

    Cross-engine determinism: the fold body is written as
    ``α·x + (1−α)·s`` in BOTH this scan and the DuckDB list-lambda
    oracle; with ``1−α`` precomputed once, every step is two IEEE
    products and one add in fixed order, so the outputs are bitwise
    equal (the q134 oracle technique).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    beta = 1.0 - alpha
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        s = None
        out = []
        for x in pdf[val_col].astype("float64"):
            s = x if s is None else alpha * x + beta * s
            out.append(s)
        pdf[out_col] = out
        return pdf

    return df.groupBy(*key_cols).applyInPandas(scan, schema=schema)
