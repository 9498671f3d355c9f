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

Engine shape (round-8b rework): ``repartition(keys)`` +
``sortWithinPartitions(keys, order)`` + ONE ``mapInPandas`` stream
per partition, carrying the fold state across Arrow batches and
resetting it at key changes. The earlier ``applyInPandas`` form was
semantically identical but paid one Python invocation PER KEY — at
~6k user keys that overhead was ~3× the actual fold work (q134
measured 4.2 s → ~1.4 s at sf0.1). Same shuffle either way
(grouped-map also hash-partitions by key); the rework only removes
Python crossings — exactly the boundary-cost discipline E22
documents.

Scale contract: keys partition freely across executors; a single
key's history streams through one partition in Arrow batches (the
carry makes batch boundaries invisible), so the per-worker bound is
the BATCH, not the key history. For resumable/out-of-core use the
recurrences are chunkable by CARRY (run each chunk from the previous
chunk's closing state) because each update is a monotone function
composition — exercised by the chunk-carry property tests in
tests/test_ops.py (property: composing chunk scans == one scan).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Sequence

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def _keyed_ordered_fold(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    val_col: str,
    out_col: str,
    step: Callable[[object, float], float],
) -> DataFrame:
    """Shared engine: one ordered Arrow stream per partition.

    ``step(state, x) -> new_state`` is called once per row with
    ``state=None`` at each key's first row; the emitted value IS the
    state (both current recurrences output their running state —
    generalize to a (state, emit) pair if a future one does not).
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    # StructType.add MUTATES — and df.schema is cached on the frame,
    # so build the output schema from a fresh copy of the fields
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive partition-ordered by (keys, order); the carry
        # survives batch boundaries, resets on key change
        cur_key: tuple | None = None
        state = None
        for pdf in batches:
            out = []
            keys_iter = zip(*(pdf[k] for k in key_cols))
            for key, x in zip(keys_iter, pdf[val_col].astype("float64")):
                if key != cur_key:
                    cur_key = key
                    state = None
                state = step(state, x)
                out.append(state)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    ordered = df.repartition(
        *[F.col(k) for k in key_cols]
    ).sortWithinPartitions(*key_cols, *order_cols)
    return ordered.mapInPandas(scan, schema=schema)


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

    def step(state, d):
        b = start if state is None else state
        return min(hi, max(lo, b + d))

    return _keyed_ordered_fold(
        df, key_cols, order_cols, delta_col, out_col, step
    )


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
    beta = 1.0 - alpha

    def step(state, x):
        return x if state is None else alpha * x + beta * state

    return _keyed_ordered_fold(
        df, key_cols, order_cols, val_col, out_col, step
    )
