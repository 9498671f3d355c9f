"""Python-boundary demos (SURVEY.md §2.5 E22) — and when NOT to use them.

Rule of thumb at 100 TB: every operator in this engine's hot paths is
a built-in JVM expression; Python appears ONLY when the semantics are
genuinely inexpressible with built-ins (custom model scoring, exotic
tokenizers, binary decoders). Then:

- Arrow-batched ``pandas_udf`` (vectorized, ~10–100× over row-at-a-
  time Python UDFs) for scalar transforms;
- Python UDTF for one-row→many-rows expansion with per-row logic;
- ``mapInPandas`` for whole-partition batch transforms (see
  :mod:`calaspark.ops.multimodal`).

The functions below are deliberately simple so the demo overhead is
the measurable thing: the same logic as a built-in expression sits
next to each, and the built-in wins — that comparison is the point.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Type OBJECTS, not DDL strings: string schemas are parsed through the
# active SparkContext at decoration time, which would make importing
# this module require a running session.
_TOKEN_ROW = StructType(
    [StructField("token", StringType()), StructField("pos", IntegerType())]
)


@pandas_udf(DoubleType())
def sigmoid_quality_pandas(n_chars: pd.Series) -> pd.Series:
    """Arrow-vectorized logistic quality score of document length.

    Executes as whole Arrow batches in one Python worker call per
    batch — the right shape when Python is unavoidable. For THIS
    formula it is avoidable: see :func:`sigmoid_quality_builtin`,
    which stays in codegen and should be preferred in real plans.
    """
    import numpy as np

    return 1.0 / (1.0 + np.exp(-(n_chars.astype("float64") - 500.0) / 200.0))


def sigmoid_quality_builtin(n_chars: str | Column) -> Column:
    """The same score as a built-in expression (no Python boundary)."""
    c = F.col(n_chars) if isinstance(n_chars, str) else n_chars
    return 1.0 / (1.0 + F.exp(-(c.cast("double") - 500.0) / 200.0))


@udtf(returnType=_TOKEN_ROW)
class TokenizeUDTF:
    """UDTF demo: text → (token, position) rows.

    One-row→many-rows with per-row Python. The built-in equivalent
    (``posexplode(split(...))``) is what production plans should use;
    the UDTF form exists for logic explode can't express (stateful
    tokenizers, model-based segmentation).
    """

    def eval(self, text: str):  # noqa: D102
        for i, tok in enumerate((text or "").split()):
            yield tok, i


# ------------------------------------------------------------------
# Arrow-native boundaries (PGO:768 applyInArrow, DF:6481 mapInArrow):
# the zero-copy siblings of applyInPandas/mapInPandas — batches cross
# as pyarrow RecordBatch with NO pandas materialization, the right
# shape when the Python side is itself Arrow-native (arrow compute,
# polars, duckdb-wasm-style kernels) and the pandas conversion would
# be pure overhead.


def token_stats_arrow_batches(it):
    """mapInArrow worker: per-document token count + total length via
    pyarrow.compute — no pandas DataFrame ever exists."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        toks = pc.split_pattern(batch.column("text"), " ")
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(pc.list_value_length(toks), pa.int64()),
                pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            ],
            names=["doc_id", "n_tokens", "n_chars"],
        )


def group_value_sum_arrow(key, batch):
    """applyInArrow worker: one aggregate row per group from a single
    pyarrow Table (Arrow compute sum — no pandas)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pa.Table.from_pydict(
        {
            "user_id": [key[0].as_py()],
            "n": [batch.num_rows],
            "sum_value": [pc.sum(batch.column("value")).as_py()],
        }
    )


@pandas_udf(DoubleType())
def weighted_mean_agg(v: pd.Series, w: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (Series → scalar): weighted mean of
    ``v`` by ``w`` — the shape a custom aggregation (trimmed mean,
    model-calibrated score) takes when no built-in aggregate exists.
    Spark splits each group across Arrow batches only when a group
    exceeds one batch; state here is a single division, so the demo
    keeps whole groups (small-group data). The built-in twin
    ``sum(v*w)/sum(w)`` sits next to it in the demo query — and wins
    (pure codegen, map-side partials); that comparison is the point.
    """
    den = float(w.sum())
    return float((v * w).sum() / den) if den else 0.0


def zscore_per_group(df, key_col: str, id_col: str, val_col: str):
    """Grouped-map ``applyInPandas`` (the pandas sibling of the
    applyInArrow worker above): per-group z-score normalization —
    each group arrives as ONE pandas DataFrame, the worker returns a
    transformed frame. The contract to respect at scale: a group
    must fit one worker's memory (here: per-key event groups), which
    is exactly why the engine's own normalizations (q87) use window
    aggregates instead — this boundary exists for logic pandas can
    express and Catalyst cannot.
    """

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[val_col].mean()
        sd = pdf[val_col].std(ddof=0)
        out = pdf[[key_col, id_col, val_col]].copy()
        out["z"] = (pdf[val_col] - mu) / sd if sd else 0.0
        return out

    schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField(id_col, df.schema[id_col].dataType),
            StructField(val_col, DoubleType()),
            StructField("z", DoubleType()),
        ]
    )
    return df.groupBy(key_col).applyInPandas(norm, schema)
