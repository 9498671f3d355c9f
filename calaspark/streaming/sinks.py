"""Streaming sinks (SURVEY.md §2.5 E23 / §4.2): the idempotent
``foreachBatch`` MERGE-upsert — the streaming twin of q56's CDC merge
and the manifest-writer pattern SURVEY §4.2 calls out.

Structured Streaming's file sinks are append-only; CDC wants UPSERT.
The standard shape is ``foreachBatch``: every micro-batch runs a
batch MERGE against the target table, and idempotency comes from two
properties together:

1. **Within-batch dedup**: `latest_per_key` collapses each batch to
   one (newest) row per key, so replay order inside a batch cannot
   matter.
2. **Idempotent MERGE**: applying the same change set twice yields
   the same table (source-over-target coalesce is absorbing), so a
   replayed micro-batch — the at-least-once delivery case after a
   failure — is a no-op.

100 TB notes: each micro-batch pays one shuffle join keyed on the
merge key against the CURRENT target; with transactional table
formats the same callback body becomes a real `MERGE INTO` and the
read-modify-write below collapses to a metadata swap. On a plain
parquet lake the swap is the documented rename dance (write to a
spare directory, point readers at it) — atomic on HDFS/local
renames, last-writer-wins on object stores without a metastore.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..ops.windows import latest_per_key


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    key: str,
    version_cols: list[Column],
) -> None:
    """Batch MERGE of ``batch`` into the parquet table at
    ``target_dir``: newest row per key wins (within the batch via
    ``version_cols``; batch beats target — CDC source-of-truth
    semantics). The target alternates between two generation
    subdirectories with a `_CURRENT` pointer file, because Spark
    cannot overwrite a path it is reading in the same job; the
    pointer flip is the last step, so a crash mid-merge leaves the
    previous generation intact (and the replayed batch re-merges
    idempotently).
    """
    src = latest_per_key(batch, [key], version_cols)
    cur = _current_generation(target_dir)
    if cur is None:
        merged = src
        gen = "gen0"
    else:
        tgt = spark.read.parquet(str(Path(target_dir) / cur))
        # Schema drift is an explicit error, not a silent outcome:
        # an unresolved batch column would kill the streaming query
        # mid-foreachBatch with an opaque AnalysisException, and a
        # target-only column would be silently dropped from every
        # later generation. Evolution is a deliberate migration, not
        # a side effect of one micro-batch.
        if set(src.columns) != set(tgt.columns):
            raise ValueError(
                "merge_upsert schema drift: batch columns "
                f"{sorted(src.columns)} != target columns "
                f"{sorted(tgt.columns)}; migrate the target explicitly"
            )
        gen = "gen1" if cur == "gen0" else "gen0"
        cols = [c for c in src.columns if c != key]
        t = tgt.alias("t")
        # source rows are whole records (CDC row images), so source
        # presence decides per ROW, not per cell — a non-null marker
        # column (never the payload: a legitimately-NULL source cell
        # must still win) gates the whole row. The marker name is
        # derived to not collide with any batch column: withColumn
        # REPLACES an existing column, so a batch legitimately
        # carrying the marker name would otherwise have its merged
        # values corrupted to the literal 1.
        marker = "_present"
        while marker in src.columns:
            marker += "_"
        s = src.withColumn(marker, F.lit(1)).alias("s")
        merged = t.join(s, key, "full_outer").select(
            F.col(key),
            *[
                F.when(F.col(f"s.{marker}").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in cols
            ],
        )
    out = str(Path(target_dir) / gen)
    merged.write.mode("overwrite").parquet(out)
    tmp = Path(target_dir) / "_CURRENT.tmp"
    tmp.write_text(gen)
    tmp.replace(Path(target_dir) / "_CURRENT")  # atomic pointer flip


def _current_generation(target_dir: str) -> str | None:
    """The `_CURRENT` pointer's generation name, or None before the
    first commit — the single place the pointer file is parsed."""
    ptr = Path(target_dir) / "_CURRENT"
    if not ptr.exists():
        return None
    return ptr.read_text().strip()


def read_upsert_table(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Current generation of a :func:`merge_upsert` table, or None
    before the first commit."""
    gen = _current_generation(target_dir)
    if gen is None:
        return None
    return spark.read.parquet(str(Path(target_dir) / gen))


def foreach_batch_upsert(
    target_dir: str, key: str, version_cols: list[Column]
):
    """``foreachBatch`` callback running :func:`merge_upsert` per
    micro-batch — wire it with::

        stream.writeStream.foreachBatch(
            foreach_batch_upsert(path, "k", [F.col("ts").desc()])
        ).option("checkpointLocation", ckpt).trigger(availableNow=True)

    The checkpoint gives at-least-once batch delivery; the merge's
    idempotency upgrades the sink to effectively-once.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession, target_dir, batch_df, key, version_cols
        )

    return apply
