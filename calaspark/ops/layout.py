"""Data-layout operators for 100 TB scans (SURVEY.md §2.5 E24
extension): multi-dimensional clustering (z-order) and runtime join
pruning (bloom filters / semi-join).

The reference loads row-oriented tables and leaves layout to the
database (`calaccess_raw/managers.py` — heap tables, no clustering);
at Spark scale, LAYOUT is the difference between scanning 100 TB and
scanning 100 GB:

- **Z-order clustering** interleaves the bits of several bucketed
  sort dimensions into one key; range-partitioning + sorting by that
  key gives every output file a small bounding box in EVERY
  clustered dimension, so parquet min/max stats prune files for
  conjunctive predicates on ANY subset of those dimensions — the
  thing a single-column sort can only do for its leading column.
- **Runtime join pruning**: for a selective dim⋈fact join, Spark's
  own bloom-filter injection (`spark.sql.optimizer.runtime.
  bloomFilter.*`) builds a filter from the dim side and applies it
  below the fact shuffle; :func:`tune_runtime_filters` sets the
  thresholds that gate it. When the optimizer can't inject (e.g.
  the pruning key is only obtainable via an expression),
  :func:`semi_prune` is the explicit form — a broadcast left-semi
  join that costs no shuffle on the big side.

Everything here is plain column arithmetic and configuration — no
Python in any data path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def minmax_bucket(
    col: Column | str, lo: float, hi: float, bits: int = 16
) -> Column:
    """Scale a numeric column into the integer grid [0, 2**bits):
    the per-dimension quantization step of a z-order key. Values
    outside [lo, hi] clamp to the grid edges (skew-safe: a stray
    outlier cannot stretch everyone else's buckets). NULL inputs
    land in bucket 0 explicitly — without the coalesce, a NULL
    propagates through the arithmetic and the null-skipping
    least/greatest clamp would silently park the row in the MAX
    bucket, clustering all missing values with the top edge.
    """
    if not hi > lo:
        # hi == lo would divide by 0.0 → NULL, and the null-skipping
        # least/greatest clamp would silently park EVERY row in the
        # max bucket — a degenerate constant dimension with no signal
        # to the caller. Misuse must be loud.
        raise ValueError(f"minmax_bucket needs hi > lo, got [{lo}, {hi}]")
    c = F.col(col) if isinstance(col, str) else col
    n = (1 << bits) - 1
    scaled = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        * F.lit(float(n))
        / F.lit(float(hi - lo))
    ).cast("long")
    return F.coalesce(
        F.greatest(F.least(scaled, F.lit(n)), F.lit(0)), F.lit(0).cast("long")
    )


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative int)
    column into one long — the Morton / z-order curve key. With
    ``n = len(cols)`` dimensions the result uses ``n * bits`` bits
    (must fit a signed long), and nearby keys are nearby in every
    dimension at once.

    Pure codegen: ``bits × n`` shift/mask/or terms, constant per
    row — the standard closed form, no UDF, no lookup table.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + j))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[Column],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``zcols``
    (already-bucketed int columns — use :func:`minmax_bucket`).

    ``repartitionByRange`` on the z-key splits the curve into
    ``n_files`` contiguous segments (one shuffle — the clustering
    pass a 100 TB table pays once at write time), and the
    within-partition sort keeps each parquet row group's min/max
    tight so predicate pushdown prunes at BOTH file and row-group
    granularity.
    """
    z = zorder_key(zcols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def tune_runtime_filters(
    spark: SparkSession,
    creation_side_max: str = "100MB",
    application_side_min: str = "10MB",
) -> None:
    """Enable Spark's runtime bloom-filter join pruning with
    thresholds suited to the deployment: the filter is built when
    the (filtered) creation side is under ``creation_side_max`` and
    applied when the probe-side scan exceeds
    ``application_side_min``. The stock defaults (10 MB / 10 GB) are
    tuned for clusters; tests lower them to exercise the plan shape
    locally (tests/test_scale.py asserts the injected
    ``bloom_filter_agg`` node).
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_max,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        application_side_min,
    )


def semi_prune(big: DataFrame, small: DataFrame, key: str) -> DataFrame:
    """Explicit runtime filter: keep only ``big`` rows whose ``key``
    appears in ``small`` — a broadcast LEFT SEMI join, so the big
    side is never shuffled and the filter reaches the scan as a
    broadcast hash probe. The manual form of what
    :func:`tune_runtime_filters` lets the optimizer inject, for the
    cases the optimizer can't see (derived keys, non-equi gates).
    """
    return big.join(
        F.broadcast(small.select(key).distinct()), key, "left_semi"
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
) -> dict:
    """Small-file COMPACTION — the lake-maintenance pass every
    long-lived 100 TB table needs (E24/S5 adjunct): streaming
    micro-batches, per-task writers, and incremental loads all
    accumulate files far below the parquet sweet spot, and a scan's
    task count (and footer-read cost) is proportional to FILE count,
    not byte count.

    Reads ``src``, rewrites it to ``dst`` with files sized toward
    ``target_file_bytes``:

    - unpartitioned: one round-robin ``repartition(n)`` with
      ``n = ceil(total_bytes / target)`` — every output file lands
      near the target;
    - partitioned: one hash ``repartition(partition_cols)`` so each
      Hive partition directory collapses to a single writer task,
      with ``maxRecordsPerFile`` (derived from the observed average
      row size) re-splitting any partition whose data exceeds the
      target — bounded file sizes even under partition skew.

    Byte accounting walks the local filesystem (``file://`` lakes —
    this repo's test environment); on HDFS/S3 swap the two listing
    loops for the Hadoop ``FileSystem.listFiles`` API — the Spark
    plan is identical. Returns a stats dict (files/bytes before and
    after, rows) the caller can assert on or log to the manifest.
    """
    import math
    from pathlib import Path

    src_r = Path(src).resolve()
    dst_r = Path(dst).resolve()
    if dst_r == src_r or src_r in dst_r.parents:
        raise ValueError(
            "compact_parquet dst must not equal or nest under src "
            f"(src={src_r}, dst={dst_r}): overwriting the path being "
            "read would rely on Spark's self-overwrite detection and "
            "corrupt the after-stats walk"
        )
    src_files = [p for p in Path(src).rglob("*.parquet")]
    bytes_before = sum(p.stat().st_size for p in src_files)
    df = spark.read.parquet(src)
    rows = df.count()
    avg_row = max(1, bytes_before // max(1, rows))
    max_records = max(1, target_file_bytes // avg_row)
    if partition_cols:
        (
            df.repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records)
            .partitionBy(*partition_cols)
            .parquet(dst)
        )
    else:
        n = max(1, math.ceil(bytes_before / target_file_bytes))
        (
            df.repartition(n)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records)
            .parquet(dst)
        )
    dst_files = [p for p in Path(dst).rglob("*.parquet")]
    return {
        "files_before": len(src_files),
        "bytes_before": bytes_before,
        "files_after": len(dst_files),
        "bytes_after": sum(p.stat().st_size for p in dst_files),
        "rows": rows,
    }
