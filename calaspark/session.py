"""SparkSession construction and per-session engine settings.

Two entry points:

- :func:`get_spark` builds a tuned local session (tests / bench).
- :func:`prepare` applies the runtime-settable subset of the engine's
  required confs to an EXISTING session (the correctness driver hands
  us its own ``SparkSession``; every public query entry point calls
  ``prepare(spark)`` first so behavior does not depend on who built
  the session).

Scale notes (100 TB design): the static confs below are the local
defaults; on a real cluster the same knobs are sized per executor
(``spark.sql.shuffle.partitions`` ≈ 2–3× total cores, AQE coalesces
the rest; ``spark.sql.files.maxPartitionBytes`` keeps scan tasks ~128
MiB). Nothing in the engine hard-codes partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe/necessary to set on ANY session at runtime.
#: - nanosAsLong: the `events` table is parquet TIMESTAMP(NANOS),
#:   which Spark 4 refuses by default (PARQUET_TYPE_ILLEGAL); we read
#:   the raw int64 and truncate to µs ourselves (tables.load_table),
#:   matching DuckDB's ns→µs truncation exactly.
#: - timeZone UTC: all timestamps in the data are wall-clock (NTZ);
#:   pinning the session zone makes every tz-dependent cast/func
#:   engine-portable (SURVEY.md §2.6 determinism rule 2).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
}


def _ship_package(spark: SparkSession) -> None:
    """Make ``calaspark`` importable on executors of ANY session.

    Worker-side closures that reference a module-level function (the
    PAVA kernel in ops/isotonic, the Misra-Gries kernels in
    ops/heavy) are cloudpickled BY REFERENCE — the executor must
    import ``calaspark`` to load them. Our own sessions inherit the
    repo on sys.path via the launch CWD, but the correctness driver
    builds a vanilla session from an arbitrary CWD, where the import
    fails only at EXECUTION time (discovered by the round-9 q165
    vanilla-session probe). Building the content-addressed zip via
    :func:`_build_pkg_zip` and ``addPyFile``-ing it per SparkContext
    closes the gap for every session and every future module-level
    kernel.
    """
    sc = spark.sparkContext
    if getattr(sc, "_calaspark_shipped", False):
        return
    sc.addPyFile(_build_pkg_zip())
    sc._calaspark_shipped = True


def _build_pkg_zip() -> str:
    """Build (or validate-and-reuse) the executor-shippable zip of the
    ``calaspark`` sources; return its path.

    Builds the archive IN MEMORY first and keys the on-disk name by a
    content hash of the sources (round-9 advice): the earlier
    pid-keyed name in the shared tempdir shipped a STALE zip when
    pids recycled across long-lived /tmp, raced concurrent sessions
    on one '.tmp' path, and — being predictable in a world-writable
    dir — let another local user pre-plant a zip that executors
    would import (TOCTOU). Content-addressing kills all three: the
    name is unpredictable without the sources, a stale/foreign file
    at the path is detected by digest mismatch and rebuilt, and the
    zip itself is deterministic (sorted members, zeroed mtimes) so
    equal sources → equal digest across processes.
    """
    import hashlib
    import io
    import os
    import tempfile
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(pkg_root, "calaspark")):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    info = zipfile.ZipInfo(
                        os.path.relpath(full, pkg_root), (1980, 1, 1, 0, 0, 0)
                    )
                    # writestr takes compression from the ZipInfo
                    # (default STORED), not the archive constructor
                    info.compress_type = zipfile.ZIP_DEFLATED
                    with open(full, "rb") as fh:
                        z.writestr(info, fh.read())
    payload = buf.getvalue()
    digest = hashlib.sha256(payload).hexdigest()[:16]

    # Per-user private directory (0700) under the tempdir; created
    # atomically and never shared across uids, so no other local
    # user can pre-plant or swap files in it. If another uid
    # pre-planted the path (makedirs accepts a foreign dir and the
    # chmod would then raise EPERM — an availability DoS, round-10
    # advisory), fall back to a fresh mkdtemp instead of failing.
    priv = os.path.join(
        tempfile.gettempdir(), f"calaspark-pyfiles-{os.getuid()}"
    )
    try:
        os.makedirs(priv, mode=0o700, exist_ok=True)
        if os.lstat(priv).st_uid != os.getuid() or os.path.islink(priv):
            raise PermissionError(f"{priv} owned by another uid")
        os.chmod(priv, 0o700)  # repair a pre-existing looser dir
    except (PermissionError, OSError):
        priv = tempfile.mkdtemp(prefix="calaspark-pyfiles-")
    zpath = os.path.join(priv, f"calaspark-{digest}.zip")
    reuse = False
    if os.path.exists(zpath):
        with open(zpath, "rb") as fh:
            reuse = (
                hashlib.sha256(fh.read()).hexdigest()[:16] == digest
            )
    if not reuse:
        # mkstemp (0600, unpredictable name) + atomic rename: no
        # window where a partial or attacker-controlled file sits at
        # the final path.
        fd, tmp = tempfile.mkstemp(dir=priv, suffix=".zip.tmp")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(payload)
            os.replace(tmp, zpath)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    return zpath


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    nanosAsLong and timeZone are load-bearing for the correctness
    contract (events timestamps), so a failure to set them is logged
    loudly instead of silently swallowed.

    Idempotent per session and guarded as such: every `conf.set` is
    a py4j round trip, and `load_table` calls prepare() on every
    table load (~680 times per bench run), so after the first
    successful pass the confs are only re-applied if someone
    changed them — a cheap local check against the session handle
    would not see JVM-side mutation, so the guard lives on the
    session object and the single-session engine contract
    (streaming/windows.py) covers the rest.
    """
    if getattr(spark, "_calaspark_prepared", False):
        return spark
    all_set = True
    try:
        _ship_package(spark)
    except Exception as e:  # pragma: no cover - locked-down contexts
        import warnings

        warnings.warn(
            f"calaspark: could not ship package to executors ({e}); "
            "worker-side module references may fail on foreign sessions",
            RuntimeWarning,
            stacklevel=2,
        )
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:  # conf locked down on this session
            import warnings

            warnings.warn(
                f"calaspark: could not set {k}={v} ({e}); "
                "timestamp semantics may differ from the declared contract",
                RuntimeWarning,
                stacklevel=2,
            )
            all_set = False  # leave unguarded so the next call retries
    if all_set:
        spark._calaspark_prepared = True
    return spark


def get_spark(app_name: str = "calaspark") -> SparkSession:
    """Build the tuned local session used by tests and bench."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Shuffle parallelism ~ cores; AQE coalesces small partitions
        # at runtime so over-provisioning here is harmless at scale.
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("CALASPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return prepare(builder.getOrCreate())
