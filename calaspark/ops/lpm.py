"""Longest-prefix-match (LPM) join — the E1-family operator behind
route/IP/dictionary-prefix matching (round-9 backlog; round-13
verdict ask 5).

Reference anchor: the reference's lookup tables are exact-code joins
(`calaccess_raw/annotations/__init__.py §FilingForm` resolution is
dict-keyed); LPM generalizes that to hierarchical code spaces
(dialing prefixes, ZIP prefixes, IP routes) the way a warehouse user
would expect from SURVEY.md §2.5 E1's join family.

Why not a LIKE-prefix theta join: ``lookup JOIN routes ON
lookup.key LIKE routes.prefix || '%'`` has no equi key, so Spark
plans a broadcast-nested-loop (or cartesian) — O(|lookup|·|routes|)
compare work that dies long before 100 TB. The classic decomposition
is EXPAND-ON-PREFIX-LENGTH + EQUI-JOIN:

1. Collect the DISTINCT prefix lengths present in the route table —
   a model-sized driver collect by construction: a route table has
   at most ``max(len(prefix))`` distinct lengths (IPv4 tables ≤ 32,
   dialing plans < 10) regardless of how many prefixes or how much
   lookup data there is. Same collect class as q71's query batch
   and the IVF centroids.
2. Explode each lookup row into one probe arm per length L:
   ``(substring(key, 1, L), L)`` — bounded fan-out ×|lengths|, a
   generator projection, no shuffle.
3. Hash equi-join probe arms against routes on (prefix, plen). The
   join ships only the arms; AQE broadcasts a small route table and
   degrades to a shuffle join for a huge one — semantics identical.
   Joining on plen as well as the prefix string closes the
   short-key corner: a lookup key shorter than L yields an arm
   whose substring is the whole key, which could textually equal a
   SHORTER route prefix from a different arm; the plen equality
   makes that arm match only length-L routes.
4. Longest-wins: ``row_number() OVER (PARTITION BY row key ORDER BY
   plen DESC, prefix)`` filtered to 1 — Spark rewrites the rank-
   filter into WindowGroupLimit, so the per-key state is one row,
   and the partition key is the lookup row key (high cardinality —
   parallelism scales with data, never with the route table).

Spark citations: explode F:14939, substring F:18609, row_number
F:22953 (see SURVEY.md §0 for the path convention).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: A route table with more distinct prefix lengths than this is not a
#: prefix hierarchy (IPv4 = 32; dialing plans < 10); failing loudly
#: beats silently exploding every lookup row ×1000.
MAX_DISTINCT_LENGTHS = 64


def prefix_match_join(
    lookup: DataFrame,
    routes: DataFrame,
    *,
    key_col: str,
    row_key: str,
    prefix_col: str = "prefix",
    payload: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Longest-prefix-match: each ``lookup`` row joined to the
    LONGEST ``routes.prefix_col`` value that prefixes its
    ``key_col`` string (ties are impossible at equal length — two
    distinct equal-length prefixes cannot both prefix one key).
    ``row_key`` must uniquely identify a lookup row (it is the
    longest-wins window key). Returns all lookup columns plus
    ``matched_prefix``/``match_len`` and any ``payload`` columns
    from routes. ``prefix_col`` should be unique in ``routes`` (a
    route table's defining property); duplicate prefixes are
    collapsed to ONE arbitrary row's payload by the dropDuplicates
    below — dedupe with an explicit priority rule upstream if route
    payloads can conflict.

    ``how="inner"`` drops unmatched lookup rows; ``how="left"``
    keeps them with ``matched_prefix`` NULL and ``match_len`` 0 —
    IN THE SAME SINGLE PASS (the probe arms left-join routes and
    unmatched arms rank below every real match via nulls-last
    ordering), so left semantics cost no second lookup scan, no
    anti-join and no extra shuffle — the composition
    ``inner + anti-join`` would re-derive the whole match subtree,
    exactly the round-9 repeated-scan pathology.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # Name hygiene up front: a payload column shadowing a lookup
    # column would make the bare-string output select ambiguous
    # after the join, and a caller column named like an internal
    # alias would break the (_pfx, _plen) join resolution — both
    # surface as confusing AnalysisExceptions deep in the plan, so
    # fail fast with the actual contract instead.
    internal = {"_pfx", "_plen", "_hit", "_rn", "_arm"}
    clash = internal & set(lookup.columns) | internal & set(payload or [])
    if clash:
        raise ValueError(f"reserved column names in inputs: {sorted(clash)}")
    # The OUTPUT aliases are reserved too: a lookup/payload column
    # named matched_prefix or match_len would silently duplicate an
    # output column name — the same confusing-failure class as the
    # internal aliases above.
    out_clash = {"matched_prefix", "match_len"} & (
        set(lookup.columns) | set(payload or [])
    )
    if out_clash:
        raise ValueError(
            f"output column names shadowed by inputs: {sorted(out_clash)} — "
            "alias them in `lookup`/`routes` first"
        )
    overlap = set(payload or []) & set(lookup.columns)
    if overlap:
        raise ValueError(
            f"payload columns shadow lookup columns: {sorted(overlap)} — "
            "alias them in `routes` first"
        )
    from .materialize import materialize

    r = (
        routes.select(
            F.col(prefix_col).alias("_pfx"),
            F.length(prefix_col).alias("_plen"),
            *(payload or []),
        )
        .dropDuplicates(["_pfx"])
        .withColumn("_hit", F.lit(1))
    )
    # Two consumers read `r` — the distinct-lengths collect below and
    # the probe equi-join — so cut the lineage once (the q192/round-9
    # repeated-scan discipline): without this the routes subtree
    # (scan + explode + dropDuplicates) executes twice.
    r = materialize(r)
    lengths = sorted(
        x["_plen"] for x in r.select("_plen").distinct().collect()
    )
    if len(lengths) > MAX_DISTINCT_LENGTHS:
        raise ValueError(
            f"{len(lengths)} distinct prefix lengths — not a prefix "
            f"hierarchy (max {MAX_DISTINCT_LENGTHS})"
        )
    out_cols = [
        *lookup.columns,
        F.when(F.col("_hit").isNotNull(), F.col("_pfx")).alias(
            "matched_prefix"
        ),
        F.coalesce(
            F.when(F.col("_hit").isNotNull(), F.col("_plen")), F.lit(0)
        ).alias("match_len"),
        *(payload or []),
    ]
    if not lengths:  # empty route table → no matches, stable schema
        empty = lookup.join(r, F.lit(False), how)
        return empty.select(*out_cols)
    arms = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(length).cast("int").alias("_plen"),
                    F.substring(F.col(key_col), 1, length).alias("_pfx"),
                )
                for length in lengths
            ]
        )
    )
    probe = lookup.withColumn("_arm", arms).select(
        *lookup.columns, F.col("_arm._plen").alias("_plen"),
        F.col("_arm._pfx").alias("_pfx"),
    )
    # Matched arms first (longest prefix first); in left mode the
    # unmatched arms sort after every real match, and whichever one
    # wins, the selected output (NULL prefix, len 0) is identical —
    # the _plen tiebreak just makes the winning arm deterministic.
    w = Window.partitionBy(row_key).orderBy(
        F.desc_nulls_last(
            F.when(F.col("_hit").isNotNull(), F.col("_plen"))
        ),
        F.asc("_plen"),
        F.asc("_pfx"),
    )
    return (
        probe.join(r, ["_pfx", "_plen"], how)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*out_cols)
    )


def cidr_to_prefix(cidr):
    """Column helper: an IPv4 CIDR string (``'10.1.0.0/16'``) → the
    fixed-length BIT-STRING prefix (``'0000101000000001'``) that
    makes :func:`prefix_match_join` an exact IP route-table lookup
    (keys converted with :func:`ip_to_bits`). All JVM-side builtins
    — split/cast/shifts/conv — no UDF; malformed input yields NULL
    (try-cast semantics), which a router table build should filter.
    A /0 route (default gateway) yields the empty string: Spark's
    ``substring(key, 1, 0)`` is also empty, so the default route
    matches every key at length 0 — exactly LPM's semantics, but
    note ``prefix_match_join`` drops empty prefixes only via the
    length-0 probe arm matching everything, so keep at most ONE /0
    route (two distinct length-0 prefixes cannot exist anyway).
    """
    parts = F.split(F.col(cidr) if isinstance(cidr, str) else cidr, "[/.]")
    octets = [F.try_element_at(parts, F.lit(i)).try_cast("long") for i in (1, 2, 3, 4)]
    masklen = F.try_element_at(parts, F.lit(5)).try_cast("int")
    ip = (
        F.shiftleft(octets[0], 24)
        + F.shiftleft(octets[1], 16)
        + F.shiftleft(octets[2], 8)
        + octets[3]
    )
    bits = F.lpad(F.conv(ip.cast("string"), 10, 2), 32, "0")
    # exactly a.b.c.d/m — 5 split parts; without this check an input
    # like '1.2.3.4.5/16' or '10.0.0.0/8.5' reinterprets segments
    # (octet 5 read as the mask) and emits a WRONG short prefix that
    # then steals longest-prefix matches (round-14 review find)
    valid = (F.size(parts) == 5) & masklen.isNotNull()
    valid = valid & (masklen >= 0) & (masklen <= 32)
    for o in octets:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    return F.when(valid, F.substring(bits, 1, masklen).cast("string"))


def ip_to_bits(ip_col):
    """Column helper: a dotted-quad IPv4 string → its 32-char
    bit-string, the lookup-key form matching :func:`cidr_to_prefix`
    prefixes. Malformed input yields NULL."""
    parts = F.split(
        F.col(ip_col) if isinstance(ip_col, str) else ip_col, "\\."
    )
    octets = [F.try_element_at(parts, F.lit(i)).try_cast("long") for i in (1, 2, 3, 4)]
    ip = (
        F.shiftleft(octets[0], 24)
        + F.shiftleft(octets[1], 16)
        + F.shiftleft(octets[2], 8)
        + octets[3]
    )
    valid = F.lit(True)
    for o in octets:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    valid = valid & (F.size(parts) == 4)
    return F.when(valid, F.lpad(F.conv(ip.cast("string"), 10, 2), 32, "0"))
