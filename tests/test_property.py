"""Property-based tests (hypothesis) for the custom operators whose
correctness rests on algebraic invariants rather than fixtures —
the reference's exhaustive-fixture strategy (SURVEY.md §5) adapted
to randomized search. One Spark job per example is too slow, so each
property collects ONE batch of randomized cases into a single
DataFrame and checks all cases in one pass against a pure-Python
reference implementation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# keys deliberately tiny so collisions/matches are dense
_EDGE = st.tuples(st.integers(0, 25), st.integers(0, 25))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(_EDGE, min_size=0, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    """min-label propagation ≡ union-find on arbitrary small graphs
    (self-loops, duplicates, both orientations, disconnected)."""
    from calaspark.ops.components import connected_components

    if not edges:
        return
    # pure-Python reference: union-find with min-representative
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    expected = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {
        r["vertex"]: r["comp"]
        for r in connected_components(df, max_iter=60).collect()
    }
    assert got == expected


@st.composite
def _interval_case(draw):
    lower = draw(st.integers(-120, 120))
    span = draw(st.integers(1, 240))
    lefts = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 900)),
            min_size=1, max_size=15,
        )
    )
    rights = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 900)),
            min_size=1, max_size=15,
        )
    )
    return lower, lower + span, lefts, rights


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_interval_case())
def test_interval_join_matches_reference(spark, case):
    """Bin-bucketed interval join ≡ the O(n²) reference on random
    key/offset sets, including negative lower bounds (windows that
    reach BACKWARD in time) and boundary hits."""
    from calaspark.ops.rangejoin import interval_join

    lower, upper, lefts, rights = case
    base = 1_700_000_000  # fixed epoch anchor

    left = spark.createDataFrame(
        [(i, k, base + off) for i, (k, off) in enumerate(lefts)],
        "lid long, k int, lep long",
    ).select("lid", "k", F.col("lep").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(j, k, base + off) for j, (k, off) in enumerate(rights)],
        "rid long, k int, rep long",
    ).select("rid", "k", F.col("rep").cast("timestamp").alias("rt"))

    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, left_ts="lt", right_ts="rt",
            lower=lower, upper=upper, on=("k",),
        ).collect()
    }
    expected = {
        (i, j)
        for i, (lk, lo) in enumerate(lefts)
        for j, (rk, ro) in enumerate(rights)
        if lk == rk and lo + lower <= ro < lo + upper
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_interval_case())
def test_interval_join_left_outer_ms_matches_reference(spark, case):
    """how='left' at unit='ms' ≡ the O(n²) reference: every matched
    pair appears exactly as in the inner join, every unmatched left
    row appears EXACTLY ONCE with null right columns (never one row
    per probed bin), and sub-second offsets resolve correctly."""
    from calaspark.ops.rangejoin import interval_join

    lower, upper, lefts, rights = case
    base_ms = 1_700_000_000_000  # epoch anchor, offsets now MILLIS

    left = spark.createDataFrame(
        [(i, k, base_ms + off) for i, (k, off) in enumerate(lefts)],
        "lid long, k int, lep long",
    ).select(
        "lid", "k", F.timestamp_millis(F.col("lep")).alias("lt")
    )
    right = spark.createDataFrame(
        [(j, k, base_ms + off) for j, (k, off) in enumerate(rights)],
        "rid long, k int, rep long",
    ).select(
        "rid", "k", F.timestamp_millis(F.col("rep")).alias("rt")
    )

    rows = interval_join(
        left, right, left_ts="lt", right_ts="rt",
        lower=lower, upper=upper, on=("k",),
        how="left", left_id="lid", unit="ms",
    ).collect()

    expected_pairs = {
        (i, j)
        for i, (lk, lo) in enumerate(lefts)
        for j, (rk, ro) in enumerate(rights)
        if lk == rk and lo + lower <= ro < lo + upper
    }
    matched_left = {i for i, _ in expected_pairs}

    got_pairs = {(r["lid"], r["rid"]) for r in rows if r["rid"] is not None}
    assert got_pairs == expected_pairs
    # unmatched lefts: exactly once each, right columns all null
    null_rows = [r for r in rows if r["rid"] is None]
    assert sorted(r["lid"] for r in null_rows) == sorted(
        set(range(len(lefts))) - matched_left
    )
    assert all(r["rt"] is None for r in null_rows)


_ROW = st.tuples(
    st.integers(0, 8),                       # key (dense → collisions)
    st.integers(0, 50),                      # version
    st.one_of(st.none(), st.text("abc", max_size=3)),  # payload (nullable)
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    first=st.lists(_ROW, min_size=1, max_size=15),
    second=st.lists(_ROW, min_size=1, max_size=15),
)
def test_merge_upsert_latest_wins_and_idempotent(spark, tmp_path_factory, first, second):
    """merge_upsert ≡ the pure-Python 'newest (version, payload) per
    key, later batch beats earlier' fold; re-applying the last batch
    is a no-op (the effectively-once property the streaming sink
    relies on)."""
    from calaspark.streaming import merge_upsert, read_upsert_table

    schema = "k long, ver long, payload string"
    tgt = str(tmp_path_factory.mktemp("merge") / "tgt")

    def ref_fold(state, rows):
        # within a batch: max (ver, payload-as-tiebreak is not needed:
        # latest_per_key orders by ver desc, k asc — ties on (k, ver)
        # are resolved by row_number nondeterministically, so the
        # strategy must not generate duplicate (k, ver) pairs)
        best = {}
        for k, v, p in rows:
            if k not in best or v > best[k][0]:
                best[k] = (v, p)
        state.update(best)
        return state

    # drop duplicate (k, ver) pairs — within-batch ties have no
    # deterministic winner by design (version_cols must totally order)
    def dedup(rows):
        seen, out = set(), []
        for k, v, p in rows:
            if (k, v) not in seen:
                seen.add((k, v))
                out.append((k, v, p))
        return out

    first, second = dedup(first), dedup(second)
    expected: dict = {}
    for batch in (first, second):
        merge_upsert(
            spark,
            tgt,
            spark.createDataFrame(batch, schema),
            "k",
            [F.col("ver").desc()],
        )
        expected = ref_fold(expected, batch)
    # replay the second batch — must not change anything
    merge_upsert(
        spark, tgt, spark.createDataFrame(second, schema), "k",
        [F.col("ver").desc()],
    )
    got = {
        r["k"]: (r["ver"], r["payload"])
        for r in read_upsert_table(spark, tgt).collect()
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n_toks=st.lists(st.integers(1, 137), min_size=1, max_size=20))
def test_chunking_tiles_any_length(spark, n_toks):
    """q58's chunk arithmetic tiles every document length: starts
    step by the stride from 0, the last chunk reaches the final
    token, no chunk exceeds the window size."""
    size, stride = 50, 40
    rows = [(i, n) for i, n in enumerate(n_toks)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    chunks = (
        df.select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))).alias("s"),
        )
        .select(
            "doc_id", "n", "s",
            F.least(F.lit(size), F.col("n") - F.col("s")).alias("clen"),
        )
    )
    per_doc = chunks.groupBy("doc_id", "n").agg(
        F.min("s").alias("first"),
        F.max(F.col("s") + F.col("clen")).alias("covered"),
        F.max("clen").alias("maxlen"),
        F.count("*").alias("n_chunks"),
    )
    for r in per_doc.collect():
        n = r["n"]
        assert r["first"] == 0
        assert r["covered"] == n
        assert r["maxlen"] <= size
        import math
        assert r["n_chunks"] == max(1, math.ceil(n / stride) if n % stride else n // stride)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(st.integers(0, 400), min_size=1, max_size=120),
    bucket=st.sampled_from([3, 8, 64]),
)
def test_islands_property(spark, keys, bucket):
    """Bucketed islands ≡ the sequential run scan for ANY key set
    and bucket size (singletons, runs across many buckets, keys on
    bucket edges)."""
    from calaspark.ops.islands import islands

    df = spark.createDataFrame([(k,) for k in keys], "k: long")
    got = sorted(
        (r["start_key"], r["end_key"], r["n_keys"])
        for r in islands(df, "k", bucket_size=bucket).collect()
    )
    runs, s, prev = [], None, None
    for k in sorted(keys):
        if s is None:
            s = prev = k
        elif k == prev + 1:
            prev = k
        else:
            runs.append((s, prev, prev - s + 1))
            s = prev = k
    runs.append((s, prev, prev - s + 1))
    assert got == sorted(runs)


_WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(_WORDS, min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
def test_ssjoin_plans_agree_on_random_corpora(spark, texts):
    """Count-join ≡ prefix-filter ≡ brute force on random tiny-vocab
    corpora (dense shingle collisions — the adversarial case for
    both candidate schemes)."""
    from calaspark.ops.ssjoin import (
        jaccard_count_join,
        jaccard_prefix_filter,
        shingle_rows,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    sh = shingle_rows(df, k=3)

    def norm(res):
        return sorted(
            (r["doc_a"], r["doc_b"], r["n_inter"], r["n_union"])
            for r in res.collect()
        )

    got_cj = norm(jaccard_count_join(sh, 1, 2))
    assert got_cj == norm(jaccard_prefix_filter(sh, 1, 2))

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in docs}
    expect = sorted(
        (a, b, len(sets[a] & sets[b]), len(sets[a] | sets[b]))
        for a in sets
        for b in sets
        if a < b and 3 * len(sets[a] & sets[b]) >= len(sets[a] | sets[b]) + len(sets[a] & sets[b])
    )
    assert got_cj == expect


# ---- BPE greedy merge fold (ops/bpe._merge_pair) --------------------

_SYM = st.sampled_from(["a", "b", "ab", "ba", "c", "'", "\\", "a'\\b"])


def _merge_ref(syms: list[str], left: str, right: str) -> list[str]:
    """Pure-Python greedy left-to-right non-overlapping merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(st.lists(_SYM, min_size=0, max_size=8), min_size=1, max_size=12),
    pair=st.tuples(_SYM, _SYM),
)
def test_bpe_merge_fold_matches_reference(spark, words, pair):
    """ops/bpe._merge_pair (one aggregate fold) ≡ the pure-Python
    greedy merge on arbitrary symbol arrays — including overlapping
    runs (aaa + (a,a) → [aa, a]), pairs built from earlier fused
    symbols, and empty arrays. One Spark job checks every example."""
    import pyspark.sql.functions as F

    from calaspark.ops.bpe import _merge_pair

    left, right = pair
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, syms array<string>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", _merge_pair("syms", left, right).alias("m")
        ).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _merge_ref(w, left, right), (w, left, right)


# ---- BPE chained encode (ops/bpe.bpe_apply_merges) ------------------

#: lowercase words so every generated merge symbol is a substring
#: class the encoder contract allows ([a-z]+, regex-safe both engines)
_WORD = st.text(alphabet="ab", min_size=0, max_size=10)


def _ref_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Classic BPE application: each merge in rank order, greedy
    left-to-right (single pass ≡ repeat-until-absent — fusing (l, r)
    can't create a new (l, r))."""
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(_WORD, min_size=1, max_size=10, unique=True),
    data=st.data(),
)
def test_bpe_apply_merges_matches_reference(spark, words, data):
    """ops/bpe.bpe_apply_merges (the q189 encoder: chained folds +
    per-chain persist) ≡ classic BPE application for RANDOM merge
    lists whose later ranks may reference symbols fused by earlier
    ranks — the composition the single-pair property test cannot
    reach. Merge lists are built rank by rank from the closure of
    symbols reachable so far, so every list is a valid BPE table."""
    import pyspark.sql.functions as F

    from calaspark.ops.bpe import _chars, bpe_apply_merges

    symbols = ["a", "b"]
    merges: list[tuple[str, str]] = []
    n_merges = data.draw(st.integers(min_value=1, max_value=5))
    for _ in range(n_merges):
        l = data.draw(st.sampled_from(symbols))
        r = data.draw(st.sampled_from(symbols))
        merges.append((l, r))
        fused = l + r
        if fused not in symbols and len(fused) <= 8:
            symbols.append(fused)
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", _chars("w").alias("syms")
    )
    enc = bpe_apply_merges(df, merges, chain=2)
    got = {r["w"]: r["syms"] for r in enc.collect()}
    enc.unpersist()
    for w in words:
        assert got[w] == _ref_apply(w, merges), (w, merges, got[w])


@st.composite
def _gap_fill_series(draw):
    """Up to 8 per-user hour→cents series (q192 reads user_id < 8).

    Cents are multiples of 25 so every double value is exact and the
    DECIMAL(14,2) cast in the query cannot round — the property then
    demands BIT-EXACT equality with the pure-Python interpolation.
    Series of length 1 (spine = one observed row, no gaps) and dense
    series (adjacent hours, no interpolation) are deliberately in
    range — the corners the fixture data may not contain.
    """
    n_users = draw(st.integers(1, 8))
    series = {}
    for u in range(n_users):
        hours = draw(
            st.lists(st.integers(0, 40), min_size=1, max_size=12, unique=True)
        )
        series[u] = {
            h: draw(st.integers(0, 400)) * 25 for h in sorted(hours)
        }
    return series


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(series=_gap_fill_series())
def test_gap_fill_linear_matches_reference(spark, series):
    """q192's spine + bracket interpolation ≡ a pure-Python exact
    rational reference on arbitrary synthetic series, bit-for-bit:
    observed rows return the stored decimal exactly and gap rows
    return float(num_cents/100) / float(gap) with the same single
    IEEE division the engine performs."""
    import tempfile
    from fractions import Fraction

    from calaspark.queries.breadth import q192_gap_fill_linear

    base = 1_700_000_000  # any positive epoch-hour-aligned base
    base -= base % 3600
    rows = [
        (u, (base + h * 3600 + 17) * 1_000_000, cents / 100.0)
        for u, hs in series.items()
        for h, cents in hs.items()
    ]
    tmp = tempfile.mkdtemp(prefix="gapfill_")
    (
        spark.createDataFrame(rows, "user_id long, us long, value double")
        .select(
            "user_id",
            F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
            "value",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/events.parquet")
    )
    got = {
        (r["user_id"], r["h_ep"]): (r["observed"], r["lin_sum_value"])
        for r in q192_gap_fill_linear(spark, tmp).collect()
    }

    expected = {}
    for u, hs in series.items():
        obs = sorted(hs)
        for h in range(obs[0], obs[-1] + 1):
            ep = base + h * 3600
            if h in hs:
                expected[(u, ep)] = (1, float(Fraction(hs[h], 100)))
            else:
                ph = max(o for o in obs if o < h)
                nh = min(o for o in obs if o > h)
                num_cents = hs[ph] * (nh - h) + hs[nh] * (h - ph)
                num = float(Fraction(num_cents, 100) * 3600)
                expected[(u, ep)] = (0, num / float((nh - ph) * 3600))
    assert got == expected


@st.composite
def _asof_case(draw):
    # keys 0..3 and ts 0..30 so equal-ts ties and dup (key, ts) right
    # rows are dense; payload values include None to exercise the
    # struct-atomicity contract (a legitimately-NULL payload column in
    # the matched row must NOT be back-filled from an older right row)
    lefts = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 30)),
            min_size=1, max_size=25,
        )
    )
    rights = draw(
        st.lists(
            st.tuples(
                st.integers(0, 3),
                st.integers(0, 30),
                st.one_of(st.none(), st.integers(-99, 99)),
            ),
            min_size=0, max_size=25,
        )
    )
    return lefts, rights


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_asof_case())
def test_asof_join_matches_naive_reference(spark, case):
    """ops/asof.py's union-sentinel plan ≡ the naive per-left-row
    argmax reference on arbitrary small tables: backward semantics
    (right.ts <= left.ts), right-before-left at equal ts, latest
    tiebreak wins among duplicate (key, ts) right rows, unmatched
    left rows keep an all-NULL payload, and a NULL payload value in
    the matched row stays NULL (atomic struct, not per-column
    back-fill)."""
    from calaspark.ops.asof import asof_join

    lefts, rights = case
    lrows = [(i, k, ts) for i, (k, ts) in enumerate(lefts)]
    rrows = [(k, ts, v, i) for i, (k, ts, v) in enumerate(rights)]
    left = spark.createDataFrame(lrows, "lid int, k int, ts int")
    right = spark.createDataFrame(rrows, "k int, ts int, val int, seq int")
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload=["val", "seq"], tiebreak="seq",
    )
    got = {r["lid"]: (r["val"], r["seq"]) for r in out.collect()}

    expected = {}
    for lid, k, ts in lrows:
        cand = [
            (rts, seq, v)
            for (rk, rts, v, seq) in rrows
            if rk == k and rts <= ts
        ]
        if cand:
            rts, seq, v = max(cand, key=lambda c: (c[0], c[1]))
            expected[lid] = (v, seq)
        else:
            expected[lid] = (None, None)
    assert got == expected


@st.composite
def _lpm_case(draw):
    # binary alphabet → dense prefix relationships; unique routes so
    # the payload attachment is deterministic (duplicate prefixes
    # collapse to an arbitrary row's payload by documented contract)
    routes = draw(
        st.lists(
            st.text(alphabet="01", min_size=1, max_size=6),
            min_size=0, max_size=15, unique=True,
        )
    )
    keys = draw(
        st.lists(
            st.text(alphabet="01", min_size=1, max_size=8),
            min_size=1, max_size=20,
        )
    )
    return routes, keys


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_lpm_case())
def test_prefix_match_join_left_and_payload_property(spark, case):
    """ops/lpm.prefix_match_join over random binary route/key sets ≡
    the naive longest-startswith scan — BOTH join modes in one draw:
    inner drops unmatched keys, left keeps them as (NULL, 0) with a
    NULL payload, matched rows attach the matched route's payload
    (its own length here, so payload correctness is checkable
    per-row), and the empty-route-set draw exercises the
    stable-schema early path."""
    from calaspark.ops.lpm import prefix_match_join

    routes, keys = case
    rdf = spark.createDataFrame(
        [(p, len(p)) for p in routes], "prefix string, plen_payload int"
    )
    ldf = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "rid int, k string"
    )

    want_inner = {}
    for i, k in enumerate(keys):
        m = [p for p in routes if k.startswith(p)]
        if m:
            best = max(m, key=len)
            want_inner[i] = (best, len(best), len(best))

    inner = {
        r["rid"]: (r["matched_prefix"], r["match_len"], r["plen_payload"])
        for r in prefix_match_join(
            ldf, rdf, key_col="k", row_key="rid",
            payload=["plen_payload"],
        ).collect()
    }
    assert inner == want_inner, (routes, keys)

    left = {
        r["rid"]: (r["matched_prefix"], r["match_len"], r["plen_payload"])
        for r in prefix_match_join(
            ldf, rdf, key_col="k", row_key="rid",
            payload=["plen_payload"], how="left",
        ).collect()
    }
    assert left == {
        i: want_inner.get(i, (None, 0, None)) for i in range(len(keys))
    }, (routes, keys)


@st.composite
def _quantile_case(draw):
    # (group, val, weight) rows: vals dense in a small range so
    # within-group duplicates and exact den*cum == num*tot ties are
    # common; negatives exercise floor() bucketing below zero
    rows = draw(
        st.lists(
            st.tuples(
                st.integers(0, 3),
                st.integers(-40, 40),
                st.integers(1, 9),
            ),
            min_size=1,
            max_size=40,
        )
    )
    den = draw(st.sampled_from([2, 4, 10]))
    nums = sorted(
        {min(draw(st.integers(1, 10)), den) for _ in range(draw(st.integers(1, 3)))}
    )
    # width 2 forces the two-level multi-bucket search path; 1024
    # collapses every group into one (possibly negative) bucket
    width = draw(st.sampled_from([2.0, 7.0, 1024.0]))
    return rows, nums, den, width


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_quantile_case())
def test_exact_quantiles_bucketed_matches_naive_reference(spark, case):
    """ops/quantile.py's two-level bucket search must equal the naive
    per-group scan implementing the declared contract — the smallest
    value whose cumulative weight satisfies den*cum >= num*tot — for
    every requested fraction, on random weighted tables with
    duplicate values, negative values, boundary ties, and both
    multi-bucket and single-bucket widths."""
    from collections import defaultdict

    from calaspark.ops.quantile import exact_quantiles_bucketed

    rows, nums, den, width = case

    # pure-Python reference at the declared (group, val) grain
    agg: dict[tuple[int, int], int] = defaultdict(int)
    for g, v, w in rows:
        agg[(g, v)] += w
    per_group: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (g, v), w in agg.items():
        per_group[g].append((v, w))
    want = {}
    for g, vw in per_group.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        for num in nums:
            cum = 0
            for v, w in vw:
                cum += w
                if den * cum >= num * tot:
                    want[(g, num)] = (v, tot)
                    break

    grain = (
        spark.createDataFrame(rows, "g int, v int, w int")
        .groupBy("g", "v")
        .agg(F.sum("w").alias("w"))
    )
    got = {
        (r["g"], r["_num"]): (r["q"], r["tot"])
        for r in exact_quantiles_bucketed(
            grain, "g", "v", "w", nums, den, bucket_width=width
        ).collect()
    }
    assert got == want, (rows, nums, den, width)
