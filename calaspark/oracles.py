"""DuckDB oracle SQL for every declared contract query (SURVEY.md §2.6).

Each statement is the ANSI-SQL twin of the same-named Spark query in
``calaspark/queries/``; the driver runs both at sf0.01 and compares
row count + schema + order-insensitive value hash. Dialect deltas
(Spark ↔ DuckDB) are catalogued in SURVEY.md §7's watch list:
``date_format``→``strftime``, ``split``→``string_split``,
``get_json_object``→``json_extract_string``, ``pmod``→``%``,
``percentile``→``quantile_cont``, pivot→``COUNT(*) FILTER``,
``grouping_id()``→``2*grouping(a)+grouping(b)``, no ``initcap`` →
emulated per word.

Determinism rules (SURVEY.md §2.6): decimal-exact money aggregation,
no raw timestamps in output, total orders before LIMIT, averages as
decimal-sum/count divided in double.
"""

from __future__ import annotations

# Shared fragments ----------------------------------------------------

# exact decimal money sum → ROUND → DOUBLE  (rule 1)
_MS = "CAST(ROUND(SUM(CAST({c} AS DECIMAL(12,2))), 2) AS DOUBLE)"
# decimal-sum / count average, division in double  (rule 4)
_MA = (
    "CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE)"
    " / CAST(COUNT({c}) AS DOUBLE)"
)

ORACLES: dict[str, str] = {}

ORACLES["q01"] = f"""
SELECT
  COUNT(*) AS n_rows,
  COUNT(DISTINCT l_orderkey) AS n_orders,
  {_MS.format(c='l_quantity')} AS sum_qty,
  {_MA.format(c='l_quantity')} AS avg_qty,
  CAST(MIN(l_shipdate) AS DATE) AS min_ship,
  CAST(MAX(l_shipdate) AS DATE) AS max_ship
FROM lineitem
"""

ORACLES["q02"] = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_shipdate AS DATE) AS ship_date,
  l_returnflag AS returnflag,
  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))), 2)
       AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_returnflag <> 'N'
"""

ORACLES["q03"] = """
SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

ORACLES["q04"] = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
ORDER BY c_custkey
LIMIT 100 OFFSET 100
"""

ORACLES["q05"] = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {_MS.format(c='l_quantity')} AS sum_qty,
  {_MS.format(c='l_extendedprice')} AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2)
      AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
      * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))), 2)
      AS DOUBLE) AS sum_charge,
  {_MA.format(c='l_quantity')} AS avg_qty,
  {_MA.format(c='l_extendedprice')} AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE)
    / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q06"] = """
SELECT
  o_custkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 200000
"""

ORACLES["q07"] = """
SELECT
  r_name,
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2)
      AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY r_name, n_name
"""

ORACLES["q08"] = """
SELECT
  c_custkey,
  c_name,
  COUNT(o_orderkey) AS n_orders,
  COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE),
           0.0) AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""

ORACLES["q09"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""

ORACLES["q10"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""

ORACLES["q11"] = f"""
SELECT
  r_name,
  COUNT(*) AS n_suppliers,
  {_MS.format(c='s_acctbal')} AS total_acctbal,
  {_MA.format(c='s_acctbal')} AS avg_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

ORACLES["q12"] = f"""
SELECT
  p_brand,
  COUNT(*) AS n_items,
  {_MS.format(c='l_quantity')} AS sum_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 5 AND p_size + 5
GROUP BY p_brand
"""

ORACLES["q13"] = """
SELECT o_custkey, rn, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""

ORACLES["q13_latest"] = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date,
       o_totalprice
FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
"""

ORACLES["q14"] = f"""
SELECT
  l_returnflag,
  l_linestatus,
  2 * grouping(l_returnflag) + grouping(l_linestatus) AS gid,
  {_MS.format(c='l_quantity')} AS sum_qty,
  {_MS.format(c='l_extendedprice')} AS sum_base_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLES["q15"] = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  2 * grouping(o_orderstatus) + grouping(o_orderpriority) AS gid,
  COUNT(*) AS n,
  {_MS.format(c='o_totalprice')} AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ORACLES["q16"] = """
SELECT
  n_name,
  min_by(c_name, _enc) AS poorest,
  max_by(c_name, _enc) AS richest,
  CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_positive,
  COUNT(*) AS n_customers
FROM (
  SELECT n_name, c_name, c_acctbal, c_custkey,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
           * 10000000000 + c_custkey AS _enc
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY n_name
"""

ORACLES["q17"] = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 2) AS DOUBLE)
    AS running_total,
  lag(o_totalprice) OVER w AS prev_price,
  lead(o_totalprice) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

ORACLES["q18"] = """
SELECT
  o_orderpriority,
  COUNT(DISTINCT o_custkey) AS n_custs,
  COUNT(DISTINCT o_orderstatus) AS n_statuses,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""

ORACLES["q18_distinct_rows"] = """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
"""

ORACLES["q19"] = """
SELECT
  l_returnflag,
  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
  ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["q20"] = """
WITH building AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), open_orders AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
)
SELECT 'union_all' AS tag, custkey FROM (
  SELECT custkey FROM building UNION ALL SELECT custkey FROM open_orders
)
UNION ALL
SELECT 'intersect' AS tag, custkey FROM (
  SELECT custkey FROM building INTERSECT SELECT custkey FROM open_orders
)
UNION ALL
SELECT 'except' AS tag, custkey FROM (
  SELECT custkey FROM building EXCEPT SELECT custkey FROM open_orders
)
"""

# ---------------------------------------------------------------- ETL twins

ORACLES["q21"] = """
SELECT
  p_partkey,
  upper(p_name) AS up,
  lower(p_type) AS lo,
  substring(p_name, 1, 10) AS sub,
  concat_ws('|', p_brand, p_type) AS cw,
  lpad(p_brand, 12, '*') AS lp,
  trim('  ' || p_name || '  ') AS tr,
  translate(p_name, 'ae', '43') AS tl,
  array_to_string(
    list_transform(string_split(p_name, ' '),
                   w -> upper(substring(w,1,1)) || lower(substring(w,2))),
    ' ') AS ic,
  CAST(length(p_name) AS BIGINT) AS ln,
  CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev
FROM part
WHERE contains(p_name, 'e') OR p_name LIKE 'red%'
"""

ORACLES["q22"] = """
SELECT
  doc_id,
  regexp_extract(text, '^(\\w+)', 1) AS first_tok,
  nullif(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1F]', ' ', 'g'),
                             ' +', ' ', 'g')), '') AS cleaned,
  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
  CAST(length(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1F]', ' ', 'g'),
                                  ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM documents
"""

ORACLES["q23"] = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS r1,
  abs(l_extendedprice - 50000) AS abs_diff,
  CAST(ceil(l_quantity) AS BIGINT) AS ce,
  CAST(floor(l_quantity) AS BIGINT) AS fl,
  l_orderkey % 7 AS md,
  sqrt(l_quantity) AS sq,
  l_quantity * l_quantity AS q2
FROM lineitem
"""

ORACLES["q24"] = """
SELECT
  o_orderkey,
  strftime(o_orderdate, '%-m/%-d/%Y') AS s1,
  CAST(strptime(strftime(o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y') AS DATE)
    AS parsed,
  CAST(strptime(strftime(o_orderdate, '%-m/%-d/%Y') || ' 12:00:00 AM',
                '%-m/%-d/%Y %-I:%M:%S %p') AS DATE) AS parsed_ts_date,
  CAST(hour(strptime(strftime(o_orderdate, '%-m/%-d/%Y') || ' 12:00:00 AM',
                     '%-m/%-d/%Y %-I:%M:%S %p')) AS BIGINT) AS parsed_hour,
  CAST(strptime(strftime(o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y') AS DATE)
    = CAST(o_orderdate AS DATE) AS roundtrip_ok
FROM orders
"""

ORACLES["q25"] = """
SELECT
  o_orderkey,
  CAST(o_orderdate AS DATE) AS d,
  CAST(year(o_orderdate) AS BIGINT) AS y,
  CAST(month(o_orderdate) AS BIGINT) AS m,
  CAST(day(o_orderdate) AS BIGINT) AS dy,
  date_trunc('month', CAST(o_orderdate AS DATE)) AS mstart,
  CAST(o_orderdate AS DATE) + 7 AS d7,
  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT)
    AS days_to_98,
  last_day(CAST(o_orderdate AS DATE)) AS ld,
  CAST(datediff('month', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT)
    AS months_to_98
FROM orders
"""

ORACLES["q25_monthly"] = """
SELECT
  date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1
"""

ORACLES["q26"] = """
SELECT
  p_partkey,
  nullif(CASE WHEN p_size % 3 = 0 THEN '' ELSE p_type END, '') AS cleaned,
  CASE WHEN (CASE WHEN p_size % 2 = 0 THEN 'Y' ELSE 'N' END) = 'Y'
       THEN 1 ELSE 0 END AS flag_int,
  coalesce(nullif(CASE WHEN p_size % 3 = 0 THEN '' ELSE p_type END, ''),
           'UNKNOWN') AS coal,
  CAST(nullif(CASE WHEN p_size % 3 = 0 THEN '' ELSE p_type END, '') IS NULL
       AS INT) AS is_null
FROM part
"""

ORACLES["q27"] = """
WITH mangled AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN substring(props, 2) ELSE props END AS m
  FROM events
), checked AS (
  -- invalid JSON is NULLed at the ARGUMENT, not in a predicate
  -- branch (round-13 sf0.1 sweep find): DuckDB's vectorized CASE
  -- does not guarantee short-circuit, so json_extract_string could
  -- still run on (and throw for) rows json_valid already excluded;
  -- extracting from the CASE's result value is safe under any
  -- evaluation order and matches Spark's NULL-on-malformed
  SELECT event_id,
         json_extract_string(CASE WHEN json_valid(m) THEN m END, '$.k') AS k
  FROM mangled
)
SELECT
  CASE WHEN k IS NOT NULL THEN 'good' ELSE 'quarantine' END AS cls,
  COUNT(*) AS n,
  MIN(event_id) AS min_id,
  MAX(event_id) AS max_id
FROM checked
GROUP BY 1
"""

ORACLES["q28"] = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
    / CAST(COUNT(json_extract_string(props, '$.k')) AS DOUBLE) AS avg_k
FROM events
GROUP BY event_type
"""

# Extensions Q29–Q36 (SURVEY.md §2.6) ---------------------------------

ORACLES["q29"] = """
SELECT term, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
WHERE term <> ''
GROUP BY term
ORDER BY n DESC, term ASC
LIMIT 20
"""

ORACLES["q29_doc_distinct"] = """
SELECT
  doc_id,
  CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                     x -> x <> ''))) AS BIGINT) AS n_distinct
FROM documents
"""

# q30: SUM(CASE) with the same fixed event-type list as the Spark pivot.
_PIVOT_COLS = ",\n  ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t}"
    for t in ("click", "error", "purchase", "signup", "view")
)
ORACLES["q30"] = f"""
SELECT
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  {_PIVOT_COLS}
FROM events
GROUP BY 1
"""

# q31: each event explodes into its 2 candidate 5-min-aligned slots.
# ep is floored epoch seconds; window bounds are integer seconds, so
# flooring never moves an event across a boundary (SURVEY §7).
ORACLES["q31"] = f"""
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, value FROM events
), s AS (
  SELECT ((ep // 300) - g.k) * 300 AS wstart, ep, value
  FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) g
)
SELECT
  wstart,
  COUNT(*) AS n,
  {_MS.format(c='value')} AS sum_value
FROM s
WHERE ep >= wstart AND ep < wstart + 600
GROUP BY wstart
"""

ORACLES["q32"] = """
SELECT DISTINCT
  event_id,
  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
  user_id, event_type, value, props
FROM (SELECT * FROM events UNION ALL SELECT * FROM events) u
"""

ORACLES["q32_keyed"] = """
WITH u AS (
  SELECT * FROM events
  UNION ALL
  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type,
         value, props
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
  FROM u
)
SELECT
  event_id,
  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
  user_id, event_type, value, props
FROM r WHERE rn = 1
"""

# q33: integer threshold test (3*inter >= inter+union  ⟺  J >= 0.5)
# so membership is float-free; sim is reported rounded on top.
ORACLES["q33"] = """
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS toks
  FROM documents
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
         CAST(len(a.toks) + len(b.toks)
              - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_union
  FROM t a JOIN t b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, n_inter, n_union,
       ROUND(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 4) AS sim
FROM p
WHERE 3 * n_inter >= n_union + n_inter
"""

# q34: float→double BEFORE arithmetic; sequential index-order dot
# product in both engines (Spark zip_with+aggregate fold ↔ DuckDB
# list_dot_product loop); ROUND(.,4) + vec_id tie-break totalize.
ORACLES["q34"] = """
WITH d AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), q AS (
  SELECT e AS qe FROM d WHERE vec_id = 0
)
SELECT
  vec_id,
  ROUND(list_dot_product(e, qe)
        / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))),
        4) AS sim
FROM d CROSS JOIN q
ORDER BY sim DESC, vec_id ASC
LIMIT 10
"""

ORACLES["q35"] = f"""
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
  COUNT(*) AS n,
  {_MS.format(c='value')} AS sum_value,
  CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchase
FROM events
GROUP BY 1
"""

# q36: all arithmetic on floored epoch-second BIGINTs under the total
# order (ep, event_id); SUM window cast (DuckDB SUM(int)→HUGEINT).
ORACLES["q36"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
), f AS (
  SELECT *,
         CASE WHEN lag(ep) OVER w IS NULL
                OR ep - lag(ep) OVER w > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
), s AS (
  SELECT *,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ep, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM f
)
SELECT user_id, session_id,
       MIN(ep) AS sess_start, MAX(ep) AS sess_end,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, session_id
"""

# Breadth Q37–Q38 (E3 window family, E1 outer/cross joins) ------------

ORACLES["q37"] = """
SELECT
  o_orderkey,
  o_custkey,
  CAST(rank() OVER wp AS BIGINT) AS rnk,
  CAST(dense_rank() OVER wp AS BIGINT) AS drnk,
  CAST(ntile(4) OVER wt AS BIGINT) AS quartile,
  percent_rank() OVER wp AS prnk,
  cume_dist() OVER wp AS cdist,
  first_value(o_orderkey) OVER wt AS first_key,
  last_value(o_orderkey) OVER (PARTITION BY o_custkey
      ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    AS last_key,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wr, 2) AS DOUBLE)
    AS range_sum
FROM orders
WINDOW
  wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
  wt AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
  wr AS (PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

ORACLES["q38"] = """
WITH hi AS (
  SELECT o_custkey, COUNT(*) AS n_hi FROM orders
  WHERE o_totalprice > 250000 GROUP BY o_custkey
), lo AS (
  SELECT o_custkey, COUNT(*) AS n_lo FROM orders
  WHERE o_totalprice < 50000 GROUP BY o_custkey
)
SELECT
  COALESCE(hi.o_custkey, lo.o_custkey) AS o_custkey,
  COALESCE(n_hi, 0) AS n_hi,
  COALESCE(n_lo, 0) AS n_lo
FROM hi FULL OUTER JOIN lo ON hi.o_custkey = lo.o_custkey
"""

ORACLES["q38_right"] = """
SELECT
  o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(c_custkey) AS n_building,
  CAST(count_if(c_custkey IS NULL) AS BIGINT) AS n_other
FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY o_orderstatus
"""

ORACLES["q38_cross"] = f"""
SELECT r_name, o_orderstatus, revenue
FROM (SELECT r_name FROM region) r
CROSS JOIN (
  SELECT o_orderstatus, {_MS.format(c='o_totalprice')} AS revenue
  FROM orders GROUP BY o_orderstatus
) s
"""

# Breadth Q39–Q41 (E21 hashing, E10 JSON, E5 multiset ops) ------------

ORACLES["q39"] = """
SELECT
  p_partkey,
  md5(lower(trim(p_name))) AS h_md5,
  sha256(lower(trim(p_name))) AS h_sha256,
  CAST(length(lower(trim(p_name))) AS BIGINT) AS n
FROM part
"""

ORACLES["q40"] = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_tuple,
  '{"k":' || json_extract_string(props, '$.k') || '}' AS round_trip
FROM events
"""

ORACLES["q41"] = """
SELECT 'intersect_all' AS tag, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
)
UNION ALL
SELECT 'except_all' AS tag, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
)
"""

# Q42 — as-of join (DuckDB has native ASOF; exact twin of the
# union-sentinel operator in ops/asof.py) ----------------------------

ORACLES["q42"] = """
SELECT
  l.event_id,
  l.user_id,
  CAST(floor(epoch(l.ts)) AS BIGINT) AS purchase_ep,
  r.event_id AS click_id,
  CAST(floor(epoch(r.ts)) AS BIGINT) AS click_ep
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""

# Q43 — unpivot keeps zero-count cells, so the oracle builds the same
# dense day×event_type grid the melted pivot matrix has ------------

ORACLES["q43"] = """
WITH days AS (
  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
  FROM events
), types(event_type) AS (
  VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')
), counts AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT d.day, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM days d
CROSS JOIN types t
LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
"""

ORACLES["q44"] = """
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
    AS gid,
  COUNT(*) AS n,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
    AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

# Q45 — list_sum folds to HUGEINT and of [] to NULL in DuckDB; both
# normalized (CAST AS BIGINT, COALESCE 0) to match Spark's fold ----

ORACLES["q45"] = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
)
SELECT
  doc_id,
  CAST(len(toks) AS BIGINT) AS n_toks,
  array_to_string(list_sort(list_distinct(toks))[1:3], '-') AS first3,
  list_contains(toks, 'the') AS has_the,
  (len(list_intersect(toks, ['the', 'a', 'of'])) > 0) AS has_stop,
  CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
       AS BIGINT) AS total_chars
FROM t
"""

# Q46 — the map stays inside the Spark row; the oracle recomputes
# each lookup from the source columns, so map build+lookup round-trip
# is what is actually verified -------------------------------------

ORACLES["q46"] = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
  event_type AS type_val,
  CAST(2 AS BIGINT) AS n_keys,
  TRUE AS has_type,
  'k,type' AS keys_sorted
FROM events
"""

# Q47 — floor-division binning: x/30000.0 and FLOOR are the same
# IEEE ops in both engines (unlike (x-lo)/(hi-lo)*n whose extra
# rounding step can disagree) -------------------------------------

ORACLES["q47"] = """
SELECT
  CAST(FLOOR(o_totalprice / 30000.0) AS INT) AS bucket,
  COUNT(*) AS n,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
    AS sum_price
FROM orders
GROUP BY 1
"""

# Q48 — generate_series yields TIMESTAMP for date+interval input;
# CAST back to DATE matches Spark's sequence(date, date, month) ----

ORACLES["q48"] = """
WITH months AS (
  SELECT CAST(gs AS DATE) AS month
  FROM generate_series(DATE '1995-01-01', DATE '1995-12-01',
                       INTERVAL 1 MONTH) t(gs)
),
counts AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01'
    AND o_orderdate <  DATE '1996-01-01'
  GROUP BY 1
)
SELECT m.month, CAST(COALESCE(c.n_orders, 0) AS BIGINT) AS n_orders
FROM months m LEFT JOIN counts c USING (month)
"""

# Q49 — list_sort(list_distinct(list(...))) is the deterministic
# spelling of STRING_AGG(DISTINCT ... ORDER BY ...) ----------------

ORACLES["q49"] = """
SELECT
  o_orderstatus,
  array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|')
    AS priorities,
  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
FROM orders
GROUP BY 1
"""

# Q50 — bit aggs are order-independent (commutative), so exact under
# any distribution; DuckDB keeps BIGINT in = BIGINT out -------------

ORACLES["q50"] = """
SELECT
  user_id,
  CAST(bit_and(event_id) AS BIGINT) AS b_and,
  CAST(bit_or(event_id) AS BIGINT) AS b_or,
  CAST(bit_xor(event_id) AS BIGINT) AS b_xor,
  bool_and(value > 0) AS all_pos,
  bool_or(event_type = 'purchase') AS any_purchase
FROM events
GROUP BY 1
"""

# Q51 — TPC-H Q5 proper: the c_nationkey = s_nationkey cycle edge ---

ORACLES["q51"] = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2)
      AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY n_name
"""

# Q52 — interval join: per-click views in (c, c+600] ----------------

ORACLES["q52"] = """
WITH c AS (
  SELECT
    event_id AS click_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS c_ep,
    user_id,
    strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS v_ep, user_id, value
  FROM events WHERE event_type = 'view'
), j AS (
  SELECT
    c.click_id,
    COUNT(*) AS n_views,
    CAST(ROUND(SUM(CAST(v.value AS DECIMAL(12,2))), 2) AS DOUBLE)
      AS sum_view_value
  FROM c JOIN v
    ON c.user_id = v.user_id
   AND v.v_ep >= c.c_ep + 1
   AND v.v_ep <  c.c_ep + 601
  GROUP BY c.click_id
)
SELECT
  c.click_id,
  c.user_id,
  c.click_ts,
  CAST(COALESCE(j.n_views, 0) AS BIGINT) AS n_views,
  COALESCE(j.sum_view_value, 0.0) AS sum_view_value
FROM c LEFT JOIN j USING (click_id)
"""

# Q53 — TPC-H Q17 shape: decorrelated 0.2*avg(qty) predicate --------

ORACLES["q53"] = """
WITH li AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
         l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#4'
), s AS (
  SELECT *,
    SUM(qty)  OVER (PARTITION BY l_partkey) AS q_sum,
    COUNT(*)  OVER (PARTITION BY l_partkey) AS n
  FROM li
)
SELECT
  COUNT(*) AS n_items,
  COUNT(DISTINCT l_partkey) AS n_parts,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
    AS small_order_revenue
FROM s
WHERE 5 * qty * n < q_sum
"""

# Q54 — token-count stats (whitespace + BPE-ish regex) --------------

ORACLES["q54"] = r"""
SELECT
  doc_id,
  CAST(length(text) AS INTEGER) AS n_chars,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text,
    E'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]'))
       AS BIGINT) AS n_bpe_tokens
FROM documents
"""

# Q55 — integer-exact quality counters ------------------------------

ORACLES["q55"] = r"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks
  FROM documents
)
SELECT
  doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
       AS BIGINT) AS sum_token_len,
  CAST(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
       AS BIGINT) AS n_punct,
  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
    AS n_digit,
  CAST(len(list_filter(toks, t -> list_contains(
    ['the','a','of','and','to','in','is','it','that','for'],
    lower(t)))) AS BIGINT) AS n_stop_en
FROM t
"""

# ------------------------------------------------------------------
# Round-5 breadth (q56–q63) — calaspark/queries/breadth.py
# ------------------------------------------------------------------

# Q56 — CDC MERGE / SCD-1 upsert via FULL OUTER join ----------------

ORACLES["q56"] = """
WITH t AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
), upd AS (
  SELECT o_orderkey, 'U' AS s_status,
         price + CAST(10.00 AS DECIMAL(12,2)) AS s_price
  FROM t WHERE o_orderkey % 10 = 0
), ins AS (
  SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM t) AS o_orderkey,
         'N' AS s_status,
         price AS s_price
  FROM t WHERE o_orderkey % 1000 = 7
), src AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
)
SELECT
  COALESCE(t.o_orderkey, src.o_orderkey) AS o_orderkey,
  COALESCE(src.s_status, t.o_orderstatus) AS status,
  CAST(ROUND(COALESCE(src.s_price, t.price), 2) AS DOUBLE) AS price,
  CASE WHEN t.o_orderkey IS NULL THEN 'insert'
       WHEN src.s_status IS NOT NULL THEN 'update'
       ELSE 'keep' END AS action
FROM t FULL OUTER JOIN src ON t.o_orderkey = src.o_orderkey
"""

# Q57 — per-user hourly spine + LOCF gap fill -----------------------

ORACLES["q57"] = """
WITH hourly AS (
  SELECT user_id,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h_ep,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(14,2))) AS sum_value
  FROM events
  WHERE user_id < 8
  GROUP BY 1, 2
), spine AS (
  SELECT user_id, unnest(generate_series(MIN(h_ep), MAX(h_ep), 3600)) AS h_ep
  FROM hourly
  GROUP BY user_id
), j AS (
  SELECT s.user_id, s.h_ep, h.n_events, h.sum_value
  FROM spine s LEFT JOIN hourly h USING (user_id, h_ep)
)
SELECT
  user_id,
  h_ep,
  CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
  CAST(ROUND(LAST_VALUE(sum_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h_ep
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS DOUBLE) AS locf_sum_value
FROM j
"""

# Q58 — overlapping token-window chunking (size 50, stride 40) ------

ORACLES["q58"] = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start_tok
  FROM t WHERE len(toks) > 0
)
SELECT
  doc_id,
  CAST(start_tok // 40 AS INTEGER) AS chunk_idx,
  CAST(start_tok AS BIGINT) AS start_tok,
  CAST(len(list_slice(toks, start_tok + 1, start_tok + 50)) AS BIGINT)
    AS n_tokens,
  md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 50), ' '))
    AS chunk_md5
FROM s
"""

# Q59 — repetition-based quality counters (Gopher/C4 shape) ---------

ORACLES["q59"] = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
  FROM documents
  WHERE len(regexp_extract_all(text, '\S+')) > 1
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS gram
  FROM t
), gc AS (
  SELECT doc_id, gram, COUNT(*) AS cnt
  FROM g GROUP BY doc_id, gram
), gs AS (
  SELECT doc_id,
         SUM(cnt) AS n_2grams,
         COUNT(*) AS n_distinct_2grams,
         MAX(cnt) AS top_2gram_cnt
  FROM gc GROUP BY doc_id
)
SELECT
  t.doc_id,
  CAST(len(t.toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(t.toks)) AS BIGINT) AS n_distinct_tokens,
  CAST(gs.n_2grams AS BIGINT) AS n_2grams,
  CAST(gs.n_distinct_2grams AS BIGINT) AS n_distinct_2grams,
  CAST(gs.top_2gram_cnt AS BIGINT) AS top_2gram_cnt
FROM t JOIN gs ON t.doc_id = gs.doc_id
"""

# Q60 — PII detect + redact (emails / phones / 16-digit cards) ------

ORACLES["q60"] = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' card 4111111111111'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS dirty
  FROM documents
), r AS (
  SELECT doc_id, dirty,
         regexp_replace(
           regexp_replace(
             regexp_replace(dirty,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
           '\b[0-9]{16}\b', '<CARD>', 'g') AS red
  FROM d
)
SELECT
  doc_id,
  CAST(len(regexp_extract_all(dirty,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(dirty, '\+1-555-[0-9]{4}')) AS BIGINT)
    AS n_phones,
  CAST(len(regexp_extract_all(dirty, '\b[0-9]{16}\b')) AS BIGINT)
    AS n_cards,
  CAST(length(red) AS BIGINT) AS redacted_len,
  md5(red) AS redacted_md5
FROM r
"""

# Q61 — try_cast / try_to_timestamp / try_divide --------------------

ORACLES["q61"] = """
WITH t AS (
  SELECT
    CAST(p_partkey % 4 AS INTEGER) AS grp,
    TRY_CAST(CASE
      WHEN p_partkey % 5 = 0 THEN ''
      WHEN p_partkey % 5 = 1 THEN 'n/a'
      WHEN p_partkey % 5 = 2 THEN '-' || CAST(p_size AS VARCHAR)
      ELSE CAST(p_size AS VARCHAR) END AS INTEGER) AS v_int,
    TRY_CAST(CASE
      WHEN p_partkey % 3 = 0 THEN 'oops'
      ELSE CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR)
      END AS DECIMAL(12,2)) AS v_dec,
    TRY_STRPTIME(CASE
      WHEN p_partkey % 7 = 0 THEN '13/45/2020'
      ELSE '2/3/1996' END, '%-m/%-d/%Y') AS v_ts
  FROM part
)
SELECT
  grp,
  COUNT(*) AS n,
  COUNT(v_int) AS n_int_ok,
  CAST(SUM(v_int) AS BIGINT) AS sum_int,
  COUNT(v_dec) AS n_dec_ok,
  CAST(ROUND(SUM(v_dec), 2) AS DOUBLE) AS sum_dec,
  COUNT(v_ts) AS n_ts_ok,
  CAST(SUM(v_int) AS DOUBLE)
    / NULLIF(CAST(COUNT(*) FILTER (WHERE v_int IS NULL AND grp % 2 = 0)
                  AS DOUBLE), 0) AS try_div
FROM t
GROUP BY grp
ORDER BY grp
"""

# Q62 — moments from exact power sums (stddev / covar / corr) -------

ORACLES["q62"] = """
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    SUM(CAST(l_quantity AS BIGINT)) AS sx,
    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy_d,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy_d,
    SUM(CAST(l_quantity AS BIGINT)
        * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy_d
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  CAST(n AS BIGINT) AS n,
  ROUND(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
    AS stddev_qty,
  ROUND(sqrt((CAST(n AS DOUBLE) * CAST(syy_d AS DOUBLE)
              - CAST(sy_d AS DOUBLE) * CAST(sy_d AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
    AS stddev_price,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE))
        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 4)
    AS covar_qty_price,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy_d AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy_d AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy_d AS DOUBLE)
                  - CAST(sy_d AS DOUBLE) * CAST(sy_d AS DOUBLE))), 6)
    AS corr_qty_price
FROM s
"""

# Q63 — posexplode_outer over arrays of structs ---------------------

ORACLES["q63"] = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN []
              ELSE list_transform(
                     list_slice(regexp_extract_all(text, '\S+'), 1, 5),
                     x -> {'tok': x, 'tlen': CAST(length(x) AS INTEGER)})
         END AS arr
  FROM documents
  WHERE doc_id < 60
), e AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(arr) + 1),
                i -> {'pos': CAST(i - 1 AS INTEGER),
                      'tok': arr[i].tok,
                      'tlen': arr[i].tlen})) AS u
  FROM t WHERE len(arr) > 0
)
SELECT doc_id, u.pos AS pos, u.tok AS tok, u.tlen AS tlen FROM e
UNION ALL
SELECT doc_id, CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
       CAST(NULL AS INTEGER)
FROM t WHERE len(arr) = 0
"""

# Q64 — pairs sharing exact 8-token windows (substring dedup) -------

ORACLES["q64"] = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
  FROM documents
), w AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(toks) - 8 + 2),
           i -> md5(array_to_string(toks[i : i + 7], ' '))))) AS wh
  FROM t WHERE len(toks) >= 8
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS n_shared_windows
FROM w a JOIN w b ON a.wh = b.wh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

# Q68 — substring-dup pairs with document-frequency cap (max_df=2) --

ORACLES["q68"] = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
  FROM documents
), w AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(toks) - 8 + 2),
           i -> md5(array_to_string(toks[i : i + 7], ' '))))) AS wh
  FROM t WHERE len(toks) >= 8
), k AS (
  SELECT wh FROM w GROUP BY wh HAVING COUNT(*) <= 2
), wf AS (
  SELECT w.doc_id, w.wh FROM w JOIN k USING (wh)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS n_shared_windows
FROM wf a JOIN wf b ON a.wh = b.wh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

# Q65 — end-to-end pipeline funnel counts ---------------------------

ORACLES["q65"] = r"""
WITH d AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(regexp_extract_all(text, '\S+'),
           t -> list_contains(
             ['the','a','of','and','to','in','is','it','that','for'],
             lower(t)))) AS BIGINT) AS n_stop_en,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
           AS n_digit,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
           AS content_key
  FROM documents
), q AS (
  SELECT * FROM d
  WHERE n_tokens >= 10 AND n_chars >= 50 AND n_stop_en >= 1
    AND n_digit * 5 < n_chars
), uniq AS (
  SELECT content_key, MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens
  FROM q GROUP BY content_key
)
SELECT
  (SELECT COUNT(*) FROM d) AS n_docs_in,
  (SELECT COUNT(*) FROM q) AS n_docs_quality,
  (SELECT COUNT(*) FROM uniq) AS n_docs_unique,
  (SELECT CAST(SUM((n_tokens - 1) // 40 + 1) AS BIGINT) FROM uniq)
    AS n_chunks_total,
  (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM uniq) AS n_tokens_total
"""

# Q66 — media-contract metadata (binary payload twin) ----------------

ORACLES["q66"] = """
SELECT
  doc_id AS media_id,
  'text/plain' AS format,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS payload_md5
FROM documents
"""

# Q67 — deterministic hash-based dataset split ----------------------

ORACLES["q67"] = r"""
WITH d AS (
  SELECT
    CASE
      WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 < 90
        THEN 'train'
      WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 < 95
        THEN 'val'
      ELSE 'test'
    END AS split,
    CAST(len(regexp_extract_all(text, E'[^\t\n\f\r ]+')) AS BIGINT)
      AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM d
GROUP BY split
ORDER BY split
"""

# Q69 — sharded sequence packing (budget 2048, running cumsum) ------

ORACLES["q69"] = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
  FROM documents
), c AS (
  SELECT doc_id, len(toks) AS n_toks,
         unnest(range(0, len(toks), 40)) AS start_tok
  FROM t WHERE len(toks) > 0
), p AS (
  SELECT CAST(doc_id % 8 AS INTEGER) AS shard,
         doc_id, start_tok,
         CAST(LEAST(50, n_toks - start_tok) AS BIGINT) AS chunk_toks
  FROM c
), q AS (
  SELECT shard, chunk_toks,
         CAST(FLOOR((SUM(chunk_toks) OVER (
                PARTITION BY shard ORDER BY doc_id, start_tok
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - chunk_toks) / 2048.0) AS BIGINT) AS pack_id
  FROM p
)
SELECT shard, pack_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(chunk_toks) AS BIGINT) AS n_tokens
FROM q
GROUP BY shard, pack_id
ORDER BY shard, pack_id
"""

# Q70 — deterministic corpus mixture sampling -----------------------

ORACLES["q70"] = r"""
WITH d AS (
  SELECT
    CASE WHEN doc_id % 3 = 0 THEN 'web'
         WHEN doc_id % 3 = 1 THEN 'books'
         ELSE 'code' END AS corpus,
    CAST(len(regexp_extract_all(text, E'[^\t\n\f\r ]+')) AS BIGINT)
      AS n_tokens,
    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)
         AS BIGINT) % 10000 AS bucket
  FROM documents
), r AS (
  SELECT corpus, n_tokens, bucket,
         CASE corpus WHEN 'web' THEN 5000
                     WHEN 'books' THEN 8000
                     ELSE 2500 END AS rate
  FROM d
)
SELECT corpus,
       COUNT(*) AS n_docs_in,
       CAST(COUNT(*) FILTER (WHERE bucket < rate) AS BIGINT)
         AS n_docs_kept,
       CAST(SUM(CASE WHEN bucket < rate THEN n_tokens ELSE 0 END)
            AS BIGINT) AS n_tokens_kept
FROM r
GROUP BY corpus
ORDER BY corpus
"""

# Q71 — exact batched k-NN: top-3 cosine per 8-query batch ----------

ORACLES["q71"] = """
WITH d AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, e AS qe FROM d WHERE vec_id < 8
), c AS (
  SELECT vec_id, e FROM d WHERE vec_id >= 8
), s AS (
  SELECT q.query_id, c.vec_id,
         ROUND(list_dot_product(c.e, q.qe)
               / (sqrt(list_dot_product(c.e, c.e))
                  * sqrt(list_dot_product(q.qe, q.qe))), 4) AS sim
  FROM c CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM s
)
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, vec_id, sim
FROM r WHERE rnk <= 3
"""

# Q72 — blocked fuzzy name pairs (levenshtein <= 3) -----------------

ORACLES["q72"] = """
WITH u AS (
  SELECT p_name, MIN(p_partkey) AS rep_id, COUNT(*) AS n_dup
  FROM part GROUP BY p_name
), p AS (
  SELECT rep_id, p_name, n_dup,
         string_split(p_name, ' ')[1] AS blk,
         length(p_name) AS len
  FROM u
)
SELECT a.rep_id AS id_a,
       b.rep_id AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
       a.n_dup AS n_dup_a,
       b.n_dup AS n_dup_b
FROM p a JOIN p b
  ON a.blk = b.blk
 AND a.rep_id < b.rep_id
 AND abs(a.len - b.len) <= 3
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
"""

# Q73 — exact embedding-cosine near-dup pairs (grid-blocked) --------
# The oracle is the brute-force all-pairs definition; Spark's grid
# blocking must be output-invisible (guaranteed recall) for the hash
# to match. Perturbed twins are built in identical double arithmetic
# (cast-to-double first, CAST(0.02 AS DOUBLE) bleed); candidate sims
# are sequential index-order folds in both engines (q34 precedent).

ORACLES["q73"] = """
WITH d AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), pert AS (
  SELECT vec_id + 100000 AS vec_id,
         list_transform(
           list_zip(e, list_concat(e[2:64], e[1:1])),
           s -> s[1] + CAST(0.02 AS DOUBLE) * s[2]
         ) AS e
  FROM d
), u AS (
  SELECT * FROM d UNION ALL SELECT * FROM pert
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e))), 4) AS sim
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e))
         * sqrt(list_dot_product(b.e, b.e))) >= 0.95
ORDER BY id_a, id_b
"""

# Q74 — salted skew-safe join + two-stage agg -----------------------
# The whole point: the oracle carries NO salt — plain JOIN + GROUP BY.
# Salting and two-stage partials must be output-invisible (exact
# decimal partials are associative), which the hash gate verifies.

ORACLES["q74"] = f"""
SELECT c.c_mktsegment,
       {_MS.format(c='o.o_totalprice')} AS revenue,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'O'
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

# Q75 — skewness / excess kurtosis from exact power sums ------------
# Same discipline as q62 taken to 3rd/4th moments: exact integer
# sums (DuckDB SUM(BIGINT) is HUGEINT — cast to DOUBLE once, like
# Spark's BIGINT sums), then ONE shared left-associative IEEE
# expression per statistic in both engines.

ORACLES["q75"] = """
WITH s AS (
  SELECT l_linestatus,
         COUNT(*) AS n,
         SUM(x) AS s1, SUM(x*x) AS s2,
         SUM(x*x*x) AS s3, SUM(x*x*x*x) AS s4
  FROM (SELECT l_linestatus, CAST(l_quantity AS BIGINT) AS x FROM lineitem)
  GROUP BY l_linestatus
), d AS (
  SELECT l_linestatus, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
         CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4
  FROM s
), m AS (
  SELECT l_linestatus, n, nd,
         s1/nd AS mu,
         s2/nd - (s1/nd)*(s1/nd) AS m2,
         s3/nd - 3.0*(s1/nd)*(s2/nd) + 2.0*(s1/nd)*(s1/nd)*(s1/nd) AS m3,
         s4/nd - 4.0*(s1/nd)*(s3/nd) + 6.0*(s1/nd)*(s1/nd)*(s2/nd)
               - 3.0*(s1/nd)*(s1/nd)*(s1/nd)*(s1/nd) AS m4
  FROM d
)
SELECT l_linestatus,
       CAST(n AS BIGINT) AS n,
       ROUND(sqrt(nd*(nd-1.0))/(nd-2.0) * (m3 / pow(m2, 1.5)), 6) AS skew_qty,
       ROUND(m4/(m2*m2) - 3.0, 6) AS kurt_qty
FROM m
ORDER BY l_linestatus
"""

# Q76 — train/eval decontamination report ---------------------------
# Same window-fingerprint contract as q64 (md5 of 8-token windows,
# per-doc distinct); synthesized verbatim leak (+200001 shifts the
# id mod 50) guarantees the detector real signal.

ORACLES["q76"] = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200001 AS doc_id, text
  FROM documents WHERE doc_id % 50 = 0
), t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
  FROM corpus
), w AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(toks) - 8 + 2),
           i -> md5(array_to_string(toks[i : i + 7], ' ')))) AS ws
  FROM t WHERE len(toks) >= 8
), ev AS (
  SELECT DISTINCT unnest(ws) AS wh FROM w WHERE doc_id % 50 = 0
), tr AS (
  SELECT doc_id, unnest(ws) AS wh FROM w WHERE doc_id % 50 <> 0
), h AS (
  SELECT tr.doc_id, COUNT(*) AS n_hits
  FROM tr JOIN ev USING (wh)
  GROUP BY tr.doc_id
)
SELECT b.doc_id,
       CAST(len(b.ws) AS INTEGER) AS n_windows,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) > 0 AS INTEGER) AS contaminated
FROM w b LEFT JOIN h USING (doc_id)
WHERE b.doc_id % 50 <> 0
ORDER BY b.doc_id
"""

# Q77 — BPE step-one adjacent character-pair counts ------------------

ORACLES["q77"] = r"""
WITH t AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents
), p AS (
  SELECT unnest(list_transform(range(1, length(tok)), i -> tok[i : i + 1])) AS pair
  FROM t WHERE length(tok) >= 2
)
SELECT pair, COUNT(*) AS n
FROM p
GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 30
"""

# Q78 — hierarchy rollup: recursive CTE twin of pointer jumping -----
# parent(i) = i DIV 3 (ternary tree rooted at 0). The oracle is the
# declarative recursion; Spark's log-depth pointer-jumping loop must
# produce identical depths for the hash to match.

ORACLES["q78"] = """
WITH RECURSIVE r AS (
  SELECT doc_id AS id, 0 AS depth FROM documents WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, r.depth + 1
  FROM documents d JOIN r ON (d.doc_id // 3) = r.id
  WHERE d.doc_id > 0
)
SELECT r.depth,
       COUNT(*) AS n_nodes,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM r JOIN documents d ON d.doc_id = r.id
GROUP BY r.depth
ORDER BY r.depth
"""

# ------------------------------------------------------------------
# Round-6 advanced queries (calaspark/queries/advanced.py)
# ------------------------------------------------------------------

# Q79 — SCD Type-2 history build --------------------------------------
# Gaps-and-islands versioning under the (floored-epoch, event_id)
# total order; valid_to = next version's valid_from (NULL = current).

ORACLES["q79"] = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
), c AS (
  SELECT *,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
), v AS (
  SELECT *,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ep, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM c
), g AS (
  SELECT user_id, CAST(version AS BIGINT) AS version,
         MIN(event_type) AS state,
         MIN(ep) AS valid_from_ep,
         COUNT(*) AS n_events
  FROM v GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from_ep,
       lead(valid_from_ep) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to_ep,
       n_events,
       CAST(lead(valid_from_ep) OVER (PARTITION BY user_id ORDER BY version)
              IS NULL AS INTEGER) AS is_current
FROM g
ORDER BY user_id, version
"""

# Q80 — 3-iteration exact-integer PageRank ---------------------------
# Unrolled twin of the Spark join-aggregate loop. All arithmetic is
# bigint: contributions r // outdeg, damping 150000 + (85*s) // 100.
# '//' (DuckDB) and 'div' (Spark) agree on positive operands.

_PR_STEP = """
{out} AS (
  SELECT nodes.id,
         CAST(150000 + (85 * COALESCE(t.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst, SUM(p.r // e.outdeg) AS s
    FROM {prev} p JOIN ed e ON p.id = e.src
    GROUP BY e.dst
  ) t ON nodes.id = t.dst
)"""

ORACLES["q80"] = (
    """
WITH nodes AS (SELECT doc_id AS id FROM documents),
nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, doc_id // 3 AS dst
    FROM documents WHERE doc_id > 0
    UNION ALL
    SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
    FROM documents
  )
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),"""
    + _PR_STEP.format(out="r1", prev="r0")
    + ","
    + _PR_STEP.format(out="r2", prev="r1")
    + ","
    + _PR_STEP.format(out="r3", prev="r2")
    + """
SELECT id, r AS rank_e6
FROM r3
ORDER BY rank_e6 DESC, id ASC
LIMIT 20
"""
)

# Q81 — Markov transition matrix -------------------------------------

ORACLES["q81"] = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
), p AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ep, event_id)
           AS prev_type,
         event_type AS next_type
  FROM e
), g AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM p WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
FROM g
ORDER BY prev_type, next_type
"""

# Q82 — trailing 7-day RANGE-frame rolling aggregates ----------------
# Value-based frame over floored epoch seconds; peers included by
# definition in both engines; money in exact decimal (rule 1).

ORACLES["q82"] = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
)
SELECT event_id, user_id, ep,
       COUNT(*) OVER w AS n_7d,
       CAST(ROUND(SUM(v) OVER w, 2) AS DOUBLE) AS sum_7d
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ep
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

# Q83 — gaps-and-islands over o_orderkey -----------------------------
# The oracle is the CLASSIC single-window idiom (k - row_number);
# the Spark side must reproduce it from the bucketed distributed
# plan (ops/islands.py) for the hash to match.

ORACLES["q83"] = """
WITH k AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
),
g AS (
  SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp FROM k
)
SELECT MIN(k) AS start_key,
       MAX(k) AS end_key,
       COUNT(*) AS n_keys
FROM g
GROUP BY grp
ORDER BY n_keys DESC, start_key ASC
LIMIT 20
"""

# Q84 — consistent stratified sampling (top-5-by-md5 per source) -----

ORACLES["q84"] = """
WITH d AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), r AS (
  SELECT source, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rank
  FROM d
)
SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, h
FROM r
WHERE rank <= 5
ORDER BY source, rank
"""

# Q85 — 2-D skyline via window sweep ---------------------------------

ORACLES["q85"] = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         MAX(o_totalprice) AS best_price
  FROM orders GROUP BY 1
), s AS (
  SELECT d, best_price,
         MAX(best_price) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
  FROM o
)
SELECT d, best_price
FROM s
WHERE m IS NULL OR best_price > m
ORDER BY d
"""

# Q86 — max concurrent intervals per user (sweep line) ---------------
# Explicit FLOOR on the decimal duration: decimal->int CASTS
# disagree across engines (Spark truncates, DuckDB rounds).

ORACLES["q86"] = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + CAST(FLOOR(CAST(value AS DECIMAL(12,2)) * 60) AS BIGINT) AS t_end
  FROM events
), deltas AS (
  SELECT user_id, s AS t, 1 AS d FROM e
  UNION ALL
  SELECT user_id, t_end AS t, -1 AS d FROM e
), net AS (
  SELECT user_id, t, SUM(d) AS net FROM deltas GROUP BY user_id, t
), conc AS (
  SELECT user_id, t,
         SUM(net) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS conc
  FROM net
)
SELECT user_id,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent,
       COUNT(*) AS n_points
FROM conc
GROUP BY user_id
ORDER BY user_id
"""

# Q87 — per-group z-score outliers from exact power sums -------------
# Same exact-sum discipline as q62/q75: decimal s1, s2; ONE shared
# IEEE expression for mu/sigma/z in both engines; ROUND(z, 4).

ORACLES["q87"] = """
WITH e AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS v
  FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(v) AS DOUBLE) AS s1,
         CAST(SUM(v * v) AS DOUBLE) AS s2
  FROM e GROUP BY event_type
), st AS (
  SELECT event_type,
         s1 / n AS mu,
         sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sigma
  FROM s
)
SELECT e.event_id, e.event_type,
       CAST(e.v AS DOUBLE) AS value,
       ROUND((CAST(e.v AS DOUBLE) - st.mu) / st.sigma, 4) AS z
FROM e JOIN st ON e.event_type = st.event_type
WHERE ABS(ROUND((CAST(e.v AS DOUBLE) - st.mu) / st.sigma, 4)) > 2.5
ORDER BY e.event_id
"""

# Q88 — TF-IDF-style cosine pairs via inverted index ----------------
# Exact bigint dot/norms (associative), one shared double division,
# df cap = 100 before the self-join in BOTH engines.

ORACLES["q88"] = r"""
WITH d AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM d GROUP BY doc_id, term
), cap AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term
  ) WHERE df <= 100
), tfc AS (
  SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN cap USING (term)
), norms AS (
  SELECT doc_id, SUM(tf * tf) AS n2 FROM tfc GROUP BY doc_id
), num AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS dot
  FROM tfc a JOIN tfc b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT num.id_a, num.id_b,
       ROUND(CAST(dot AS DOUBLE)
             / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6)
         AS cosine
FROM num
JOIN norms na ON num.id_a = na.doc_id
JOIN norms nb ON num.id_b = nb.doc_id
ORDER BY cosine DESC, id_a ASC, id_b ASC
LIMIT 20
"""

# Q89 — pairwise correlation matrix from exact bivariate power sums -
# daily sums pinned to DECIMAL(18,2) in both engines so the x*y
# product (37,4) stays inside decimal-38 exactness. One operand is
# promoted to DECIMAL(19,2) like q158 (round-13 hardening): DuckDB's
# width-18 × width-18 multiply runs on the int64 fast path with a
# 10^18 unscaled bound — fine at sf0.1 for these per-type sums, but
# a 10× SF pushes products past it; width 19 forces HUGEINT
# arithmetic, values identical.

ORACLES["q89"] = """
WITH e AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
), daily AS (
  SELECT day, event_type, CAST(SUM(v) AS DECIMAL(18,2)) AS s
  FROM e GROUP BY day, event_type
), j AS (
  SELECT a.day, a.event_type AS type_a, b.event_type AS type_b,
         a.s AS x, b.s AS y
  FROM daily a JOIN daily b USING (day)
  WHERE a.event_type < b.event_type
), s AS (
  SELECT type_a, type_b, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS DECIMAL(19,2)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(19,2)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(19,2)) * y) AS syy
  FROM j GROUP BY type_a, type_b
), d AS (
  SELECT type_a, type_b, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         CAST(sxy AS DOUBLE) AS sxy,
         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy
  FROM s
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
       ROUND((nd * sxy - sx * sy)
             / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6) AS corr
FROM d
ORDER BY type_a, type_b
"""

# Q90 — column-profiling report -------------------------------------
# The oracle recomputes each column independently; the Spark side
# fuses everything into one scan + stack. Values must agree exactly.

ORACLES["q90"] = """
SELECT * FROM (
  SELECT 'l_linestatus' AS column_name, COUNT(*) AS n_rows,
         COUNT(*) - COUNT(l_linestatus) AS n_null,
         COUNT(DISTINCT l_linestatus) AS n_distinct FROM lineitem
  UNION ALL
  SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
         COUNT(DISTINCT l_quantity) FROM lineitem
  UNION ALL
  SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
         COUNT(DISTINCT l_returnflag) FROM lineitem
  UNION ALL
  SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
         COUNT(DISTINCT l_shipdate) FROM lineitem
)
ORDER BY column_name
"""

# Q91 — prefix-filtered exact SHINGLE Jaccard --------------------
# 3-token shingles (q64/q76's window construction at width 3), same
# integer admission test as q33. The oracle is the naive all-pairs
# form — the driver hash proves the prefix-filter plan computes the
# exact same pair set.
ORACLES["q91"] = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS rawt
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(rawt) - 1),
           i -> array_to_string(rawt[i : i + 2], ' '))) AS toks
  FROM t WHERE len(rawt) >= 3
), sz AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt FROM s
), sh AS (
  SELECT doc_id, unnest(toks) AS g FROM s
), inter AS (
  -- inverted-index intersection counts: a pair appears iff it
  -- shares >= 1 shingle, and pairs with n_inter = 0 can never pass
  -- the 3*inter >= union + inter admission below, so this is
  -- value-identical to the all-pairs list_intersect formulation
  -- (which took 9 s at sf0.01 — 125k per-pair list intersections)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), p AS (
  SELECT i.doc_a, i.doc_b, i.n_inter,
         sa.nt + sb.nt - i.n_inter AS n_union
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, n_inter, n_union,
       ROUND(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 4) AS sim
FROM p
WHERE 3 * n_inter >= n_union + n_inter
"""

# Q92 — text-quality features (oracled twin of the rows-only demo) --
# Shared Java∩RE2 regex classes; each ratio is ONE int/int double
# division + ROUND(.,4).

ORACLES["q92"] = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]')) AS BIGINT)
         AS n_bpe_ish,
       ROUND(CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE)
             / CAST(greatest(len(toks), 1) AS DOUBLE), 4)
         AS mean_token_len,
       ROUND(CAST(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
                  AS DOUBLE)
             / CAST(greatest(length(text), 1) AS DOUBLE), 4) AS punct_ratio,
       ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / CAST(greatest(length(text), 1) AS DOUBLE), 4) AS digit_ratio,
       ROUND(CAST(len(list_filter(toks, x -> list_contains(
                ['the','a','of','and','to','in','is','it','that','for'],
                lower(x)))) AS DOUBLE)
             / CAST(greatest(len(toks), 1) AS DOUBLE), 4)
         AS stopword_ratio_en
FROM t
ORDER BY doc_id
"""

# Q93 — language-ID confusion grid (oracled twin) -------------------
# Scores are int/int divisions — bit-identical across engines, so
# the argmax + lexicographic tie-break CASE is deterministic.

ORACLES["q93"] = r"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(toks, x -> list_contains(
             ['the','a','of','and','to','in','is','it','that','for'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_en,
         CAST(len(list_filter(toks, x -> list_contains(
             ['el','la','de','y','que','en','un','es','se','no'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_es,
         CAST(len(list_filter(toks, x -> list_contains(
             ['le','la','de','et','que','en','un','est','se','ne'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_fr,
         CAST(len(list_filter(toks, x -> list_contains(
             ['der','die','das','und','zu','in','ist','es','den','nicht'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_de
  FROM t
), p AS (
  SELECT lang,
         CASE
           WHEN greatest(score_en, score_es, score_fr, score_de) <= 0
             THEN 'unknown'
           WHEN score_de = greatest(score_en, score_es, score_fr, score_de)
             THEN 'de'
           WHEN score_en = greatest(score_en, score_es, score_fr, score_de)
             THEN 'en'
           WHEN score_es = greatest(score_en, score_es, score_fr, score_de)
             THEN 'es'
           ELSE 'fr'
         END AS pred_lang
  FROM s
)
SELECT lang, pred_lang, COUNT(*) AS n
FROM p
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""

# Q94 — oracled SimHash near-dup pairs ------------------------------
# 60-bit md5-derived token hashes; every step integer (bit sums,
# sign-bit fingerprint, 15-bit bands, bit_count(xor) Hamming).

ORACLES["q94"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, text || ' zzzq xq' AS text
  FROM documents
), tr AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS rawt
  FROM corpus
), e AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS h
  FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, len(rawt) - 1),
             i -> array_to_string(rawt[i : i + 2], ' ')))) AS g
    FROM tr WHERE len(rawt) >= 3
  )
), s AS (
  SELECT doc_id,
         SUM(CASE WHEN (h >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS s0,
         SUM(CASE WHEN (h >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS s1,
         SUM(CASE WHEN (h >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS s2,
         SUM(CASE WHEN (h >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS s3,
         SUM(CASE WHEN (h >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS s4,
         SUM(CASE WHEN (h >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS s5,
         SUM(CASE WHEN (h >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS s6,
         SUM(CASE WHEN (h >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS s7,
         SUM(CASE WHEN (h >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS s8,
         SUM(CASE WHEN (h >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS s9,
         SUM(CASE WHEN (h >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS s10,
         SUM(CASE WHEN (h >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS s11,
         SUM(CASE WHEN (h >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS s12,
         SUM(CASE WHEN (h >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS s13,
         SUM(CASE WHEN (h >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS s14,
         SUM(CASE WHEN (h >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS s15,
         SUM(CASE WHEN (h >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS s16,
         SUM(CASE WHEN (h >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS s17,
         SUM(CASE WHEN (h >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS s18,
         SUM(CASE WHEN (h >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS s19,
         SUM(CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS s20,
         SUM(CASE WHEN (h >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS s21,
         SUM(CASE WHEN (h >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS s22,
         SUM(CASE WHEN (h >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS s23,
         SUM(CASE WHEN (h >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS s24,
         SUM(CASE WHEN (h >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS s25,
         SUM(CASE WHEN (h >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS s26,
         SUM(CASE WHEN (h >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS s27,
         SUM(CASE WHEN (h >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS s28,
         SUM(CASE WHEN (h >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS s29,
         SUM(CASE WHEN (h >> 30) & 1 = 1 THEN 1 ELSE -1 END) AS s30,
         SUM(CASE WHEN (h >> 31) & 1 = 1 THEN 1 ELSE -1 END) AS s31,
         SUM(CASE WHEN (h >> 32) & 1 = 1 THEN 1 ELSE -1 END) AS s32,
         SUM(CASE WHEN (h >> 33) & 1 = 1 THEN 1 ELSE -1 END) AS s33,
         SUM(CASE WHEN (h >> 34) & 1 = 1 THEN 1 ELSE -1 END) AS s34,
         SUM(CASE WHEN (h >> 35) & 1 = 1 THEN 1 ELSE -1 END) AS s35,
         SUM(CASE WHEN (h >> 36) & 1 = 1 THEN 1 ELSE -1 END) AS s36,
         SUM(CASE WHEN (h >> 37) & 1 = 1 THEN 1 ELSE -1 END) AS s37,
         SUM(CASE WHEN (h >> 38) & 1 = 1 THEN 1 ELSE -1 END) AS s38,
         SUM(CASE WHEN (h >> 39) & 1 = 1 THEN 1 ELSE -1 END) AS s39,
         SUM(CASE WHEN (h >> 40) & 1 = 1 THEN 1 ELSE -1 END) AS s40,
         SUM(CASE WHEN (h >> 41) & 1 = 1 THEN 1 ELSE -1 END) AS s41,
         SUM(CASE WHEN (h >> 42) & 1 = 1 THEN 1 ELSE -1 END) AS s42,
         SUM(CASE WHEN (h >> 43) & 1 = 1 THEN 1 ELSE -1 END) AS s43,
         SUM(CASE WHEN (h >> 44) & 1 = 1 THEN 1 ELSE -1 END) AS s44,
         SUM(CASE WHEN (h >> 45) & 1 = 1 THEN 1 ELSE -1 END) AS s45,
         SUM(CASE WHEN (h >> 46) & 1 = 1 THEN 1 ELSE -1 END) AS s46,
         SUM(CASE WHEN (h >> 47) & 1 = 1 THEN 1 ELSE -1 END) AS s47,
         SUM(CASE WHEN (h >> 48) & 1 = 1 THEN 1 ELSE -1 END) AS s48,
         SUM(CASE WHEN (h >> 49) & 1 = 1 THEN 1 ELSE -1 END) AS s49,
         SUM(CASE WHEN (h >> 50) & 1 = 1 THEN 1 ELSE -1 END) AS s50,
         SUM(CASE WHEN (h >> 51) & 1 = 1 THEN 1 ELSE -1 END) AS s51,
         SUM(CASE WHEN (h >> 52) & 1 = 1 THEN 1 ELSE -1 END) AS s52,
         SUM(CASE WHEN (h >> 53) & 1 = 1 THEN 1 ELSE -1 END) AS s53,
         SUM(CASE WHEN (h >> 54) & 1 = 1 THEN 1 ELSE -1 END) AS s54,
         SUM(CASE WHEN (h >> 55) & 1 = 1 THEN 1 ELSE -1 END) AS s55,
         SUM(CASE WHEN (h >> 56) & 1 = 1 THEN 1 ELSE -1 END) AS s56,
         SUM(CASE WHEN (h >> 57) & 1 = 1 THEN 1 ELSE -1 END) AS s57,
         SUM(CASE WHEN (h >> 58) & 1 = 1 THEN 1 ELSE -1 END) AS s58,
         SUM(CASE WHEN (h >> 59) & 1 = 1 THEN 1 ELSE -1 END) AS s59
  FROM e GROUP BY doc_id
), f AS (
  SELECT doc_id,
         (CASE WHEN s0 > 0 THEN CAST(1 AS BIGINT) ELSE 0 END) + (CASE WHEN s1 > 0 THEN CAST(2 AS BIGINT) ELSE 0 END) + (CASE WHEN s2 > 0 THEN CAST(4 AS BIGINT) ELSE 0 END) + (CASE WHEN s3 > 0 THEN CAST(8 AS BIGINT) ELSE 0 END) + (CASE WHEN s4 > 0 THEN CAST(16 AS BIGINT) ELSE 0 END) + (CASE WHEN s5 > 0 THEN CAST(32 AS BIGINT) ELSE 0 END) + (CASE WHEN s6 > 0 THEN CAST(64 AS BIGINT) ELSE 0 END) + (CASE WHEN s7 > 0 THEN CAST(128 AS BIGINT) ELSE 0 END) + (CASE WHEN s8 > 0 THEN CAST(256 AS BIGINT) ELSE 0 END) + (CASE WHEN s9 > 0 THEN CAST(512 AS BIGINT) ELSE 0 END) + (CASE WHEN s10 > 0 THEN CAST(1024 AS BIGINT) ELSE 0 END) + (CASE WHEN s11 > 0 THEN CAST(2048 AS BIGINT) ELSE 0 END) + (CASE WHEN s12 > 0 THEN CAST(4096 AS BIGINT) ELSE 0 END) + (CASE WHEN s13 > 0 THEN CAST(8192 AS BIGINT) ELSE 0 END) + (CASE WHEN s14 > 0 THEN CAST(16384 AS BIGINT) ELSE 0 END) + (CASE WHEN s15 > 0 THEN CAST(32768 AS BIGINT) ELSE 0 END) + (CASE WHEN s16 > 0 THEN CAST(65536 AS BIGINT) ELSE 0 END) + (CASE WHEN s17 > 0 THEN CAST(131072 AS BIGINT) ELSE 0 END) + (CASE WHEN s18 > 0 THEN CAST(262144 AS BIGINT) ELSE 0 END) + (CASE WHEN s19 > 0 THEN CAST(524288 AS BIGINT) ELSE 0 END) + (CASE WHEN s20 > 0 THEN CAST(1048576 AS BIGINT) ELSE 0 END) + (CASE WHEN s21 > 0 THEN CAST(2097152 AS BIGINT) ELSE 0 END) + (CASE WHEN s22 > 0 THEN CAST(4194304 AS BIGINT) ELSE 0 END) + (CASE WHEN s23 > 0 THEN CAST(8388608 AS BIGINT) ELSE 0 END) + (CASE WHEN s24 > 0 THEN CAST(16777216 AS BIGINT) ELSE 0 END) + (CASE WHEN s25 > 0 THEN CAST(33554432 AS BIGINT) ELSE 0 END) + (CASE WHEN s26 > 0 THEN CAST(67108864 AS BIGINT) ELSE 0 END) + (CASE WHEN s27 > 0 THEN CAST(134217728 AS BIGINT) ELSE 0 END) + (CASE WHEN s28 > 0 THEN CAST(268435456 AS BIGINT) ELSE 0 END) + (CASE WHEN s29 > 0 THEN CAST(536870912 AS BIGINT) ELSE 0 END) + (CASE WHEN s30 > 0 THEN CAST(1073741824 AS BIGINT) ELSE 0 END) + (CASE WHEN s31 > 0 THEN CAST(2147483648 AS BIGINT) ELSE 0 END) + (CASE WHEN s32 > 0 THEN CAST(4294967296 AS BIGINT) ELSE 0 END) + (CASE WHEN s33 > 0 THEN CAST(8589934592 AS BIGINT) ELSE 0 END) + (CASE WHEN s34 > 0 THEN CAST(17179869184 AS BIGINT) ELSE 0 END) + (CASE WHEN s35 > 0 THEN CAST(34359738368 AS BIGINT) ELSE 0 END) + (CASE WHEN s36 > 0 THEN CAST(68719476736 AS BIGINT) ELSE 0 END) + (CASE WHEN s37 > 0 THEN CAST(137438953472 AS BIGINT) ELSE 0 END) + (CASE WHEN s38 > 0 THEN CAST(274877906944 AS BIGINT) ELSE 0 END) + (CASE WHEN s39 > 0 THEN CAST(549755813888 AS BIGINT) ELSE 0 END) + (CASE WHEN s40 > 0 THEN CAST(1099511627776 AS BIGINT) ELSE 0 END) + (CASE WHEN s41 > 0 THEN CAST(2199023255552 AS BIGINT) ELSE 0 END) + (CASE WHEN s42 > 0 THEN CAST(4398046511104 AS BIGINT) ELSE 0 END) + (CASE WHEN s43 > 0 THEN CAST(8796093022208 AS BIGINT) ELSE 0 END) + (CASE WHEN s44 > 0 THEN CAST(17592186044416 AS BIGINT) ELSE 0 END) + (CASE WHEN s45 > 0 THEN CAST(35184372088832 AS BIGINT) ELSE 0 END) + (CASE WHEN s46 > 0 THEN CAST(70368744177664 AS BIGINT) ELSE 0 END) + (CASE WHEN s47 > 0 THEN CAST(140737488355328 AS BIGINT) ELSE 0 END) + (CASE WHEN s48 > 0 THEN CAST(281474976710656 AS BIGINT) ELSE 0 END) + (CASE WHEN s49 > 0 THEN CAST(562949953421312 AS BIGINT) ELSE 0 END) + (CASE WHEN s50 > 0 THEN CAST(1125899906842624 AS BIGINT) ELSE 0 END) + (CASE WHEN s51 > 0 THEN CAST(2251799813685248 AS BIGINT) ELSE 0 END) + (CASE WHEN s52 > 0 THEN CAST(4503599627370496 AS BIGINT) ELSE 0 END) + (CASE WHEN s53 > 0 THEN CAST(9007199254740992 AS BIGINT) ELSE 0 END) + (CASE WHEN s54 > 0 THEN CAST(18014398509481984 AS BIGINT) ELSE 0 END) + (CASE WHEN s55 > 0 THEN CAST(36028797018963968 AS BIGINT) ELSE 0 END) + (CASE WHEN s56 > 0 THEN CAST(72057594037927936 AS BIGINT) ELSE 0 END) + (CASE WHEN s57 > 0 THEN CAST(144115188075855872 AS BIGINT) ELSE 0 END) + (CASE WHEN s58 > 0 THEN CAST(288230376151711744 AS BIGINT) ELSE 0 END) + (CASE WHEN s59 > 0 THEN CAST(576460752303423488 AS BIGINT) ELSE 0 END) AS fp
  FROM s
), bands AS (
  SELECT doc_id, fp, k, (fp >> (15 * k)) & 32767 AS bb
  FROM f, (SELECT unnest([0, 1, 2, 3]) AS k)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.fp AS fp_a, b.fp AS fp_b
  FROM bands a JOIN bands b ON a.k = b.k AND a.bb = b.bb
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(fp_a, fp_b)) <= 3
ORDER BY doc_a, doc_b
"""

# Q95 — banded MinHash LSH pairs, oracled end to end ----------------
# 16 integer permutations over md5-60-bit shingle hashes mod the
# Mersenne prime 2^31-1; the oracle reproduces candidate generation
# AND the exact-Jaccard verify, so the hash checks LSH's actual
# output (recall semantics included).

ORACLES["q95"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, text || ' zzzq xq' AS text
  FROM documents
), tr AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS rawt
  FROM corpus
), sets AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(rawt) - 1),
           i -> array_to_string(rawt[i : i + 2], ' '))) AS gs
  FROM tr WHERE len(rawt) >= 3
), e AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % 2147483647 AS h
  FROM (SELECT doc_id, unnest(gs) AS g FROM sets)
), sig AS (
  SELECT doc_id,
         MIN((3 * h + 1000003) % 2147483647) AS m0,
         MIN((5 * h + 2000006) % 2147483647) AS m1,
         MIN((7 * h + 3000009) % 2147483647) AS m2,
         MIN((9 * h + 4000012) % 2147483647) AS m3,
         MIN((11 * h + 5000015) % 2147483647) AS m4,
         MIN((13 * h + 6000018) % 2147483647) AS m5,
         MIN((15 * h + 7000021) % 2147483647) AS m6,
         MIN((17 * h + 8000024) % 2147483647) AS m7,
         MIN((19 * h + 9000027) % 2147483647) AS m8,
         MIN((21 * h + 10000030) % 2147483647) AS m9,
         MIN((23 * h + 11000033) % 2147483647) AS m10,
         MIN((25 * h + 12000036) % 2147483647) AS m11,
         MIN((27 * h + 13000039) % 2147483647) AS m12,
         MIN((29 * h + 14000042) % 2147483647) AS m13,
         MIN((31 * h + 15000045) % 2147483647) AS m14,
         MIN((33 * h + 16000048) % 2147483647) AS m15
  FROM e GROUP BY doc_id
), bands AS (
  SELECT doc_id, b.* FROM sig,
  LATERAL (VALUES
    (0, m0, m1, m2, m3),
    (1, m4, m5, m6, m7),
    (2, m8, m9, m10, m11),
    (3, m12, m13, m14, m15)
  ) AS b(bk, x0, x1, x2, x3)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.bk = b.bk AND a.x0 = b.x0 AND a.x1 = b.x1
   AND a.x2 = b.x2 AND a.x3 = b.x3
  WHERE a.doc_id < b.doc_id
), v AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.gs, sb.gs)) AS BIGINT) AS n_inter,
         CAST(len(sa.gs) + len(sb.gs)
              - len(list_intersect(sa.gs, sb.gs)) AS BIGINT) AS n_union
  FROM cand c
  JOIN sets sa ON c.doc_a = sa.doc_id
  JOIN sets sb ON c.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, n_inter, n_union,
       ROUND(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 4) AS sim
FROM v
WHERE 3 * n_inter >= n_union + n_inter
ORDER BY doc_a, doc_b
"""


def _doc_graph_cte(rel: str) -> str:
    """The q96/q178/q180 deterministic document-graph closure as a
    shared CTE fragment (single definition — a divergent hand copy
    would make an oracle prove the WRONG graph while still hashing
    green against itself). ``rel`` is the relation carrying
    (doc_id, lang); emits CTEs  nn, chain, mix, es, verts, r, comp
    (comp = id -> min reachable doc_id).
    """
    return f"""nn AS (
  SELECT COUNT(*) AS n FROM documents
), chain AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM {rel} a JOIN {rel} b
    ON a.doc_id + 1 = b.doc_id AND a.lang = b.lang
), mix AS (
  SELECT doc_id AS src,
         (doc_id * doc_id) % (SELECT n FROM nn) AS dst
  FROM {rel}
  WHERE doc_id % 7 = 0
    AND doc_id <> (doc_id * doc_id) % (SELECT n FROM nn)
), es AS (
  SELECT src AS a, dst AS b FROM chain
  UNION
  SELECT dst, src FROM chain
  UNION
  SELECT src, dst FROM mix
  UNION
  SELECT dst, src FROM mix
), verts AS (
  SELECT DISTINCT a AS v FROM es
), r AS (
  SELECT v AS id, v AS lab FROM verts
  UNION
  SELECT es.b, r.lab FROM r JOIN es ON es.a = r.id
), comp AS (
  SELECT id, MIN(lab) AS comp FROM r GROUP BY id
)"""


# Q96 — connected components vs recursive-CTE transitive closure ----
# Same deterministic graph both engines (same-lang chain edges +
# i — i² mod N mixer); label = min reachable doc_id; rollup of node
# count + character mass per component. Vertices are those touched
# by >=1 edge (the operator's contract).

ORACLES["q96"] = f"""
WITH RECURSIVE {_doc_graph_cte("documents")}
SELECT c.comp AS component,
       COUNT(*) AS n_nodes,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM comp c JOIN documents d ON d.doc_id = c.id
GROUP BY c.comp
ORDER BY component
"""

# Q97 — grouped exact interpolated percentiles ----------------------
# Spark percentile(array) ↔ DuckDB quantile_cont(list): same linear
# interpolation (q19 precedent, 5 driver-green rounds), ROUND(.,4).

ORACLES["q97"] = """
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_quantity, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# Q98 — exact weighted median (cumulative decimal weights) ----------
# Membership decided by 2*cum >= total on exact decimal sums — no
# division, no interpolation, no FP anywhere in the decision.

ORACLES["q98"] = """
WITH g AS (
  SELECT l_returnflag, l_extendedprice AS price,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS w
  FROM lineitem
  GROUP BY l_returnflag, l_extendedprice
), c AS (
  SELECT l_returnflag, price,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM g
)
SELECT l_returnflag,
       MIN(price) AS weighted_median_price,
       CAST(ROUND(MAX(tot), 2) AS DOUBLE) AS total_qty
FROM c
WHERE 2 * cum >= tot
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# Q99 — snapshot diff / reconciliation report -----------------------
# Snapshot B derived identically (drop %101, +1.00 on %97, re-insert
# past MAX(o_orderkey)); full-outer + null-safe per-column flags.

ORACLES["q99"] = """
WITH a AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         CAST(o_orderdate AS DATE) AS od
  FROM orders
), mx AS (SELECT MAX(o_orderkey) AS m FROM a),
b AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 97 = 0
              THEN price + CAST(1 AS DECIMAL(12,2)) ELSE price END AS price,
         od
  FROM a WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + (SELECT m FROM mx) + 1, 'N', price, od
  FROM a WHERE o_orderkey % 101 = 0
), j AS (
  SELECT a.o_orderkey AS ka, b.o_orderkey AS kb,
         a.o_orderstatus AS sa, b.o_orderstatus AS sb,
         a.price AS pa, b.price AS pb,
         a.od AS da, b.od AS db
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
), f AS (
  SELECT
    CASE WHEN ka IS NOT NULL AND kb IS NULL THEN 'removed'
         WHEN ka IS NULL AND kb IS NOT NULL THEN 'added'
         WHEN sa IS DISTINCT FROM sb OR pa IS DISTINCT FROM pb
              OR da IS DISTINCT FROM db THEN 'changed'
         ELSE 'unchanged' END AS change_type,
    CAST(ka IS NOT NULL AND kb IS NOT NULL
         AND sa IS DISTINCT FROM sb AS INTEGER) AS c_status,
    CAST(ka IS NOT NULL AND kb IS NOT NULL
         AND pa IS DISTINCT FROM pb AS INTEGER) AS c_price,
    CAST(ka IS NOT NULL AND kb IS NOT NULL
         AND da IS DISTINCT FROM db AS INTEGER) AS c_date
  FROM j
)
SELECT change_type,
       COUNT(*) AS n_keys,
       CAST(SUM(c_status) AS BIGINT) AS n_status_changed,
       CAST(SUM(c_price) AS BIGINT) AS n_price_changed,
       CAST(SUM(c_date) AS BIGINT) AS n_date_changed
FROM f
GROUP BY change_type
ORDER BY change_type
"""

# Q100 — vocabulary coverage / OOV report ---------------------------
# Vocab = corpus top-1000 tokens by (freq desc, token asc); all
# counts integer, one double division + ROUND(.,6).

ORACLES["q100"] = r"""
WITH e AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                            x -> x <> '')) AS tok
  FROM documents
), freq AS (
  SELECT tok, COUNT(*) AS f FROM e GROUP BY tok
), vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY f DESC, tok ASC) AS r
    FROM freq
  ) WHERE r <= 1000
)
SELECT e.source,
       COUNT(*) AS n_tokens,
       COUNT(*) FILTER (v.tok IS NULL) AS n_oov,
       COUNT(DISTINCT CASE WHEN freq.f <= 2 THEN e.tok END)
         AS n_rare_distinct,
       ROUND(CAST(COUNT(*) FILTER (v.tok IS NULL) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM e
JOIN freq ON e.tok = freq.tok
LEFT JOIN vocab v ON e.tok = v.tok
GROUP BY e.source
ORDER BY e.source
"""

# Q101 — largest-remainder exact money proration --------------------
# Integer cents only; allocations sum exactly to the order total by
# construction; remainder cents distributed by (frac desc, line asc).

ORACLES["q101"] = """
WITH o AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 10 = 0
), li AS (
  SELECT l_orderkey AS o_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
), j0 AS (
  SELECT li.o_orderkey, li.l_linenumber, o.cents, li.q
  FROM li JOIN o USING (o_orderkey)
), tot AS (
  SELECT o_orderkey, SUM(q) AS qq FROM j0 GROUP BY o_orderkey
), j AS (
  SELECT j0.o_orderkey, j0.l_linenumber, j0.q, j0.cents,
         (j0.cents * j0.q) // tot.qq AS share,
         (j0.cents * j0.q) % tot.qq AS frac
  FROM j0 JOIN tot USING (o_orderkey)
), rem AS (
  SELECT o_orderkey, MAX(cents) - CAST(SUM(share) AS BIGINT) AS r
  FROM j GROUP BY o_orderkey
), ranked AS (
  SELECT j.o_orderkey, j.l_linenumber, j.q, j.share, rem.r,
         ROW_NUMBER() OVER (PARTITION BY j.o_orderkey
                            ORDER BY j.frac DESC, j.l_linenumber ASC,
                                     j.q ASC) AS rn
  FROM j JOIN rem USING (o_orderkey)
)
SELECT o_orderkey, l_linenumber, q,
       CAST(share + CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_cents
FROM ranked
ORDER BY o_orderkey, l_linenumber, q
"""

# Q102 — deterministic group mode ------------------------------------

ORACLES["q102"] = """
WITH c AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY n DESC, o_orderstatus ASC) AS rn,
         SUM(n) OVER (PARTITION BY o_orderpriority) AS tot
  FROM c
)
SELECT o_orderpriority, o_orderstatus AS modal_status, n,
       ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
FROM r WHERE rn = 1
ORDER BY o_orderpriority
"""

# Q103 — ratio-to-report window shares -------------------------------
# Decimal revenue sums; share divisions over the 25-row nation-grain
# aggregate (window sums of exact decimals are associative).

ORACLES["q103"] = """
WITH rev AS (
  SELECT r.r_name, n.n_name,
         SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name,
       CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
         AS share_of_region,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS share_of_world
FROM rev
ORDER BY r_name, n_name
"""

# Q104 — join-key skew diagnostic ------------------------------------

ORACLES["q104"] = """
WITH per_key AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
), s AS (
  SELECT o_custkey, n,
         SUM(n) OVER () AS rows_,
         COUNT(*) OVER () AS keys_
  FROM per_key
)
SELECT o_custkey, n,
       ROUND(CAST(n AS DOUBLE) / CAST(rows_ AS DOUBLE), 6) AS share_of_rows,
       ROUND(CAST(n AS DOUBLE)
             / (CAST(rows_ AS DOUBLE) / CAST(keys_ AS DOUBLE)), 6)
         AS skew_vs_mean
FROM s
ORDER BY n DESC, o_custkey ASC
LIMIT 10
"""

# Q105 — CAL-ACCESS latest-amendment-wins + filer navigation ---------
# Amendable filing itemization derived from orders/lineitem (same
# derivation as the Spark side): o_orderkey % 3 amendments, each
# dropping (l_linenumber + a) % 7 == 0 lines and bumping amounts by
# a cents; latest amendment REPLACES the whole filing; duplicate
# filer->filing link rows collapsed before the rollup.

ORACLES["q105"] = """
WITH amend AS (
  SELECT o.o_orderkey AS filing_id, s.a AS amend_id
  FROM orders o
  JOIN (SELECT 0 AS a UNION ALL SELECT 1 UNION ALL SELECT 2) s
    ON s.a <= o.o_orderkey % 3
), lines AS (
  SELECT am.filing_id, am.amend_id,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           + CAST(am.amend_id AS DECIMAL(12,2))
             * CAST(0.01 AS DECIMAL(12,2)) AS amount
  FROM amend am
  JOIN lineitem l ON l.l_orderkey = am.filing_id
  WHERE (l.l_linenumber + am.amend_id) % 7 <> 0
), live AS (
  SELECT filing_id, amount FROM (
    SELECT lines.*,
           MAX(amend_id) OVER (PARTITION BY filing_id) AS mx
    FROM lines
  ) WHERE amend_id = mx
), links AS (
  SELECT DISTINCT filing_id, filer_id FROM (
    SELECT o_orderkey AS filing_id, o_custkey AS filer_id FROM orders
    UNION ALL
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 5 = 0
  )
)
SELECT lk.filer_id,
       COUNT(DISTINCT lv.filing_id) AS n_filings,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(lv.amount), 2) AS DOUBLE) AS total_amount
FROM live lv
JOIN links lk ON lv.filing_id = lk.filing_id
GROUP BY lk.filer_id
ORDER BY lk.filer_id
"""

# Q106 — degree-oriented triangle counting ---------------------------
# Same construction: part co-purchase edges (orders %4), degree
# orientation low->high, wedge self-join closed against oriented
# edges; all integers, transitivity one IEEE division.

ORACLES["q106"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey % 4 = 0
), e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT id, COUNT(*) AS d FROM (
    SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e
  ) GROUP BY id
), o AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS s,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS t,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN dv.d ELSE du.d END AS dt
  FROM e
  JOIN deg du ON du.id = e.u
  JOIN deg dv ON dv.id = e.v
), w AS (
  SELECT o1.t AS wa, o2.t AS wb
  FROM o o1 JOIN o o2
    ON o1.s = o2.s
   AND (o1.dt < o2.dt OR (o1.dt = o2.dt AND o1.t < o2.t))
), tri AS (
  SELECT w.wa, w.wb FROM w
  WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.wa AND o.t = w.wb)
)
SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT CAST(SUM(d * (d - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
       (SELECT COUNT(*) FROM tri) AS n_triangles,
       3 * CAST((SELECT COUNT(*) FROM tri) AS DOUBLE)
         / CAST((SELECT CAST(SUM(d * (d - 1)) / 2 AS BIGINT) FROM deg)
                AS DOUBLE) AS transitivity
"""

# Q107 — deterministic priority (weighted) sampling ------------------
# u = integer md5-prefix of the row identity; priority = u / weight
# (one IEEE division, bit-deterministic); k smallest win.

ORACLES["q107"] = """
WITH s AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST(l_quantity AS BIGINT) AS w,
         CAST(CAST(
           ('0x' || SUBSTRING(md5(
             CAST(l_orderkey AS VARCHAR) || '|' ||
             CAST(l_linenumber AS VARCHAR) || '|' ||
             CAST(l_partkey AS VARCHAR) || '|' ||
             CAST(l_suppkey AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT)
           AS DOUBLE)
           / CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS priority
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, w, priority
FROM s
ORDER BY priority, l_orderkey, l_linenumber, l_partkey, l_suppkey
LIMIT 20
"""

# Q108 — ordered conversion funnel -----------------------------------
# Stage k = earliest qualifying event at or after stage k-1; floored
# epoch seconds; rates are single IEEE divisions of exact counts.

ORACLES["q108"] = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, event_type
  FROM events
), u AS (
  SELECT DISTINCT user_id FROM e
), t1 AS (
  SELECT user_id, MIN(ep) AS t1 FROM e
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(ep) AS t2
  FROM e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ep >= t1.t1
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(ep) AS t3
  FROM e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ep >= t2.t2
  GROUP BY e.user_id
), f AS (
  SELECT u.user_id, t1.t1, t2.t2, t3.t3
  FROM u
  LEFT JOIN t1 USING (user_id)
  LEFT JOIN t2 USING (user_id)
  LEFT JOIN t3 USING (user_id)
)
SELECT COUNT(*) AS n_users,
       COUNT(t1) AS n_viewed,
       COUNT(t2) AS n_clicked_after_view,
       COUNT(t3) AS n_purchased_after_click,
       CASE WHEN COUNT(t1) > 0 THEN
         ROUND(CAST(COUNT(t2) AS DOUBLE) / CAST(COUNT(t1) AS DOUBLE), 6)
       END AS view_to_click,
       CASE WHEN COUNT(t2) > 0 THEN
         ROUND(CAST(COUNT(t3) AS DOUBLE) / CAST(COUNT(t2) AS DOUBLE), 6)
       END AS click_to_purchase
FROM f
"""

# Q109 — retention cohort matrix -------------------------------------
# Cohort = ISO week (Monday) of first event day; day arithmetic only.

ORACLES["q109"] = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events
), first AS (
  SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id
), cohort AS (
  SELECT user_id, d0, CAST(date_trunc('week', d0) AS DATE) AS cohort_week
  FROM first
), size_ AS (
  SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size
  FROM cohort GROUP BY cohort_week
), act AS (
  SELECT cohort_week,
         CAST(FLOOR((e.d - c.d0) / 7) AS INTEGER) AS week_offset,
         COUNT(DISTINCT e.user_id) AS n_active
  FROM e JOIN cohort c USING (user_id)
  GROUP BY cohort_week, CAST(FLOOR((e.d - c.d0) / 7) AS INTEGER)
)
SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
       ROUND(CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 6)
         AS retention
FROM act a JOIN size_ s USING (cohort_week)
ORDER BY a.cohort_week, a.week_offset
"""

# Q110 — content-defined chunking + chunk dedup report ---------------
# Boundary when the 8-char window's md5-prefix int is 0 mod 64;
# doc end always cuts; chunks rebuilt per doc via LAG over cuts.

ORACLES["q110"] = """
WITH d AS (
  SELECT doc_id, source, text, length(text) AS n FROM documents
), pos AS (
  SELECT d.doc_id, d.source, d.text, d.n, CAST(t.i AS INTEGER) AS i
  FROM d, LATERAL UNNEST(range(1, d.n - 6)) AS t(i)
  WHERE d.n >= 8
), cuts_b AS (
  SELECT doc_id, source, text, i + 7 AS p
  FROM pos
  WHERE CAST(CAST(('0x' || SUBSTRING(md5(SUBSTRING(text, i, 8)), 1, 15))
             ::UBIGINT AS BIGINT) AS BIGINT) % 64 = 0
    AND i + 7 < n
), cuts AS (
  SELECT DISTINCT doc_id, source, text, p FROM (
    SELECT doc_id, source, text, p FROM cuts_b
    UNION ALL
    SELECT doc_id, source, text, n AS p FROM d
  )
), ch AS (
  SELECT source, text, p,
         COALESCE(LAG(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1
           AS start
  FROM cuts
), fp AS (
  SELECT source, p - start + 1 AS clen,
         md5(SUBSTRING(text, start, p - start + 1)) AS f
  FROM ch
)
SELECT source,
       COUNT(*) AS n_chunks,
       COUNT(DISTINCT f) AS n_distinct_chunks,
       ROUND(CAST(COUNT(*) - COUNT(DISTINCT f) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_chunk_ratio,
       ROUND(CAST(CAST(SUM(clen) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 4) AS avg_chunk_len
FROM fp
GROUP BY source
ORDER BY source
"""

# Q111 — bucket-level Merkle reconciliation --------------------------
# Same snapshot-B derivation as q99; commutative (count, XOR of
# md5-prefix row hashes) fingerprints per o_orderkey % 64 bucket.

ORACLES["q111"] = """
WITH a AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         CAST(o_orderdate AS DATE) AS od
  FROM orders
), mx AS (SELECT MAX(o_orderkey) AS m FROM a),
b AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 97 = 0
              THEN price + CAST(1 AS DECIMAL(12,2)) ELSE price END AS price,
         od
  FROM a WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + (SELECT m FROM mx) + 1, 'N', price, od
  FROM a WHERE o_orderkey % 101 = 0
), fa AS (
  SELECT o_orderkey % 64 AS bucket, COUNT(*) AS n_a,
         bit_xor(CAST(CAST(('0x' || SUBSTRING(md5(
           CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
           CAST(price AS VARCHAR) || '|' || CAST(od AS VARCHAR)
         ), 1, 15))::UBIGINT AS BIGINT) AS BIGINT)) AS fp_a
  FROM a GROUP BY 1
), fb AS (
  SELECT o_orderkey % 64 AS bucket, COUNT(*) AS n_b,
         bit_xor(CAST(CAST(('0x' || SUBSTRING(md5(
           CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
           CAST(price AS VARCHAR) || '|' || CAST(od AS VARCHAR)
         ), 1, 15))::UBIGINT AS BIGINT) AS BIGINT)) AS fp_b
  FROM b GROUP BY 1
)
SELECT COALESCE(fa.bucket, fb.bucket) AS bucket,
       COALESCE(n_a, 0) AS n_a,
       COALESCE(n_b, 0) AS n_b,
       CAST(n_a IS NOT DISTINCT FROM n_b
            AND fp_a IS NOT DISTINCT FROM fp_b AS INTEGER) AS bucket_match
FROM fa FULL OUTER JOIN fb ON fa.bucket = fb.bucket
ORDER BY bucket
"""

# Q112 — amendment-over-amendment delta rollup -----------------------
# q105's derivation; per-(filing, amend) totals, LAG deltas within a
# filing, rollup per amendment generation. Exact decimal throughout.

ORACLES["q112"] = """
WITH amend AS (
  SELECT o.o_orderkey AS filing_id, s.a AS amend_id
  FROM orders o
  JOIN (SELECT CAST(0 AS BIGINT) AS a UNION ALL SELECT 1 UNION ALL SELECT 2) s
    ON s.a <= o.o_orderkey % 3
), lines AS (
  SELECT am.filing_id, am.amend_id,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           + CAST(am.amend_id AS DECIMAL(12,2))
             * CAST(0.01 AS DECIMAL(12,2)) AS amount
  FROM amend am
  JOIN lineitem l ON l.l_orderkey = am.filing_id
  WHERE (l.l_linenumber + am.amend_id) % 7 <> 0
), per AS (
  SELECT filing_id, amend_id, COUNT(*) AS n_lines, SUM(amount) AS total
  FROM lines GROUP BY filing_id, amend_id
), d AS (
  SELECT filing_id, amend_id, n_lines, total,
         n_lines - LAG(n_lines) OVER (PARTITION BY filing_id
                                      ORDER BY amend_id) AS d_lines,
         total - LAG(total) OVER (PARTITION BY filing_id
                                  ORDER BY amend_id) AS d_total
  FROM per
)
SELECT amend_id,
       COUNT(*) AS n_filings_amended,
       CAST(SUM(ABS(d_lines)) AS BIGINT) AS abs_line_churn,
       CAST(ROUND(SUM(ABS(d_total)), 2) AS DOUBLE) AS abs_amount_churn,
       CAST(ROUND(SUM(d_total), 2) AS DOUBLE) AS net_amount_delta
FROM d
WHERE amend_id > 0
GROUP BY amend_id
ORDER BY amend_id
"""

# Q113 — exact heavy hitters ----------------------------------------
# The naive full-vocabulary groupBy IS the oracle: the Spark side's
# bounded-state Misra-Gries candidates + exact recount must land on
# the identical (token, count) set for threshold N/30.

ORACLES["q113"] = r"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                            x -> x <> '')) AS tok
  FROM documents
), c AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY tok
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok
)
SELECT c.tok, c.cnt, t.total
FROM c, t
WHERE c.cnt * 30 > t.total
ORDER BY c.cnt DESC, c.tok
"""

# Q114 — sorted-neighborhood near-dup pairs -------------------------
# Block = first two tokens; rank by (text, doc_id) within block;
# candidates at rank distance <= 3; verify 3-shingle Jaccard >= 0.5
# via the q91 inverted-index count-join.

ORACLES["q114"] = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS rawt
  FROM documents
), blocked AS (
  SELECT doc_id, text, array_to_string(rawt[1:2], ' ') AS blk FROM t
), ranked AS (
  SELECT doc_id, blk,
         ROW_NUMBER() OVER (PARTITION BY blk ORDER BY text, doc_id) AS r
  FROM blocked
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ranked a JOIN ranked b
    ON a.blk = b.blk AND b.r > a.r AND b.r <= a.r + 3
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(rawt) - 1),
           i -> array_to_string(rawt[i : i + 2], ' '))) AS toks
  FROM t WHERE len(rawt) >= 3
), sz AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt FROM s
), sh AS (
  SELECT doc_id, unnest(toks) AS g FROM s
), inter AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.g = a.g
  GROUP BY c.doc_a, c.doc_b
), p AS (
  SELECT i.doc_a, i.doc_b, i.n_inter,
         sa.nt + sb.nt - i.n_inter AS n_union
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, n_inter, n_union,
       ROUND(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 4) AS sim
FROM p
WHERE 3 * n_inter >= n_union + n_inter
ORDER BY doc_a, doc_b
"""

# Q115 — time-weighted average value (TWAP) -------------------------
# Exact integer cents x integer-second holding intervals; floats
# only in the final divisions.

ORACLES["q115"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
), iv AS (
  SELECT event_type, cents,
         LEAD(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id) - ep
           AS dur
  FROM e
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       CAST(SUM(dur) AS BIGINT) AS total_sec,
       CASE WHEN SUM(dur) > 0 THEN
         ROUND((CAST(SUM(cents * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE))
               / 100.0, 6)
       END AS twap_value
FROM iv
WHERE dur IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""

# Q116 — grouped OLS from exact moment sums -------------------------
# HUGEINT sums mirror Spark's decimal(38,0); each sum casts to
# double ONCE, then fixed IEEE expression trees.

ORACLES["q116"] = """
WITH li AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM li GROUP BY l_returnflag
), d AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
         CAST(syy AS DOUBLE) AS syyd
  FROM g
), m AS (
  SELECT l_returnflag, n, nd, sxd, syd,
         nd * sxyd - sxd * syd AS num,
         nd * sxxd - sxd * sxd AS den,
         nd * syyd - syd * syd AS deny
  FROM d
)
SELECT l_returnflag, n,
       CASE WHEN den <> 0 THEN ROUND(num / den, 6) END
         AS slope_cents_per_unit,
       CASE WHEN den <> 0 THEN ROUND((syd - (num / den) * sxd) / nd, 6) END
         AS intercept_cents,
       CASE WHEN den * deny <> 0 THEN ROUND((num * num) / (den * deny), 6) END
         AS r2
FROM m
ORDER BY l_returnflag
"""

# Q117 — relational division ("for all" join) -----------------------

ORACLES["q117"] = """
WITH e AS (
  SELECT user_id, event_type FROM events
), k AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types
  FROM e
), pu AS (
  SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nt
  FROM e GROUP BY user_id
)
SELECT MIN(k.n_event_types) AS n_event_types,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN nt = k.n_event_types THEN 1 ELSE 0 END)
            AS BIGINT) AS n_complete_users,
       ROUND(CAST(SUM(CASE WHEN nt = k.n_event_types THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS complete_share
FROM pu, k
"""

# Q118 — per-stratum weighted priority sample -----------------------
# q107's md5-integer priority, ranked inside each source stratum.

ORACLES["q118"] = """
WITH d AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS u
  FROM documents
  WHERE n_chars > 0
), s AS (
  SELECT source, doc_id, w,
         CAST(u AS DOUBLE) / CAST(w AS DOUBLE) AS priority
  FROM d
), r AS (
  SELECT source, doc_id, w, priority,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY priority, doc_id) AS rn
  FROM s
)
SELECT source, doc_id, w, priority, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
ORDER BY source, rn
"""

# Q119 — bigram collocations by lift --------------------------------
# lift = n_xy * N / (n_x * n_y): exact integer factors, one fixed
# IEEE expression; PMI's log dropped (monotone equivalent).

ORACLES["q119"] = r"""
WITH t AS (
  SELECT list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS toks
  FROM documents
), t2 AS (
  SELECT toks FROM t WHERE len(toks) > 1
), uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS nw
  FROM (SELECT unnest(toks) AS w FROM t2) GROUP BY w
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total
  FROM (SELECT unnest(toks) AS w FROM t2)
), big AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM t2, UNNEST(range(1, len(toks))) AS u(i)
), nxy AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM big GROUP BY w1, w2
)
SELECT n.w1, n.w2, n.n_xy, ux.nw AS n_x, uy.nw AS n_y,
       ROUND((CAST(n.n_xy AS DOUBLE) * CAST(t.n_total AS DOUBLE))
             / (CAST(ux.nw AS DOUBLE) * CAST(uy.nw AS DOUBLE)), 6)
         AS lift
FROM nxy n
JOIN uni ux ON ux.w = n.w1
JOIN uni uy ON uy.w = n.w2, nn t
WHERE n.n_xy >= 5
ORDER BY lift DESC, n.w1, n.w2
LIMIT 20
"""

# Q120 — second-order event sequence mining -------------------------

ORACLES["q120"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         event_type
  FROM events
), tri AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
)
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS cnt
FROM tri WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY cnt DESC, e1, e2, e3
LIMIT 15
"""

# Q121 — exact weighted quartiles (q98 generalized) ------------------
# Oracle states the semantics at full (flag, price) grain; the Spark
# side's bucketed two-level search must land on identical prices.

ORACLES["q121"] = """
WITH li AS (
  SELECT l_returnflag,
         l_extendedprice AS price,
         CAST(l_quantity AS DECIMAL(20,2)) AS q
  FROM lineitem
), g AS (
  SELECT l_returnflag, price, SUM(q) AS w
  FROM li GROUP BY l_returnflag, price
), c AS (
  SELECT l_returnflag, price,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM g
), hit AS (
  SELECT l_returnflag, k, MIN(price) AS qp, MAX(tot) AS tot
  FROM c, UNNEST([1, 2, 3]) AS u(k)
  WHERE 4 * cum >= k * tot
  GROUP BY l_returnflag, k
)
SELECT l_returnflag,
       MIN(CASE WHEN k = 1 THEN qp END) AS p25_price,
       MIN(CASE WHEN k = 2 THEN qp END) AS median_price,
       MIN(CASE WHEN k = 3 THEN qp END) AS p75_price,
       CAST(ROUND(MAX(tot), 2) AS DOUBLE) AS total_qty
FROM hit
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# Q122 — OHLC resampling ---------------------------------------------

ORACLES["q122"] = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep, value
  FROM events
), b AS (
  SELECT event_type, CAST(ep // 21600 AS BIGINT) AS bucket,
         ep, event_id, value
  FROM e
), v AS (
  SELECT event_type, bucket, value,
         FIRST_VALUE(value) OVER w AS open,
         LAST_VALUE(value) OVER
           (PARTITION BY event_type, bucket ORDER BY ep, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS close
  FROM b
  WINDOW w AS (PARTITION BY event_type, bucket ORDER BY ep, event_id)
)
SELECT event_type, bucket,
       MIN(open) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(close) AS close,
       COUNT(*) AS n_events
FROM v
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""

# Q123 — market-basket association rules (brand pairs) ---------------

ORACLES["q123"] = """
WITH b AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b
), na AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY p_brand
), pairs AS (
  SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
  GROUP BY x.p_brand, y.p_brand
  HAVING COUNT(*) >= 50
)
SELECT p.brand_a, p.brand_b, p.n_ab,
       ua.n AS n_a, ub.n AS n_b, n.n_orders,
       ROUND(CAST(p.n_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE), 6)
         AS support,
       ROUND(CAST(p.n_ab AS DOUBLE) / CAST(ua.n AS DOUBLE), 6)
         AS confidence_ab,
       ROUND((CAST(p.n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
             / (CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)), 6) AS lift
FROM pairs p
JOIN na ua ON ua.p_brand = p.brand_a
JOIN na ub ON ub.p_brand = p.brand_b, n
ORDER BY lift DESC, p.brand_a, p.brand_b
LIMIT 20
"""

# Q124 — last-touch attribution --------------------------------------

ORACLES["q124"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
), tagged AS (
  SELECT event_type, cents,
         LAST_VALUE(
           CASE WHEN event_type = 'click' THEN CAST(k // 10 AS BIGINT) END
           IGNORE NULLS
         ) OVER (PARTITION BY user_id ORDER BY ep, event_id
                 ROWS UNBOUNDED PRECEDING) AS channel
  FROM e
), pur AS (
  SELECT COALESCE(channel, -1) AS channel, cents
  FROM tagged WHERE event_type = 'purchase'
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tot, SUM(cents) AS c_tot FROM pur
)
SELECT channel,
       COUNT(*) AS n_purchases,
       ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS attributed_value,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(t.n_tot AS DOUBLE), 6)
         AS purchase_share,
       ROUND(CAST(SUM(cents) AS DOUBLE) / CAST(t.c_tot AS DOUBLE), 6)
         AS value_share
FROM pur, tot t
GROUP BY channel, t.n_tot, t.c_tot
ORDER BY channel
"""

# Q125 — rolling 7-day distinct active users (DAU/WAU) ---------------
# Contribution explode, not per-day self-joins: each (user, day)
# row fans out to the 7 report days it serves.

ORACLES["q125"] = """
WITH e AS (
  SELECT user_id,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS BIGINT) AS dd
  FROM events
), ud AS (
  SELECT DISTINCT user_id, dd FROM e
), dau AS (
  SELECT dd, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM ud GROUP BY dd
), contrib AS (
  SELECT DISTINCT user_id, dd + i AS rd
  FROM ud, UNNEST(range(0, 7)) AS u(i)
), wau AS (
  SELECT c.rd, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
  FROM contrib c
  WHERE c.rd IN (SELECT dd FROM ud)
  GROUP BY c.rd
)
SELECT dau.dd AS day, dau.dau, wau.wau,
       ROUND(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
         AS stickiness
FROM dau JOIN wau ON wau.rd = dau.dd
ORDER BY day
"""

# Q126 — time-to-convert distribution --------------------------------

ORACLES["q126"] = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, event_type
  FROM events
), s AS (
  SELECT user_id, MIN(ep) AS s FROM e
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ep) AS p, MIN(s.s) AS s2
  FROM e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ep >= s.s
  GROUP BY e.user_id
), g AS (
  SELECT CAST((p - s2) // 86400 AS BIGINT) AS gap_days FROM p
), ns AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_signup FROM s
)
SELECT ns.n_signup,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(ns.n_signup AS DOUBLE), 6)
         AS conversion_rate,
       MIN(gap_days) AS min_days,
       quantile_cont(gap_days, 0.5) AS median_days,
       quantile_cont(gap_days, 0.9) AS p90_days,
       MAX(gap_days) AS max_days
FROM g, ns
GROUP BY ns.n_signup
"""

# Q127 — robust MAD outliers (modified z-score) ----------------------
# Both medians are the declared smallest-value-with-2*cum>=tot order
# statistic (no interpolation); the outlier test compares two fixed
# IEEE products.

ORACLES["q127"] = """
WITH li AS (
  SELECT l_returnflag, l_extendedprice AS price FROM lineitem
), g AS (
  SELECT l_returnflag, price, CAST(COUNT(*) AS BIGINT) AS w
  FROM li GROUP BY l_returnflag, price
), c1 AS (
  SELECT l_returnflag, price,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM g
), med AS (
  SELECT l_returnflag, MIN(price) AS med
  FROM c1 WHERE 2 * cum >= tot GROUP BY l_returnflag
), dev AS (
  SELECT g.l_returnflag, ABS(g.price - med.med) AS d, SUM(g.w) AS w
  FROM g JOIN med USING (l_returnflag)
  GROUP BY g.l_returnflag, ABS(g.price - med.med)
), c2 AS (
  SELECT l_returnflag, d,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM dev
), mad AS (
  SELECT l_returnflag, MIN(d) AS mad
  FROM c2 WHERE 2 * cum >= tot GROUP BY l_returnflag
)
SELECT li.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(med.med) AS median_price,
       MIN(mad.mad) AS mad,
       CAST(SUM(CASE WHEN 0.6745 * ABS(li.price - med.med)
                          > 3.5 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(CAST(SUM(CASE WHEN 0.6745 * ABS(li.price - med.med)
                                > 3.5 * mad.mad
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
FROM li
JOIN med USING (l_returnflag)
JOIN mad USING (l_returnflag)
GROUP BY li.l_returnflag
ORDER BY li.l_returnflag
"""

# Q128 — cross-split content leakage audit ---------------------------
# Fingerprint = md5 of the sorted distinct \S+ token set (RE2 \S ==
# the complement of the spelled-out Java WS class — ops/text.py);
# fold = ops/split.py's md5 bucket twin. Integer counts only.

ORACLES["q128"] = r"""
WITH f AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
             regexp_extract_all(lower(trim(text)), '\S+'))), ' ')) AS fp,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS b
  FROM documents
), s AS (
  SELECT doc_id, fp,
         CASE WHEN b < 90 THEN 'train'
              WHEN b < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM f
)
SELECT fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
       array_to_string(list_sort(array_agg(DISTINCT split)), ',') AS splits,
       MIN(doc_id) AS first_doc
FROM s
GROUP BY fp
HAVING COUNT(DISTINCT split) > 1
ORDER BY first_doc
"""

# Q129 — equi-depth deciles (naive cumulative-window oracle) ---------
# The engine runs the bucketed two-level search; the oracle states
# the same order statistic naively: per priority, the smallest price
# with 10*cum >= k*tot for k = 1..9.

ORACLES["q129"] = """
WITH o AS (
  SELECT o_orderpriority AS pri, o_totalprice AS price FROM orders
), g AS (
  SELECT pri, price, CAST(COUNT(*) AS BIGINT) AS w
  FROM o GROUP BY pri, price
), c AS (
  SELECT pri, price,
         SUM(w) OVER (PARTITION BY pri ORDER BY price
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY pri) AS tot
  FROM g
), k AS (
  SELECT range AS k FROM range(1, 10)
), hit AS (
  SELECT c.pri, k.k, MIN(c.price) AS q, MAX(c.tot) AS tot
  FROM c CROSS JOIN k
  WHERE 10 * c.cum >= k.k * c.tot
  GROUP BY c.pri, k.k
)
SELECT pri,
       MIN(CASE WHEN k = 1 THEN q END) AS d1,
       MIN(CASE WHEN k = 2 THEN q END) AS d2,
       MIN(CASE WHEN k = 3 THEN q END) AS d3,
       MIN(CASE WHEN k = 4 THEN q END) AS d4,
       MIN(CASE WHEN k = 5 THEN q END) AS d5,
       MIN(CASE WHEN k = 6 THEN q END) AS d6,
       MIN(CASE WHEN k = 7 THEN q END) AS d7,
       MIN(CASE WHEN k = 8 THEN q END) AS d8,
       MIN(CASE WHEN k = 9 THEN q END) AS d9,
       CAST(MAX(tot) AS BIGINT) AS n
FROM hit
GROUP BY pri
ORDER BY pri
"""

# Q130 — decile gains table via quantile boundaries ------------------
# Boundaries are the same smallest-value order statistic; membership
# is the tie-stable band count |{k: spend > d_k}|, flipped so decile
# 1 is the top tenth. Decimal money end-to-end; IEEE division only
# in the final rounded shares.

ORACLES["q130"] = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
  FROM orders GROUP BY o_custkey
), sg AS (
  SELECT spend, CAST(COUNT(*) AS BIGINT) AS w FROM spend GROUP BY spend
), c AS (
  SELECT spend,
         SUM(w) OVER (ORDER BY spend ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER () AS tot
  FROM sg
), k AS (
  SELECT range AS k FROM range(1, 10)
), b AS (
  SELECT k.k, MIN(c.spend) AS d
  FROM c CROSS JOIN k
  WHERE 10 * c.cum >= k.k * c.tot
  GROUP BY k.k
), banded AS (
  SELECT s.o_custkey, s.spend,
         10 - (SELECT COUNT(*) FROM b WHERE s.spend > b.d) AS decile
  FROM spend s
), d AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust, SUM(spend) AS dspend
  FROM banded GROUP BY decile
)
SELECT decile,
       n_cust,
       CAST(ROUND(dspend, 2) AS DOUBLE) AS decile_spend,
       ROUND(CAST(dspend AS DOUBLE)
             / CAST(SUM(dspend) OVER () AS DOUBLE), 6) AS share,
       ROUND(CAST(SUM(dspend) OVER (ORDER BY decile
                                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(SUM(dspend) OVER () AS DOUBLE), 6) AS cum_share
FROM d
ORDER BY decile
"""

# Q131 — A/B lift with Welch z from exact moment sums ----------------
# Variant = ops/split.py md5 fold at n=2; metric = per-user total
# purchase value in decimal; z from decimal power sums cast to
# double once (q62/q116 idiom). DECIMAL(18,4) cap on the per-user
# metric keeps m*m within decimal-38 in both engines.

ORACLES["q131"] = """
WITH u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END)
              AS DECIMAL(18,4)) AS m
  FROM events GROUP BY user_id
), v AS (
  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         m
  FROM u
), s AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(m) AS sm, SUM(m * m) AS smm
  FROM v GROUP BY variant
), one AS (
  SELECT
    MIN(CASE WHEN variant = 'A' THEN n END) AS n_a,
    MIN(CASE WHEN variant = 'B' THEN n END) AS n_b,
    CAST(MIN(CASE WHEN variant = 'A' THEN sm END) AS DOUBLE) AS sa,
    CAST(MIN(CASE WHEN variant = 'B' THEN sm END) AS DOUBLE) AS sb,
    CAST(MIN(CASE WHEN variant = 'A' THEN smm END) AS DOUBLE) AS saa,
    CAST(MIN(CASE WHEN variant = 'B' THEN smm END) AS DOUBLE) AS sbb
  FROM s
)
SELECT n_a, n_b,
       ROUND(sa / CAST(n_a AS DOUBLE), 6) AS mean_a,
       ROUND(sb / CAST(n_b AS DOUBLE), 6) AS mean_b,
       ROUND(sb / CAST(n_b AS DOUBLE) - sa / CAST(n_a AS DOUBLE), 6) AS lift,
       ROUND((sb / CAST(n_b AS DOUBLE) - sa / CAST(n_a AS DOUBLE))
             / sqrt(((CAST(n_a AS DOUBLE) * saa - sa * sa)
                     / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
                    / CAST(n_a AS DOUBLE)
                    + ((CAST(n_b AS DOUBLE) * sbb - sb * sb)
                       / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
                      / CAST(n_b AS DOUBLE)), 6) AS welch_z
FROM one
"""

# Q132 — duplicate baskets via set-valued keys -----------------------

ORACLES["q132"] = """
WITH b AS (
  SELECT l.l_orderkey AS okey,
         array_to_string(list_sort(array_agg(DISTINCT p.p_brand)), ',') AS basket,
         CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY l.l_orderkey
)
SELECT basket, n_brands,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(okey) AS first_order
FROM b
GROUP BY basket, n_brands
HAVING COUNT(*) > 1 AND n_brands >= 3
ORDER BY n_orders DESC, basket ASC
LIMIT 20
"""

# Q133 — weekly cohort retention (integer epoch-weeks) ---------------

ORACLES["q133"] = """
WITH e AS (
  SELECT user_id, event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
  FROM events
), su AS (
  SELECT user_id, MIN(wk) AS cw FROM e
  WHERE event_type = 'signup' GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, wk AS aw FROM e
  WHERE event_type = 'purchase' AND value >= 150
), coh AS (
  SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM su GROUP BY cw
)
SELECT su.cw AS cohort_week,
       act.aw - su.cw AS weeks_since,
       CAST(COUNT(DISTINCT su.user_id) AS BIGINT) AS n_active,
       MIN(coh.n_cohort) AS n_cohort,
       ROUND(CAST(COUNT(DISTINCT su.user_id) AS DOUBLE)
             / CAST(MIN(coh.n_cohort) AS DOUBLE), 6) AS retention
FROM su
JOIN act USING (user_id)
JOIN coh USING (cw)
WHERE act.aw >= su.cw
GROUP BY su.cw, act.aw
ORDER BY cohort_week, weeks_since
"""

# Q134 — clamped ledger ----------------------------------------------
# The clamped recurrence is non-associative, so no window computes it;
# DuckDB expresses the SAME fold exactly with list lambdas: per user,
# the ordered delta list is prefix-folded through
# greatest(0, least(500, acc + x)) — identical float64 op sequence to
# the Spark-side Arrow scan, so the hashes must agree bitwise. The
# prefix-transform is O(n^2) per user, fine at oracle scale (sf0.01).

ORACLES["q134"] = """
WITH tx AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         event_id,
         CASE WHEN event_type = 'purchase' THEN value ELSE -value END AS delta
  FROM events
  WHERE event_type IN ('purchase', 'error')
), g AS (
  SELECT user_id, list(delta ORDER BY ep, event_id) AS ds
  FROM tx GROUP BY user_id
), f AS (
  SELECT user_id, ds,
         list_transform(
           range(1, len(ds) + 1),
           i -> list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE), ds[1:i]),
                  (acc, x) -> greatest(CAST(0.0 AS DOUBLE),
                                       least(CAST(500.0 AS DOUBLE), acc + x))
                )
         ) AS bal
  FROM g
)
SELECT user_id,
       CAST(len(ds) AS BIGINT) AS n_tx,
       bal[-1] AS closing_balance,
       list_min(bal) AS min_balance,
       list_max(bal) AS max_balance
FROM f
ORDER BY user_id
"""

# Q135 — reciprocal rank fusion --------------------------------------
# Both ranks are row_number under total orders; the fused score is
# two fixed IEEE divisions ranked exactly, rounded only for output.

ORACLES["q135"] = """
WITH e AS (
  SELECT event_type, user_id, CAST(value AS DECIMAL(12,2)) AS v,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
), u AS (
  SELECT event_type, user_id, SUM(v) AS tv, MAX(ep) AS last_ep
  FROM e GROUP BY event_type, user_id
), r AS (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY tv DESC, user_id ASC) AS r_value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY last_ep DESC, user_id ASC) AS r_recency
  FROM u
), f AS (
  SELECT event_type, user_id, r_value, r_recency,
         1.0 / (60.0 + CAST(r_value AS DOUBLE))
         + 1.0 / (60.0 + CAST(r_recency AS DOUBLE)) AS rrf
  FROM r
), t AS (
  SELECT event_type, user_id, r_value, r_recency, rrf,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY rrf DESC, user_id ASC) AS rn
  FROM f
)
SELECT event_type,
       CAST(rn AS BIGINT) AS rnk,
       user_id,
       CAST(r_value AS BIGINT) AS r_value,
       CAST(r_recency AS BIGINT) AS r_recency,
       ROUND(rrf, 6) AS rrf
FROM t WHERE rn <= 5
ORDER BY event_type, rnk
"""

# Q136 — calibration / reliability bins ------------------------------

ORACLES["q136"] = """
SELECT CAST(least(9, floor(value / 100)) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       ROUND(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS purchase_rate,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_value
FROM events
GROUP BY 1
ORDER BY 1
"""

# Q137 — data-quality expectation suite ------------------------------
# One row per declared check; all counts exact integers. FK checks
# run at distinct-key grain, the scalable form.

ORACLES["q137"] = """
WITH checks AS (
  SELECT 'unique_o_orderkey' AS check_id, 'orders' AS table_name,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_bad
  FROM orders
  UNION ALL
  SELECT 'unique_c_custkey', 'customer',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'not_null_o_custkey', 'orders',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'range_l_discount_0_0.1', 'lineitem',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'range_l_quantity_pos', 'lineitem',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'nonneg_event_value', 'events',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'fk_lineitem_orders', 'lineitem',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT)
  FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'fk_orders_customer', 'orders',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT)
  FROM (SELECT DISTINCT o_custkey FROM orders) o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
)
SELECT check_id, table_name, n_total, n_bad,
       CAST(CASE WHEN n_bad = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
FROM checks
ORDER BY check_id
"""

# Q138 — BM25-shaped lexical top-k ------------------------------------
# Pre-log Robertson idf (ln is libm-dependent — q138 docstring), fixed
# three-slot pivot sum, every float op written in the SAME infix order
# as the Spark expression tree so the hash is a bitwise check.

ORACLES["q138"] = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS toks
  FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d
), st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
         CAST(SUM(dl) AS DOUBLE) AS sumdl
  FROM dl
), e AS (
  SELECT doc_id, unnest(toks) AS tok FROM d
), e3 AS (
  SELECT doc_id, tok FROM e WHERE tok IN ('dup', 'hash', 'window')
), dft AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS dfd
  FROM (SELECT DISTINCT doc_id, tok FROM e3) GROUP BY tok
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tfd
  FROM e3 GROUP BY doc_id, tok
), w AS (
  SELECT tf.doc_id, tf.tok,
         (((st.nd - dft.dfd) + 0.5) / (dft.dfd + 0.5))
         * ((tf.tfd * 2.2) /
            (tf.tfd + 1.2 * (0.25 + 0.75 *
              (CAST(dl.dl AS DOUBLE) / (st.sumdl / st.nd))))) AS w
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dft USING (tok)
  CROSS JOIN st
), scored AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         MAX(CASE WHEN tok = 'dup' THEN w END) AS s_dup,
         MAX(CASE WHEN tok = 'hash' THEN w END) AS s_hash,
         MAX(CASE WHEN tok = 'window' THEN w END) AS s_window
  FROM w GROUP BY doc_id
)
SELECT doc_id, n_terms,
       ROUND((COALESCE(s_dup, 0.0) + COALESCE(s_hash, 0.0))
             + COALESCE(s_window, 0.0), 6) AS score
FROM scored
ORDER BY (COALESCE(s_dup, 0.0) + COALESCE(s_hash, 0.0))
         + COALESCE(s_window, 0.0) DESC, doc_id ASC
LIMIT 20
"""

# Q139 — n-gram diversity per source ----------------------------------
# Totals via the length formula (no explode); distincts via list-
# comprehension n-grams; space-split tokenization matches the Spark
# side exactly. One division, rounded at 6.

ORACLES["q139"] = """
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), lens AS (
  SELECT source, len(toks) AS l FROM d
), ns AS (
  SELECT unnest([1, 2, 3]) AS n
), tot AS (
  SELECT source, n,
         CAST(SUM(greatest(0, l - (n - 1))) AS BIGINT) AS total_ngrams
  FROM lens CROSS JOIN ns GROUP BY source, n
), grams AS (
  SELECT DISTINCT source, n, g
  FROM (
    SELECT d.source, ns.n,
           unnest(list_transform(
             range(1, len(toks) - (ns.n - 1) + 1),
             i -> array_to_string(toks[i:i+ns.n-1], ' ')
           )) AS g
    FROM d CROSS JOIN ns
  )
), dis AS (
  SELECT source, n, CAST(COUNT(*) AS BIGINT) AS distinct_ngrams
  FROM grams GROUP BY source, n
)
SELECT source, CAST(n AS INT) AS n, total_ngrams, distinct_ngrams,
       ROUND(CAST(distinct_ngrams AS DOUBLE)
             / CAST(total_ngrams AS DOUBLE), 6) AS diversity
FROM tot JOIN dis USING (source, n)
ORDER BY source, n
"""

# Q140 — two-sample Kolmogorov–Smirnov --------------------------------
# Integer-cents values (the o_totalprice ROUND(price*100) convention),
# exact integer cumulative counts, one division per ECDF value, sqrt
# is IEEE correctly-rounded in both engines (q116/q131 precedent).

ORACLES["q140"] = """
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
), g AS (
  SELECT v, SUM(isa) AS d1, SUM(1 - isa) AS d2 FROM v GROUP BY v
), cum AS (
  SELECT v,
         SUM(d1) OVER (ORDER BY v) AS c1,
         SUM(d2) OVER (ORDER BY v) AS c2
  FROM g
), nn AS (
  SELECT CAST(SUM(d1) AS DOUBLE) AS n1, CAST(SUM(d2) AS DOUBLE) AS n2
  FROM g
), d AS (
  SELECT MAX(abs(CAST(c1 AS DOUBLE) / nn.n1
                 - CAST(c2 AS DOUBLE) / nn.n2)) AS _d,
         MAX(nn.n1) AS _n1, MAX(nn.n2) AS _n2
  FROM cum CROSS JOIN nn
)
SELECT CAST(_n1 AS BIGINT) AS n1,
       CAST(_n2 AS BIGINT) AS n2,
       ROUND(_d, 6) AS d_stat,
       CAST(_d > 1.358 * sqrt((_n1 + _n2) / (_n1 * _n2)) AS INT)
         AS reject_05
FROM d
"""

# Q141 — token-frequency Gini per source ------------------------------
# Ranked ascending under the (f, tok) total order; numerator and
# denominator exact integers, one division, rounded at 6.

ORACLES["q141"] = """
WITH e AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
), freq AS (
  SELECT source, tok, COUNT(*) AS f FROM e GROUP BY source, tok
), r AS (
  SELECT source, f,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY f ASC, tok ASC)
           AS i
  FROM freq
), m AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(f) AS BIGINT) AS total_tokens,
         CAST(SUM(i * f) AS BIGINT) AS _sif
  FROM r GROUP BY source
)
SELECT source, n_tokens, total_tokens,
       ROUND(CAST(2 * _sif - (n_tokens + 1) * total_tokens AS DOUBLE)
             / CAST(n_tokens * total_tokens AS DOUBLE), 6) AS gini
FROM m
ORDER BY source
"""

# Q142 — EWMA signal (q134's list-lambda fold technique) ---------------
# Same float64 op order as the Arrow scan: s = 0.25*x + 0.75*s with
# s_1 = x_1 (list_reduce's first element IS the init), prefix folds
# for the series min/max — O(n^2) per user, fine at oracle scale.

ORACLES["q142"] = """
WITH tx AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         event_id,
         CAST(value AS DOUBLE) AS x
  FROM events
  WHERE event_type = 'purchase'
), g AS (
  SELECT user_id, list(x ORDER BY ep, event_id) AS xs
  FROM tx GROUP BY user_id
), f AS (
  SELECT user_id, xs,
         list_transform(
           range(1, len(xs) + 1),
           i -> list_reduce(
                  xs[1:i],
                  (s, x) -> 0.25 * x + 0.75 * s
                )
         ) AS sm
  FROM g
)
SELECT user_id,
       CAST(len(xs) AS BIGINT) AS n_obs,
       sm[-1] AS closing_ewma,
       list_min(sm) AS min_ewma,
       list_max(sm) AS max_ewma
FROM f
ORDER BY user_id
"""

# Q143 — chi-squared independence (categorical drift) ------------------
# Integer-cleared per-cell form (O*N - rt*ct)^2 / (N*rt*ct): exact
# DECIMAL(38,0) numerator, one double division, ROUND(.,6); headline
# chi2 = exact DECIMAL sum of the rounded fragments (order-free).

ORACLES["q143"] = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS observed
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
), rt AS (
  SELECT c_mktsegment, SUM(observed) AS rt FROM cells GROUP BY c_mktsegment
), ct AS (
  SELECT o_orderpriority, SUM(observed) AS ct
  FROM cells GROUP BY o_orderpriority
), n AS (
  SELECT SUM(observed) AS n FROM cells
), j AS (
  SELECT cells.c_mktsegment, cells.o_orderpriority, observed, rt, ct, n
  FROM cells JOIN rt USING (c_mktsegment) JOIN ct USING (o_orderpriority)
  CROSS JOIN n
), f AS (
  SELECT c_mktsegment, o_orderpriority, observed,
         ROUND(CAST(CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0))
                    AS DOUBLE) / CAST(n AS DOUBLE), 4) AS expected,
         CAST(ROUND(
           CAST((CAST(observed AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                 - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                * (CAST(observed AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                   - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                AS DOUBLE)
           / CAST(CAST(n AS DECIMAL(38,0)) * CAST(rt AS DECIMAL(38,0))
                  * CAST(ct AS DECIMAL(38,0)) AS DOUBLE),
           6) AS DECIMAL(18,6)) AS _frag
  FROM j
)
SELECT c_mktsegment, o_orderpriority, observed, expected,
       CAST(_frag AS DOUBLE) AS contrib,
       CAST(SUM(_frag) OVER () AS DOUBLE) AS chi2
FROM f
ORDER BY c_mktsegment, o_orderpriority
"""

# Q144 — pairwise source total-variation distance + vocab Jaccard ----
# Exact rational arithmetic: |p_a - p_b| cleared to integer
# numerators, DECIMAL(38,0) sums, ONE division per pair (rule 1's
# spirit — nothing float accumulates).

ORACLES["q144"] = """
WITH e AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
), freq AS (
  SELECT source, tok, COUNT(*) AS f FROM e GROUP BY source, tok
), tot AS (
  SELECT source, SUM(f) AS n, COUNT(*) AS v FROM freq GROUP BY source
), ft AS (
  SELECT freq.source, tok, f, n, v FROM freq JOIN tot USING (source)
), g AS (
  SELECT a.source AS sa, b.source AS sb,
         a.n AS na, b.n AS nb, a.v AS va, b.v AS vb,
         COUNT(*) AS shared_vocab,
         SUM(ABS(CAST(a.f AS DECIMAL(38,0)) * CAST(b.n AS DECIMAL(38,0))
                 - CAST(b.f AS DECIMAL(38,0)) * CAST(a.n AS DECIMAL(38,0))))
           AS s,
         SUM(a.f) AS ia, SUM(b.f) AS ib
  FROM ft a JOIN ft b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source, a.n, b.n, a.v, b.v
)
SELECT sa AS source_a, sb AS source_b, shared_vocab,
       va AS vocab_a, vb AS vocab_b,
       ROUND(CAST(shared_vocab AS DOUBLE)
             / CAST(va + vb - shared_vocab AS DOUBLE), 6) AS jaccard,
       ROUND(CAST(s + CAST(na - ia AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))
                    + CAST(nb - ib AS DECIMAL(38,0)) * CAST(na AS DECIMAL(38,0))
                  AS DOUBLE)
             / CAST(CAST(2 AS DECIMAL(38,0)) * CAST(na AS DECIMAL(38,0))
                    * CAST(nb AS DECIMAL(38,0)) AS DOUBLE), 6) AS tvd
FROM g
ORDER BY source_a, source_b
"""

# Q145 — Mann-Whitney U rank-sum test, tie-corrected -----------------
# Doubled mid-ranks keep every rank sum BIGINT-exact; z costs one
# subtraction, three divisions and one sqrt in the same written
# order as the Spark side.

ORACLES["q145"] = """
WITH c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
), c2 AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
), v AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN o_custkey IN (SELECT c_custkey FROM c)
              THEN 1 ELSE 0 END AS isa
  FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM c)
     OR o_custkey IN (SELECT c_custkey FROM c2)
), g AS (
  SELECT v, SUM(isa) AS d1, SUM(1 - isa) AS d2, COUNT(*) AS t
  FROM v GROUP BY v
), r AS (
  SELECT d1, d2, t,
         COALESCE(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM g
), m AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2,
         -- operands promoted to DECIMAL(19,0) so DuckDB takes the
         -- HUGEINT path (round-14 overflow audit, §2.6 rule 6): the
         -- int64 fast path wraps t^3 past t ≈ 2.09e6 ties and
         -- d1·2·prefix past N ≈ 2.1e9 rows; values identical. The
         -- sums stay DECIMAL(38,0) into the output — a BIGINT cast
         -- here would reimpose the int64 bound at the boundary
         -- (round-14 review find; Spark pins the same type).
         CAST(SUM(CAST(d1 AS DECIMAL(19,0)) * (2 * prefix + t + 1))
              AS DECIMAL(38,0)) AS ra2,
         CAST(SUM(CAST(t AS DECIMAL(19,0)) * t * t - t)
              AS DECIMAL(38,0)) AS tie_term
  FROM r
)
SELECT n1, n2,
       CAST(ra2 - CAST(n1 AS DECIMAL(19,0)) * (n1 + 1) AS DOUBLE)
         / 2.0 AS u1,
       tie_term,
       -- raw IEEE quotient, no ROUND: §2.6 rule 8 (identical exact
       -- operands + fixed op order => bit-identical double in both
       -- engines; a ROUND(double, 6) only adds a repr degree of
       -- freedom — the r16 driver red row motivated dropping it)
       ((CAST(ra2 - CAST(n1 AS DECIMAL(19,0)) * (n1 + 1) AS DOUBLE)
         - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 2.0)
       / SQRT((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
              * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                 - CAST(tie_term AS DOUBLE)
                   / (CAST(n1 + n2 AS DOUBLE)
                      * (CAST(n1 + n2 AS DOUBLE) - 1.0)))) AS z,
       CASE WHEN ABS(
         ((CAST(ra2 - CAST(n1 AS DECIMAL(19,0)) * (n1 + 1) AS DOUBLE)
           - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 2.0)
         / SQRT((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                   - CAST(tie_term AS DOUBLE)
                     / (CAST(n1 + n2 AS DOUBLE)
                        * (CAST(n1 + n2 AS DOUBLE) - 1.0))))
       ) > 1.959963984540054 THEN 1 ELSE 0 END AS reject_05
FROM m
"""

# Q146 — eval-vs-train shingle containment (decontamination) ---------
# Trigram shingles via the q95 slice technique; distinct sets; exact
# integer counts, one division.

ORACLES["q146"] = r"""
WITH tr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS rawt
  FROM documents
), sets AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(rawt) - 1),
           i -> array_to_string(rawt[i : i + 2], ' '))) AS gs
  FROM tr WHERE len(rawt) >= 3
), train AS (
  SELECT DISTINCT unnest(gs) AS g FROM sets WHERE doc_id % 10 <> 0
), ev AS (
  SELECT doc_id, unnest(gs) AS g FROM sets WHERE doc_id % 10 = 0
), m AS (
  SELECT ev.doc_id,
         COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN train.g IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_contained
  FROM ev LEFT JOIN train ON ev.g = train.g
  GROUP BY ev.doc_id
)
SELECT doc_id, n_shingles, n_contained,
       ROUND(CAST(n_contained AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
         AS containment,
       CASE WHEN CAST(n_contained AS DOUBLE) / CAST(n_shingles AS DOUBLE)
                 >= 0.5 THEN 1 ELSE 0 END AS contaminated
FROM m
ORDER BY doc_id
"""

# Q147 — multi-source BFS hop distance, 4 hops -----------------------
# Recursive CTE enumerates every <=4-hop path (bounded: out-degree
# <= 2) and takes MIN(hop) per node — the oracle-side formulation of
# the engine's frontier BFS.

ORACLES["q147"] = """
WITH RECURSIVE nn AS (
  SELECT COUNT(*) AS n FROM documents
), edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, doc_id // 3 AS dst
    FROM documents WHERE doc_id > 0
    UNION ALL
    SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
    FROM documents
  )
), r(id, hop) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
  UNION ALL
  SELECT e.dst, r.hop + 1
  FROM r JOIN edges e ON e.src = r.id
  WHERE r.hop < 4
)
SELECT id, CAST(MIN(hop) AS INT) AS dist
FROM r
GROUP BY id
ORDER BY id
"""

# Q148 — Benford first-digit chi-squared per priority ----------------
# First digit from integer cents (exact int-to-string); Benford
# probabilities as shared 17-digit double literals; decimal-fragment
# chi-squared (the q143 convention); zero cells scaffolded.

ORACLES["q148"] = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
), obs AS (
  SELECT o_orderpriority, digit, COUNT(*) AS observed
  FROM o GROUP BY o_orderpriority, digit
), scaffold AS (
  SELECT p.o_orderpriority, d.digit
  FROM (SELECT DISTINCT o_orderpriority FROM o) p
  CROSS JOIN (SELECT unnest(range(1, 10)) AS digit) d
), cells AS (
  SELECT s.o_orderpriority, CAST(s.digit AS INT) AS digit,
         COALESCE(obs.observed, 0) AS observed
  FROM scaffold s
  LEFT JOIN obs ON s.o_orderpriority = obs.o_orderpriority
              AND s.digit = obs.digit
), tot AS (
  SELECT o_orderpriority, SUM(observed) AS nt
  FROM cells GROUP BY o_orderpriority
), f AS (
  SELECT c.o_orderpriority, c.digit, c.observed,
         CAST(t.nt AS DOUBLE) * ([
           0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
           0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
           0.05799194697768673, 0.05115252244738129, 0.04575749056067514
         ][c.digit]) AS expected
  FROM cells c JOIN tot t USING (o_orderpriority)
), frags AS (
  SELECT o_orderpriority, digit, observed,
         ROUND(expected, 4) AS expected,
         CAST(ROUND((CAST(observed AS DOUBLE) - expected)
                    * (CAST(observed AS DOUBLE) - expected) / expected, 6)
              AS DECIMAL(18,6)) AS _frag
  FROM f
)
SELECT o_orderpriority, digit, observed, expected,
       CAST(_frag AS DOUBLE) AS contrib,
       CAST(SUM(_frag) OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS chi2
FROM frags
ORDER BY o_orderpriority, digit
"""

# Q149 — golden-record survivorship (max-of-struct per field) ---------
# Struct comparison is lexicographic in both engines; (ep, event_id)
# is a total order, so every CASE-guarded max picks one exact row.

ORACLES["q149"] = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         CAST(event_id AS BIGINT) AS event_id,
         event_type,
         CAST(value AS DECIMAL(12,2)) AS v,
         CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       MIN(ep) AS first_seen,
       MAX(ep) AS last_seen,
       (MIN(struct_pack(ep := ep, event_id := event_id,
                        event_type := event_type))).event_type
         AS first_event_type,
       (MAX(struct_pack(ep := ep, event_id := event_id,
                        event_type := event_type))).event_type
         AS last_event_type,
       CAST((MAX(CASE WHEN event_type = 'purchase'
                 THEN struct_pack(ep := ep, event_id := event_id, v := v)
            END)).v AS DOUBLE) AS last_purchase_value,
       (MAX(CASE WHEN k >= 50
            THEN struct_pack(ep := ep, event_id := event_id, k := k)
        END)).k AS last_big_k
FROM e
GROUP BY user_id
ORDER BY user_id
"""

# Q150 — quantile normalization across sources ------------------------
# The oracle uses plain global windows (correctness only); the Spark
# side decomposes the same ranks scale-safely. ceil(r*N/m) is the
# shared integer expression (r*N + m - 1) // m.

ORACLES["q150"] = """
WITH d AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars FROM documents
), r AS (
  SELECT doc_id, source, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n_chars, doc_id) AS BIGINT)
           AS src_rank,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS m,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_total
  FROM d
), p AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS pooled_rank,
         n_chars AS norm_chars
  FROM d
)
SELECT r.doc_id, r.source, r.n_chars, r.src_rank, p.norm_chars
FROM r JOIN p ON (r.src_rank * r.n_total + r.m - 1) // r.m = p.pooled_rank
ORDER BY r.doc_id
"""

# Q151 — positional phrase search ("table hash", overlap-correct) -----

ORACLES["q151"] = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
), post AS (
  SELECT doc_id, i, l[i] AS tok
  FROM t, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) u
), m AS (
  SELECT p0.doc_id, p0.i
  FROM post p0
  JOIN post p1 ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1
  WHERE p0.tok = 'table' AND p1.tok = 'hash'
)
SELECT doc_id,
       COUNT(*) AS n_matches,
       CAST(MIN(i) - 1 AS BIGINT) AS first_pos
FROM m
GROUP BY doc_id
ORDER BY doc_id
"""

# Q152 — Cohen's kappa per source (q93's langid vs the lang label) ----
# Confusion cells / marginals / pe_num exact BIGINT; po, pe, kappa are
# the same IEEE expressions in the same operand order as the Spark
# side (no rounding needed — q131's convention).

ORACLES["q152"] = r"""
WITH t AS (
  SELECT doc_id, source, lang,
         list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, source, lang,
         CAST(len(list_filter(toks, x -> list_contains(
             ['the','a','of','and','to','in','is','it','that','for'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_en,
         CAST(len(list_filter(toks, x -> list_contains(
             ['el','la','de','y','que','en','un','es','se','no'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_es,
         CAST(len(list_filter(toks, x -> list_contains(
             ['le','la','de','et','que','en','un','est','se','ne'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_fr,
         CAST(len(list_filter(toks, x -> list_contains(
             ['der','die','das','und','zu','in','ist','es','den','nicht'],
             lower(x)))) AS DOUBLE)
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS score_de
  FROM t
), p AS (
  SELECT source, lang,
         CASE
           WHEN greatest(score_en, score_es, score_fr, score_de) <= 0
             THEN 'unknown'
           WHEN score_de = greatest(score_en, score_es, score_fr, score_de)
             THEN 'de'
           WHEN score_en = greatest(score_en, score_es, score_fr, score_de)
             THEN 'en'
           WHEN score_es = greatest(score_en, score_es, score_fr, score_de)
             THEN 'es'
           ELSE 'fr'
         END AS pred_lang
  FROM s
), cells AS (
  SELECT source, lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM p GROUP BY source, lang, pred_lang
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY source
), agree AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS agree_n
  FROM cells WHERE lang = pred_lang GROUP BY source
), rm AS (
  SELECT source, lang, CAST(SUM(c) AS BIGINT) AS rm
  FROM cells GROUP BY source, lang
), cm AS (
  SELECT source, pred_lang, CAST(SUM(c) AS BIGINT) AS cm
  FROM cells GROUP BY source, pred_lang
), pe_num AS (
  SELECT rm.source, CAST(SUM(rm.rm * cm.cm) AS BIGINT) AS pe_num
  FROM rm JOIN cm ON rm.source = cm.source AND rm.lang = cm.pred_lang
  GROUP BY rm.source
), j AS (
  SELECT t.source, t.n,
         CAST(COALESCE(a.agree_n, 0) AS BIGINT) AS agree_n,
         CAST(COALESCE(pn.pe_num, 0) AS BIGINT) AS pe_num
  FROM tot t
  LEFT JOIN agree a ON t.source = a.source
  LEFT JOIN pe_num pn ON t.source = pn.source
)
SELECT source, n, agree_n,
       CAST(agree_n AS DOUBLE) / CAST(n AS DOUBLE) AS po,
       CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
       CASE WHEN CAST(pe_num AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) >= 1.0
            THEN NULL
            ELSE (CAST(agree_n AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(pe_num AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 / (1.0 - CAST(pe_num AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       END AS kappa
FROM j
ORDER BY source
"""

# Q153 — Wilson 95% score intervals per event type --------------------
# z enters as the shared 1.96 literal CAST to DOUBLE (DuckDB parses a
# bare 1.96 as DECIMAL and would square it EXACTLY; Spark squares the
# double), z^2 as the in-engine double product;
# sqrt is IEEE-correctly-rounded in both engines.

ORACLES["q153"] = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS successes
  FROM events
  GROUP BY event_type
)
SELECT event_type, n, successes,
       CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
       ((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
         + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE) / 2.0)
        / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE)))
       - (CAST(1.96 AS DOUBLE) * sqrt(
            CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
            * (1.0 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE))
            / CAST(n AS DOUBLE)
            + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE)
              / (4.0 * CAST(n AS DOUBLE)))
          / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE)))
         AS wilson_lo,
       ((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
         + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE) / 2.0)
        / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE)))
       + (CAST(1.96 AS DOUBLE) * sqrt(
            CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
            * (1.0 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE))
            / CAST(n AS DOUBLE)
            + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE)
              / (4.0 * CAST(n AS DOUBLE)))
          / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / CAST(n AS DOUBLE)))
         AS wilson_hi
FROM g
ORDER BY event_type
"""

# Q154 — Herfindahl-Hirschman concentration per region ----------------
# Revenue in exact DECIMAL; share^2 fragments ROUND(.,12) into
# DECIMAL(18,12) and summed exactly (q148's convention).

ORACLES["q154"] = """
WITH rev AS (
  SELECT r.r_name, n.n_name,
         SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS _rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
), w AS (
  SELECT r_name, n_name,
         CAST(ROUND(_rev, 2) AS DOUBLE) AS revenue,
         CAST(_rev AS DOUBLE)
           / CAST(SUM(_rev) OVER (PARTITION BY r_name) AS DOUBLE) AS share
  FROM rev
), f AS (
  SELECT r_name, n_name, revenue, share,
         CAST(ROUND(share * share, 12) AS DECIMAL(18,12)) AS _frag
  FROM w
)
SELECT r_name, n_name, revenue, share,
       CAST(SUM(_frag) OVER (PARTITION BY r_name) AS DOUBLE) AS hhi,
       1.0 / CAST(SUM(_frag) OVER (PARTITION BY r_name) AS DOUBLE)
         AS effective_n
FROM f
ORDER BY r_name, n_name
"""

# Q155 — Gini best-split over fixed thresholds ------------------------
# Bucket-prefix construction (no fact fanout); impurity from exact
# BIGINTs in one fixed IEEE expression, ROUND 6 DECIMAL for ranking.

ORACLES["q155"] = """
WITH e AS (
  SELECT CAST(least(19, floor(value / 25)) AS BIGINT) AS bucket,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), b AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(pos) AS BIGINT) AS p
  FROM e GROUP BY bucket
), pre AS (
  SELECT bucket,
         CAST(SUM(c) OVER (ORDER BY bucket) AS BIGINT) AS n_left,
         CAST(SUM(p) OVER (ORDER BY bucket) AS BIGINT) AS pos_left,
         CAST(SUM(c) OVER () AS BIGINT) AS n_all,
         CAST(SUM(p) OVER () AS BIGINT) AS pos_all
  FROM b
), scored AS (
  SELECT CAST((bucket + 1) * 25 AS BIGINT) AS threshold,
         n_left, pos_left,
         n_all - n_left AS n_right,
         pos_all - pos_left AS pos_right,
         CAST(ROUND(
           (CASE WHEN n_left > 0
                 THEN (CAST(n_left AS DOUBLE) / CAST(n_all AS DOUBLE))
                      * (2.0 * (CAST(pos_left AS DOUBLE)
                                / CAST(n_left AS DOUBLE))
                             * (1.0 - CAST(pos_left AS DOUBLE)
                                      / CAST(n_left AS DOUBLE)))
                 ELSE 0.0 END)
           + (CASE WHEN n_all - n_left > 0
                   THEN (CAST(n_all - n_left AS DOUBLE)
                         / CAST(n_all AS DOUBLE))
                        * (2.0 * (CAST(pos_all - pos_left AS DOUBLE)
                                  / CAST(n_all - n_left AS DOUBLE))
                               * (1.0 - CAST(pos_all - pos_left AS DOUBLE)
                                        / CAST(n_all - n_left AS DOUBLE)))
                   ELSE 0.0 END), 6) AS DECIMAL(18,6)) AS _imp
  FROM pre
  WHERE bucket < 19
)
SELECT threshold, n_left, pos_left, n_right, pos_right,
       CAST(_imp AS DOUBLE) AS weighted_gini,
       CAST(ROW_NUMBER() OVER (ORDER BY _imp ASC, threshold ASC) AS BIGINT)
         AS rank
FROM scored
ORDER BY threshold
"""

# Q156 — k-anonymity + l-diversity audit ------------------------------

ORACLES["q156"] = """
WITH c AS (
  SELECT c_mktsegment, c_nationkey,
         CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS in_debt
  FROM customer
), g AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT in_debt) AS BIGINT) AS l_diversity
  FROM c GROUP BY c_mktsegment, c_nationkey
), o AS (
  SELECT g.c_mktsegment AS segment, nn.n_name AS nation, g.n,
         g.l_diversity,
         CASE WHEN g.n < 5 THEN 1 ELSE 0 END AS at_risk
  FROM g JOIN nation nn ON g.c_nationkey = nn.n_nationkey
)
SELECT segment, nation, n, l_diversity, at_risk,
       CAST(SUM(CAST(at_risk AS BIGINT) * n) OVER () AS DOUBLE)
         / CAST(SUM(n) OVER () AS DOUBLE) AS risk_share
FROM o
ORDER BY segment, nation
"""

# Q157 — Fano-factor burstiness per user ------------------------------

ORACLES["q157"] = """
WITH e AS (
  SELECT user_id,
         CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)
           AS day
  FROM events
), dc AS (
  SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS x
  FROM e GROUP BY user_id, day
), g AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS n_events,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM dc GROUP BY user_id
)
SELECT user_id, n_days, n_events,
       ROUND(CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         AS mean_daily,
       ROUND(CASE WHEN n_days > 1
             THEN (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
                  / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))
             ELSE NULL END, 6) AS var_daily,
       ROUND((CASE WHEN n_days > 1
              THEN (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
                   / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))
              ELSE NULL END)
             / (CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
         AS fano
FROM g
ORDER BY user_id
"""

# Q158 — lag-1..7 autocorrelation of daily order revenue --------------
# q89's exact-decimal power sums + fixed IEEE Pearson, lag fanout at
# DATE grain only. The product operands are promoted to DECIMAL(19,2)
# (round-13 sf0.1 sweep find): DuckDB multiplies two width-18
# decimals on the int64 fast path with a 10^18 bound, which a
# ~$15M-cents daily-revenue product exceeds at sf0.1; width 19 forces
# HUGEINT arithmetic and the exact DECIMAL(38,4) sum — identical
# values at every SF, Spark's decimal path unchanged.

ORACLES["q158"] = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(o_totalprice AS DECIMAL(12,2)) AS v
  FROM orders
), daily AS (
  SELECT day, CAST(SUM(v) AS DECIMAL(18,2)) AS s
  FROM o GROUP BY day
), lagged AS (
  SELECT d.day, d.s AS x, l.lag,
         d.day + CAST(l.lag AS INT) AS day_y
  FROM daily d
  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
), j AS (
  SELECT lg.lag, lg.x, d2.s AS y
  FROM lagged lg JOIN daily d2 ON lg.day_y = d2.day
), st AS (
  SELECT lag, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS DECIMAL(19,2)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(19,2)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(19,2)) * y) AS syy
  FROM j GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS autocorr
FROM st
ORDER BY lag
"""

# Q159 — winsorized mean per return flag ------------------------------
# The [p05, p95] cut points restate ops/quantile's declared order
# statistic: smallest price with 20*cum >= num*tot over exact counts.

ORACLES["q159"] = """
WITH li AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS price
  FROM lineitem
), grain AS (
  SELECT l_returnflag, price, CAST(COUNT(*) AS BIGINT) AS w
  FROM li GROUP BY l_returnflag, price
), cum AS (
  SELECT l_returnflag, price, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS c,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM grain
), bounds AS (
  SELECT l_returnflag,
         MIN(CASE WHEN 20 * c >= 1 * tot THEN price END) AS lo,
         MIN(CASE WHEN 20 * c >= 19 * tot THEN price END) AS hi
  FROM cum GROUP BY l_returnflag
), cl AS (
  SELECT g.l_returnflag, g.w,
         least(greatest(g.price, b.lo), b.hi) AS cp,
         CASE WHEN g.price < b.lo THEN 1 ELSE 0 END AS is_lo,
         CASE WHEN g.price > b.hi THEN 1 ELSE 0 END AS is_hi,
         g.price, b.lo, b.hi
  FROM grain g JOIN bounds b USING (l_returnflag)
)
SELECT l_returnflag,
       CAST(SUM(w) AS BIGINT) AS n,
       CAST(MIN(lo) AS DOUBLE) AS p05,
       CAST(MIN(hi) AS DOUBLE) AS p95,
       CAST(SUM(is_lo * w) AS BIGINT) AS n_clipped_low,
       CAST(SUM(is_hi * w) AS BIGINT) AS n_clipped_high,
       ROUND(CAST(SUM(cp * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6)
         AS winsorized_mean,
       ROUND(CAST(SUM(price * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6)
         AS raw_mean
FROM cl
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# Q160 — key-space sampled join audit ---------------------------------
# The 1-in-8 bucket is the q67/q70 md5-prefix hash; both sides filter
# BEFORE the join so per-key structure survives the sample.

ORACLES["q160"] = """
WITH cs AS (
  SELECT c_custkey FROM customer
  WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) % 8 = 0
), os AS (
  SELECT o_custkey, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(12,2)) AS v
  FROM orders
  WHERE CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
             AS BIGINT) % 8 = 0
), sample AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_sample,
         ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS avg_value_est
  FROM os JOIN cs ON os.o_custkey = cs.c_custkey
  GROUP BY o_orderpriority
), full_j AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_exact,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS avg_value_exact
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o_orderpriority
)
SELECT f.o_orderpriority,
       CAST(COALESCE(s.n_sample, 0) AS BIGINT) AS n_sample,
       CAST(COALESCE(s.n_sample, 0) * 8 AS BIGINT) AS n_est,
       f.n_exact,
       s.avg_value_est,
       f.avg_value_exact,
       ROUND(CAST(COALESCE(s.n_sample, 0) * 8 AS DOUBLE)
             / CAST(f.n_exact AS DOUBLE), 6) AS count_ratio
FROM full_j f LEFT JOIN sample s USING (o_orderpriority)
ORDER BY f.o_orderpriority
"""

# Q161 — naive-seasonal (lag-7) forecast backtest ----------------------
# Daily revenue exact DECIMAL(18,2); APE fragments ROUND(.,9) into
# DECIMAL(18,9), per-dow MAPE as their EXACT decimal mean (q148
# convention). dow from integer epoch-day arithmetic, no calendar fns.

ORACLES["q161"] = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(o_totalprice AS DECIMAL(12,2)) AS v
  FROM orders
), daily AS (
  SELECT day, CAST(SUM(v) AS DECIMAL(18,2)) AS s
  FROM o GROUP BY day
), j AS (
  SELECT c.day, c.s AS actual, f.s AS fc
  FROM daily c JOIN daily f ON f.day = c.day - 7
), e AS (
  SELECT CAST((datediff('day', DATE '1970-01-01', day) + 4) % 7 AS INT)
           AS dow,
         actual - fc AS err,
         CAST(ROUND(CAST(abs(actual - fc) AS DOUBLE)
                    / CAST(actual AS DOUBLE), 9) AS DECIMAL(18,9)) AS _ape
  FROM j
)
SELECT dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(_ape) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mape,
       ROUND(CAST(SUM(err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_bias
FROM e
GROUP BY dow
ORDER BY dow
"""

# Q162 — Bayesian m-estimate smoothed ranking --------------------------

ORACLES["q162"] = """
WITH base AS (
  SELECT p.p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o.o_totalprice > 200000.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS hits
  FROM lineitem li
  JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN part p ON li.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), w AS (
  SELECT p_brand, n, hits,
         CAST(SUM(hits) OVER () AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
           AS prior
  FROM base
), sc AS (
  SELECT p_brand, n, hits, prior,
         (CAST(hits AS DOUBLE) + 25.0 * prior)
           / (CAST(n AS DOUBLE) + 25.0) AS _sm
  FROM w
)
SELECT p_brand, n, hits,
       ROUND(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
       ROUND(prior, 6) AS prior,
       ROUND(_sm, 6) AS smoothed_rate,
       CAST(ROW_NUMBER() OVER (ORDER BY _sm DESC, p_brand ASC) AS BIGINT)
         AS rank
FROM sc
ORDER BY p_brand
"""

# Q163 — RFM segmentation ----------------------------------------------
# Quintile boundaries restate ops/quantile's declared order statistic
# per metric (smallest value with 5*cum >= k*tot over user counts);
# score = 1 + boundaries strictly exceeded, recency flipped.

ORACLES["q163"] = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
  WHERE event_type = 'purchase'
), snap AS (
  SELECT MAX(ep) AS s FROM e
), rfm AS (
  SELECT user_id,
         CAST(floor((snap.s - MAX(e.ep)) / 86400.0) AS BIGINT)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(ROUND(SUM(v), 2) AS DOUBLE) AS monetary
  FROM e, snap
  GROUP BY user_id, snap.s
), metric AS (
  SELECT 'r' AS metric, CAST(recency_days AS DOUBLE) AS val,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM rfm GROUP BY val
  UNION ALL
  SELECT 'f', CAST(frequency AS DOUBLE), CAST(COUNT(*) AS BIGINT)
  FROM rfm GROUP BY 2
  UNION ALL
  SELECT 'm', monetary, CAST(COUNT(*) AS BIGINT)
  FROM rfm GROUP BY 2
), cum AS (
  SELECT metric, val, w,
         SUM(w) OVER (PARTITION BY metric ORDER BY val) AS c,
         SUM(w) OVER (PARTITION BY metric) AS tot
  FROM metric
), b AS (
  SELECT metric,
         MIN(CASE WHEN 5 * c >= 1 * tot THEN val END) AS b1,
         MIN(CASE WHEN 5 * c >= 2 * tot THEN val END) AS b2,
         MIN(CASE WHEN 5 * c >= 3 * tot THEN val END) AS b3,
         MIN(CASE WHEN 5 * c >= 4 * tot THEN val END) AS b4
  FROM cum GROUP BY metric
), wb AS (
  SELECT
    MAX(CASE WHEN metric = 'r' THEN b1 END) AS r_b1,
    MAX(CASE WHEN metric = 'r' THEN b2 END) AS r_b2,
    MAX(CASE WHEN metric = 'r' THEN b3 END) AS r_b3,
    MAX(CASE WHEN metric = 'r' THEN b4 END) AS r_b4,
    MAX(CASE WHEN metric = 'f' THEN b1 END) AS f_b1,
    MAX(CASE WHEN metric = 'f' THEN b2 END) AS f_b2,
    MAX(CASE WHEN metric = 'f' THEN b3 END) AS f_b3,
    MAX(CASE WHEN metric = 'f' THEN b4 END) AS f_b4,
    MAX(CASE WHEN metric = 'm' THEN b1 END) AS m_b1,
    MAX(CASE WHEN metric = 'm' THEN b2 END) AS m_b2,
    MAX(CASE WHEN metric = 'm' THEN b3 END) AS m_b3,
    MAX(CASE WHEN metric = 'm' THEN b4 END) AS m_b4
  FROM b
), scored AS (
  SELECT r.user_id, r.recency_days, r.frequency, r.monetary,
         CAST(6 - (1
           + CASE WHEN CAST(r.recency_days AS DOUBLE) > wb.r_b1 THEN 1 ELSE 0 END
           + CASE WHEN CAST(r.recency_days AS DOUBLE) > wb.r_b2 THEN 1 ELSE 0 END
           + CASE WHEN CAST(r.recency_days AS DOUBLE) > wb.r_b3 THEN 1 ELSE 0 END
           + CASE WHEN CAST(r.recency_days AS DOUBLE) > wb.r_b4 THEN 1 ELSE 0 END)
           AS INT) AS r_score,
         CAST(1
           + CASE WHEN CAST(r.frequency AS DOUBLE) > wb.f_b1 THEN 1 ELSE 0 END
           + CASE WHEN CAST(r.frequency AS DOUBLE) > wb.f_b2 THEN 1 ELSE 0 END
           + CASE WHEN CAST(r.frequency AS DOUBLE) > wb.f_b3 THEN 1 ELSE 0 END
           + CASE WHEN CAST(r.frequency AS DOUBLE) > wb.f_b4 THEN 1 ELSE 0 END
           AS INT) AS f_score,
         CAST(1
           + CASE WHEN r.monetary > wb.m_b1 THEN 1 ELSE 0 END
           + CASE WHEN r.monetary > wb.m_b2 THEN 1 ELSE 0 END
           + CASE WHEN r.monetary > wb.m_b3 THEN 1 ELSE 0 END
           + CASE WHEN r.monetary > wb.m_b4 THEN 1 ELSE 0 END
           AS INT) AS m_score
  FROM rfm r, wb
)
SELECT user_id, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       CASE
         WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
         WHEN f_score >= 4 THEN 'loyal'
         WHEN m_score >= 4 THEN 'big_spender'
         WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
         WHEN r_score <= 2 THEN 'hibernating'
         ELSE 'casual'
       END AS segment
FROM scored
ORDER BY user_id
"""

# Q164 — weighted (multiset) Jaccard pairs -----------------------------
# Sum-max via inclusion-exclusion: len_a + len_b - sum_min; df <= 100
# cap mirrored (declared recall bound, the q88 contract).

ORACLES["q164"] = r"""
WITH d AS (
  SELECT doc_id, unnest(list_filter(
           regexp_split_to_array(text, '[\t\n\f\r ]+'), x -> x <> ''))
           AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM d GROUP BY doc_id, term
), lens AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY doc_id
), cap AS (
  SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= 100
), tfc AS (
  SELECT tf.* FROM tf JOIN cap USING (term)
), num AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(least(a.tf, b.tf)) AS BIGINT) AS shared_min
  FROM tfc a JOIN tfc b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT n.id_a, n.id_b, n.shared_min,
       la.len AS len_a, lb.len AS len_b,
       ROUND(CAST(n.shared_min AS DOUBLE)
             / CAST(la.len + lb.len - n.shared_min AS DOUBLE), 6)
         AS weighted_jaccard
FROM num n
JOIN lens la ON n.id_a = la.doc_id
JOIN lens lb ON n.id_b = lb.doc_id
ORDER BY weighted_jaccard DESC, id_a ASC, id_b ASC
LIMIT 20
"""

# ================================================================ round 10

# Q166 — Spearman rank correlation per returnflag ---------------------
# Tie-averaged ranks made integer by doubling (2*rank_min + ties - 1);
# exact decimal power sums; q89's shared IEEE finish.

ORACLES["q166"] = """
WITH r AS (
  SELECT l_returnflag AS g,
         CAST(2 * rank() OVER (PARTITION BY l_returnflag
                               ORDER BY l_quantity)
              + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
              - 1 AS BIGINT) AS rx,
         CAST(2 * rank() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice)
              + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
              - 1 AS BIGINT) AS ry
  FROM lineitem
), s AS (
  SELECT g, COUNT(*) AS n,
         SUM(CAST(rx AS DECIMAL(19,0))) AS sx,
         SUM(CAST(ry AS DECIMAL(19,0))) AS sy,
         SUM(CAST(rx AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0))) AS sxy,
         SUM(CAST(rx AS DECIMAL(19,0)) * CAST(rx AS DECIMAL(19,0))) AS sxx,
         SUM(CAST(ry AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0))) AS syy
  FROM r GROUP BY g
), d AS (
  SELECT g, n, CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         CAST(sxy AS DOUBLE) AS sxy,
         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy
  FROM s
)
SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
       ROUND((nd * sxy - sx * sy)
             / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 6)
         AS spearman_rho
FROM d
ORDER BY l_returnflag
"""

# Q167 — boilerplate shared-prefix clusters ---------------------------
# First-8-token prefix over the shared spelled-out whitespace class;
# exact counts, one division, total order before LIMIT.

ORACLES["q167"] = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS toks
  FROM documents
), p AS (
  SELECT doc_id, array_to_string(toks[1:8], ' ') AS prefix
  FROM t WHERE len(toks) >= 8
), tot AS (
  SELECT COUNT(*) AS n_eligible FROM p
), cl AS (
  SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(doc_id) AS keeper_doc
  FROM p GROUP BY prefix HAVING COUNT(*) >= 2
)
SELECT prefix, n_docs, keeper_doc,
       ROUND(CAST(n_docs AS DOUBLE)
             / CAST((SELECT n_eligible FROM tot) AS DOUBLE), 6)
         AS corpus_share
FROM cl
ORDER BY n_docs DESC, prefix
LIMIT 20
"""

# Q168 — shard-assignment balance audit -------------------------------
# MINSTD shard step in exact BIGINT (every intermediate < 1.04e14);
# deviations are one double division each off exact integer sums.

ORACLES["q168"] = r"""
WITH d AS (
  SELECT ((doc_id % 2147483647) * 48271 % 2147483647) % 32 AS shard,
         CAST(len(list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                              x -> x <> '')) AS BIGINT) AS ntok
  FROM documents
), per AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(ntok) AS BIGINT) AS n_tokens
  FROM d GROUP BY shard
), tot AS (
  SELECT SUM(n_docs) AS tot_docs, SUM(n_tokens) AS tot_toks FROM per
)
SELECT CAST(shard AS INTEGER) AS shard, n_docs, n_tokens,
       ROUND(CAST(n_docs AS DOUBLE) * 32.0
             / CAST(tot_docs AS DOUBLE) - 1.0, 6) AS doc_dev,
       ROUND(CAST(n_tokens AS DOUBLE) * 32.0
             / CAST(tot_toks AS DOUBLE) - 1.0, 6) AS tok_dev
FROM per CROSS JOIN tot
ORDER BY shard
"""

# Q169 — deterministic Poisson bootstrap CI ---------------------------
# MINSTD multiplier stream seeded by (orderkey, replicate); Poisson(1)
# CDF thresholds scaled to 2^31-1; replicate r=-1 is the point
# estimate; CI = order-statistic selection over 100 replicate means.

ORACLES["q169"] = """
WITH e AS (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         r.r AS r,
         (o_orderkey % 2147483647) * 48271 % 2147483647 AS s1
  FROM orders CROSS JOIN (SELECT unnest(range(-1, 100)) AS r) r
), wts AS (
  SELECT o_orderpriority, price, r,
         CAST(CASE WHEN r = -1 THEN 1
              WHEN u < 790015083 THEN 0
              WHEN u < 1580030167 THEN 1
              WHEN u < 1975037709 THEN 2
              WHEN u < 2106706890 THEN 3
              ELSE 4 END AS DECIMAL(3,0)) AS w
  FROM (SELECT *, (s1 + r * 40503) * 48271 % 2147483647 AS u FROM e)
), rep AS (
  SELECT o_orderpriority, r,
         COUNT(*) AS n_rows,
         CAST(SUM(w * price) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS m
  FROM wts GROUP BY o_orderpriority, r
), pt AS (
  SELECT o_orderpriority, CAST(n_rows AS BIGINT) AS n_orders,
         m AS mean_price
  FROM rep WHERE r = -1
), sel AS (
  SELECT o_orderpriority, m,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY m, r) AS rn
  FROM rep WHERE r >= 0
), ci AS (
  SELECT o_orderpriority,
         MIN(CASE WHEN rn = 3 THEN m END) AS lo,
         MIN(CASE WHEN rn = 98 THEN m END) AS hi
  FROM sel WHERE rn IN (3, 98) GROUP BY o_orderpriority
)
SELECT pt.o_orderpriority, pt.n_orders,
       ROUND(pt.mean_price, 6) AS mean_price,
       ROUND(ci.lo, 6) AS ci_lo,
       ROUND(ci.hi, 6) AS ci_hi
FROM pt JOIN ci USING (o_orderpriority)
ORDER BY o_orderpriority
"""

# Q170 — n-gram novelty curve by corpus position ----------------------
# Distinct trigram shingles per doc (q95's slice technique); first
# appearance = MIN(doc_id) per shingle; bucket rollup, one division.

ORACLES["q170"] = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[\t\n\f\r ]+'),
                     x -> x <> '') AS rawt
  FROM documents
), sets AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(rawt) - 1),
           i -> array_to_string(rawt[i : i + 2], ' '))) AS gs
  FROM t WHERE len(rawt) >= 3
), pairs AS (
  SELECT doc_id, unnest(gs) AS g FROM sets
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
  FROM pairs GROUP BY doc_id
), first AS (
  SELECT g, MIN(doc_id) AS min_doc FROM pairs GROUP BY g
), novel AS (
  SELECT min_doc, CAST(COUNT(*) AS BIGINT) AS n_novel
  FROM first GROUP BY min_doc
), j AS (
  SELECT p.doc_id, p.n_shingles,
         COALESCE(n.n_novel, CAST(0 AS BIGINT)) AS n_novel
  FROM per_doc p LEFT JOIN novel n ON p.doc_id = n.min_doc
)
SELECT doc_id // 50 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(n_novel) AS DOUBLE)
             / CAST(SUM(n_shingles) AS DOUBLE), 6) AS novelty
FROM j
GROUP BY doc_id // 50
ORDER BY bucket
"""

# Q171 — categorical association matrix -------------------------------
# One (type, k-decile, hour) cube; each pair's chi2 via the q143
# integer-cleared decimal-fragment form; V and T close with sqrt only.

ORACLES["q171"] = """
WITH e AS (
  SELECT event_type AS typ,
         CAST(least(9, CAST(json_extract_string(props, '$.k') AS INTEGER)
                        // 10) AS INTEGER) AS kdec,
         CAST(hour(ts) AS INTEGER) AS hr
  FROM events
  WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
), cube AS (
  SELECT typ, kdec, hr, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM e GROUP BY typ, kdec, hr
),
p1 AS (SELECT typ AS x, kdec AS y, SUM(cnt) AS o FROM cube GROUP BY 1, 2),
p2 AS (SELECT typ AS x, CAST(hr AS VARCHAR) AS y, SUM(cnt) AS o
       FROM cube GROUP BY 1, 2),
p3 AS (SELECT CAST(kdec AS VARCHAR) AS x, CAST(hr AS VARCHAR) AS y,
              SUM(cnt) AS o FROM cube GROUP BY 1, 2),
stats AS (
  SELECT 'type_x_kdecile' AS pair, * FROM (
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT x) AS INTEGER) AS r_levels,
           CAST(COUNT(DISTINCT y) AS INTEGER) AS c_levels,
           SUM(CAST(ROUND(
             CAST((CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                   - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                  * (CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                     - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                  AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * CAST(rt AS DECIMAL(38,0))
                    * CAST(ct AS DECIMAL(38,0)) AS DOUBLE), 6)
           AS DECIMAL(18,6))) AS _chi2
    FROM (
      SELECT o, x, y,
             SUM(o) OVER (PARTITION BY x) AS rt,
             SUM(o) OVER (PARTITION BY y) AS ct,
             SUM(o) OVER () AS n
      FROM p1
    )
  )
  UNION ALL
  SELECT 'type_x_hour', * FROM (
    SELECT CAST(MAX(n) AS BIGINT),
           CAST(COUNT(DISTINCT x) AS INTEGER),
           CAST(COUNT(DISTINCT y) AS INTEGER),
           SUM(CAST(ROUND(
             CAST((CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                   - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                  * (CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                     - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                  AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * CAST(rt AS DECIMAL(38,0))
                    * CAST(ct AS DECIMAL(38,0)) AS DOUBLE), 6)
           AS DECIMAL(18,6)))
    FROM (
      SELECT o, x, y,
             SUM(o) OVER (PARTITION BY x) AS rt,
             SUM(o) OVER (PARTITION BY y) AS ct,
             SUM(o) OVER () AS n
      FROM p2
    )
  )
  UNION ALL
  SELECT 'kdecile_x_hour', * FROM (
    SELECT CAST(MAX(n) AS BIGINT),
           CAST(COUNT(DISTINCT x) AS INTEGER),
           CAST(COUNT(DISTINCT y) AS INTEGER),
           SUM(CAST(ROUND(
             CAST((CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                   - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                  * (CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                     - CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)))
                  AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * CAST(rt AS DECIMAL(38,0))
                    * CAST(ct AS DECIMAL(38,0)) AS DOUBLE), 6)
           AS DECIMAL(18,6)))
    FROM (
      SELECT o, x, y,
             SUM(o) OVER (PARTITION BY x) AS rt,
             SUM(o) OVER (PARTITION BY y) AS ct,
             SUM(o) OVER () AS n
      FROM p3
    )
  )
)
SELECT pair, n, r_levels, c_levels,
       CAST(_chi2 AS DOUBLE) AS chi2,
       CAST((r_levels - 1) * (c_levels - 1) AS INTEGER) AS dof,
       ROUND(sqrt(CAST(_chi2 AS DOUBLE)
                  / (CAST(n AS DOUBLE)
                     * least(CAST(r_levels - 1 AS DOUBLE),
                             CAST(c_levels - 1 AS DOUBLE)))), 6) AS cramers_v,
       ROUND(sqrt(CAST(_chi2 AS DOUBLE)
                  / (CAST(n AS DOUBLE)
                     * sqrt(CAST(r_levels - 1 AS DOUBLE)
                            * CAST(c_levels - 1 AS DOUBLE)))), 6)
         AS tschuprow_t
FROM stats
ORDER BY pair
"""

# Q172 — tail-mass token share per source -----------------------------
# Integer ranks off the (tokens desc, doc_id) total order; cut sizes
# max(1, n//100), max(1, n//10); exact sums, one division per share.

ORACLES["q172"] = r"""
WITH d AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]')) AS BIGINT) AS ntok
  FROM documents
), r AS (
  SELECT source, ntok,
         row_number() OVER (PARTITION BY source
                            ORDER BY ntok DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM d
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS tot_tokens,
       CAST(MAX(greatest(1, n // 100)) AS BIGINT) AS top1_docs,
       ROUND(CAST(SUM(CASE WHEN rn <= greatest(1, n // 100)
                           THEN ntok ELSE 0 END) AS DOUBLE)
             / CAST(SUM(ntok) AS DOUBLE), 6) AS top1_share,
       CAST(MAX(greatest(1, n // 10)) AS BIGINT) AS top10_docs,
       ROUND(CAST(SUM(CASE WHEN rn <= greatest(1, n // 10)
                           THEN ntok ELSE 0 END) AS DOUBLE)
             / CAST(SUM(ntok) AS DOUBLE), 6) AS top10_share
FROM r
GROUP BY source
ORDER BY source
"""

# Q173 — top-k rank stability across halves ---------------------------
# Exact decimal revenue, integer ranks, full-outer part alignment,
# explode of the 3-literal k set, one division per measure.

ORACLES["q173"] = """
WITH li AS (
  SELECT CASE WHEN month(l_shipdate) <= 6 THEN 'H1' ELSE 'H2' END AS half,
         l_partkey,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
           AS rev
  FROM lineitem WHERE year(l_shipdate) = 1995
), pr AS (
  SELECT half, l_partkey, SUM(rev) AS rev FROM li GROUP BY half, l_partkey
), rk AS (
  SELECT half, l_partkey,
         row_number() OVER (PARTITION BY half
                            ORDER BY rev DESC, l_partkey ASC) AS rn
  FROM pr
), j AS (
  SELECT COALESCE(a.rn, 2147483647) AS rn_a,
         COALESCE(b.rn, 2147483647) AS rn_b,
         k.k AS k
  FROM (SELECT l_partkey, rn FROM rk WHERE half = 'H1') a
  FULL OUTER JOIN (SELECT l_partkey, rn FROM rk WHERE half = 'H2') b
    ON a.l_partkey = b.l_partkey
  CROSS JOIN (SELECT unnest([10, 50, 100]) AS k) k
), agg AS (
  SELECT k,
         CAST(SUM(CASE WHEN rn_a <= k THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN rn_b <= k THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN rn_a <= k AND rn_b <= k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_common
  FROM j GROUP BY k
)
SELECT k, n_a, n_b, n_common,
       ROUND(CAST(n_common AS DOUBLE)
             / CAST(least(n_a, n_b) AS DOUBLE), 6) AS containment,
       ROUND(CAST(n_common AS DOUBLE)
             / CAST(n_a + n_b - n_common AS DOUBLE), 6) AS jaccard
FROM agg
ORDER BY k
"""

# Q174 — CUSUM changepoint scan ---------------------------------------
# Division-cleared CUSUM: stat_t = D*prefix_t - t*total, all decimal
# off exact daily sums; one double division for the normalized form.

ORACLES["q174"] = """
WITH e AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
), daily AS (
  SELECT day, CAST(SUM(v) AS DECIMAL(28,2)) AS s FROM e GROUP BY day
), r AS (
  SELECT day,
         row_number() OVER (ORDER BY day) AS t,
         CAST(SUM(s) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS DECIMAL(28,2)) AS prefix,
         CAST(COUNT(*) OVER () AS DECIMAL(10,0)) AS dd,
         CAST(SUM(s) OVER () AS DECIMAL(28,2)) AS tot
  FROM daily
), st AS (
  SELECT day, CAST(t AS BIGINT) AS t,
         CAST(dd AS BIGINT) AS n_days,
         abs(dd * prefix - CAST(t AS DECIMAL(10,0)) * tot) AS astat,
         CAST(abs(dd * prefix - CAST(t AS DECIMAL(10,0)) * tot) AS DOUBLE)
           / (CAST(dd AS DOUBLE) * CAST(tot AS DOUBLE)) AS norm
  FROM r
)
SELECT day, t, n_days,
       CAST(astat AS DOUBLE) AS cusum_abs,
       ROUND(norm, 6) AS cusum_norm
FROM st
ORDER BY cusum_abs DESC, day
LIMIT 5
"""

# Q175 — Kruskal-Wallis H across priorities ----------------------------
# Oracle uses the PLAIN global window rank (doubled tie-averaged) —
# the driver hash proves the engine's bucket-decomposed distributed
# rank computes the identical statistic.

ORACLES["q175"] = """
WITH v AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), r AS (
  SELECT g,
         CAST(2 * rank() OVER (ORDER BY v)
              + COUNT(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS r2
  FROM v
), sg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(r2 AS DECIMAL(38,0))) AS s2
  FROM r GROUP BY g
), ties AS (
  SELECT v, CAST(COUNT(*) AS DECIMAL(13,0)) AS t FROM v GROUP BY v
), tt AS (
  SELECT CAST(SUM(t) AS BIGINT) AS nn,
         SUM(t * t * t - t) AS tsum
  FROM ties
), per AS (
  SELECT g, n, s2,
         CAST(ROUND(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                    / (4.0 * CAST(n AS DOUBLE)), 6)
              AS DECIMAL(38,6)) AS f,
         nn, tsum
  FROM sg CROSS JOIN tt
), fin AS (
  SELECT g, n, s2, nn, tsum,
         CAST(SUM(f) OVER () AS DOUBLE) AS fsum,
         COUNT(*) OVER () AS k
  FROM per
)
SELECT g AS o_orderpriority, n,
       CAST(s2 AS DOUBLE) AS rank_sum2,
       ROUND(CAST(s2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)), 6)
         AS mean_rank,
       ROUND(12.0 * fsum / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
             - 3.0 * (CAST(nn AS DOUBLE) + 1.0), 6) AS h,
       ROUND((12.0 * fsum / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
              - 3.0 * (CAST(nn AS DOUBLE) + 1.0))
             / (1.0 - CAST(tsum AS DOUBLE)
                / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                   * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))), 6) AS h_adj,
       CAST(k - 1 AS INTEGER) AS dof
FROM fin
ORDER BY o_orderpriority
"""

# Q176 — referential-integrity FK audit --------------------------------
# One row per FK edge; exact counts via scalar subqueries; the anti
# semantics spelled as NOT EXISTS — NULL-safe on BOTH sides (NOT IN
# collapses to 0 orphans the moment a parent key is NULL).

ORACLES["q176"] = """
WITH e AS (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS edge,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
           AS n_null_fk,
         (SELECT COUNT(*) FROM lineitem c WHERE c.l_orderkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey))
           AS n_orphan,
         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem)
           AS n_distinct_fk,
         (SELECT COUNT(*) FROM orders) AS n_parent
  UNION ALL
  SELECT 'lineitem.l_partkey->part.p_partkey',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL),
         (SELECT COUNT(*) FROM lineitem c WHERE c.l_partkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey)),
         (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
         (SELECT COUNT(*) FROM part)
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NULL),
         (SELECT COUNT(*) FROM lineitem c WHERE c.l_suppkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM supplier p WHERE p.s_suppkey = c.l_suppkey)),
         (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
         (SELECT COUNT(*) FROM supplier)
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
         (SELECT COUNT(*) FROM orders c WHERE c.o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey)),
         (SELECT COUNT(DISTINCT o_custkey) FROM orders),
         (SELECT COUNT(*) FROM customer)
  UNION ALL
  SELECT 'customer.c_nationkey->nation.n_nationkey',
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer WHERE c_nationkey IS NULL),
         (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.c_nationkey)),
         (SELECT COUNT(DISTINCT c_nationkey) FROM customer),
         (SELECT COUNT(*) FROM nation)
  UNION ALL
  SELECT 'supplier.s_nationkey->nation.n_nationkey',
         (SELECT COUNT(*) FROM supplier),
         (SELECT COUNT(*) FROM supplier WHERE s_nationkey IS NULL),
         (SELECT COUNT(*) FROM supplier c WHERE c.s_nationkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.s_nationkey)),
         (SELECT COUNT(DISTINCT s_nationkey) FROM supplier),
         (SELECT COUNT(*) FROM nation)
  UNION ALL
  SELECT 'nation.n_regionkey->region.r_regionkey',
         (SELECT COUNT(*) FROM nation),
         (SELECT COUNT(*) FROM nation WHERE n_regionkey IS NULL),
         (SELECT COUNT(*) FROM nation c WHERE c.n_regionkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM region p WHERE p.r_regionkey = c.n_regionkey)),
         (SELECT COUNT(DISTINCT n_regionkey) FROM nation),
         (SELECT COUNT(*) FROM region)
)
SELECT edge,
       CAST(n_child AS BIGINT) AS n_child,
       CAST(n_null_fk AS BIGINT) AS n_null_fk,
       CAST(n_orphan AS BIGINT) AS n_orphan,
       CAST(n_distinct_fk AS BIGINT) AS n_distinct_fk,
       CAST(n_parent AS BIGINT) AS n_parent,
       ROUND(CAST(n_distinct_fk AS DOUBLE) / CAST(n_parent AS DOUBLE), 6)
         AS parent_coverage
FROM e
ORDER BY edge
"""

# Q177 — point-in-time (feature-store) enrichment ----------------------
# The oracle uses DuckDB's NATIVE ASOF JOIN; the engine side is the
# union-sentinel as-of (ops/asof) — the hash proves them equivalent.

ORACLES["q177"] = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS oday
  FROM orders
), cum AS (
  SELECT o_custkey, oday,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY oday, o_orderkey) AS cum
  FROM o
), starts AS (
  SELECT o_custkey, oday,
         MAX(CASE WHEN cum = 10 THEN 3 WHEN cum = 5 THEN 2
                  ELSE 1 END) AS tier_rank
  FROM cum WHERE cum IN (1, 5, 10)
  GROUP BY o_custkey, oday
), facts AS (
  SELECT o2.o_custkey,
         CAST(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS sday,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4)))
           AS rev
  FROM lineitem l JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
), j AS (
  SELECT f.o_custkey, f.rev, s.tier_rank
  FROM facts f
  ASOF LEFT JOIN starts s
    ON f.o_custkey = s.o_custkey AND f.sday >= s.oday
)
SELECT CASE WHEN tier_rank = 3 THEN 'GOLD'
            WHEN tier_rank = 2 THEN 'SILVER'
            WHEN tier_rank = 1 THEN 'BRONZE'
            ELSE 'NONE' END AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue
FROM j
GROUP BY 1
ORDER BY tier
"""

# Q178 — dedup keeper election report ----------------------------------
# q96's recursive-CTE closure + a window election under the declared
# (ntok DESC, doc_id ASC) total order; exact integer savings.

ORACLES["q178"] = rf"""
WITH RECURSIVE q AS (
  SELECT doc_id, lang, n_chars,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]')) AS BIGINT) AS ntok
  FROM documents
), {_doc_graph_cte("q")}, mem AS (
  SELECT c.comp AS component, q.doc_id, q.n_chars, q.ntok,
         row_number() OVER (PARTITION BY c.comp
                            ORDER BY q.ntok DESC, q.doc_id ASC) AS rn
  FROM comp c JOIN q ON q.doc_id = c.id
)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
         AS keeper_doc,
       CAST(MIN(CASE WHEN rn = 1 THEN ntok END) AS BIGINT)
         AS tokens_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(ntok) AS BIGINT) AS tokens_total,
       CAST(SUM(ntok) - MIN(CASE WHEN rn = 1 THEN ntok END) AS BIGINT)
         AS tokens_deleted
FROM mem
GROUP BY component
HAVING COUNT(*) >= 2
ORDER BY component
"""

# Q179 — training-mix rebalance plan -----------------------------------
# Fixed target shares (exact hundredths); the achievable mix size is
# the integer-floor min over per-source caps; planned takes and the
# binding flag all exact integer `//` arithmetic, one division for
# the rate.

ORACLES["q179"] = r"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]'))) AS BIGINT)
           AS tokens
  FROM documents GROUP BY source
), sh AS (
  SELECT * FROM (VALUES
    ('src0', 9), ('src1', 9), ('src2', 8), ('src3', 8), ('src4', 7),
    ('src5', 7), ('src6', 6), ('src7', 6), ('src8', 5), ('src9', 5),
    ('src10', 5), ('src11', 5), ('src12', 4), ('src13', 4),
    ('src14', 3), ('src15', 3), ('src16', 2), ('src17', 2),
    ('src18', 1), ('src19', 1)) AS t(source, share_pct)
), capped AS (
  SELECT p.source, p.n_docs, p.tokens,
         CAST(s.share_pct AS BIGINT) AS share_pct,
         p.tokens * 100 // CAST(s.share_pct AS BIGINT) AS cap
  FROM per p JOIN sh s USING (source)
  WHERE s.share_pct > 0
), tt AS (
  SELECT MIN(cap) AS t_total FROM capped
)
SELECT source, n_docs, tokens, share_pct,
       CAST(t_total AS BIGINT) AS t_total,
       CAST(share_pct * t_total // 100 AS BIGINT) AS planned_tokens,
       ROUND(CAST(share_pct * t_total // 100 AS DOUBLE)
             / CAST(tokens AS DOUBLE), 6) AS sampling_rate,
       CAST(CASE WHEN cap = t_total THEN 1 ELSE 0 END AS INTEGER)
         AS is_binding
FROM capped CROSS JOIN tt
ORDER BY source
"""

# Q180 — cluster-aware train/val/test split ----------------------------
# Recursive-CTE closure gives cluster roots (isolated docs root
# themselves); every member inherits the root's q67 md5 fold; both
# audit scalars (cluster-grain cross-split, doc-fold counterfactual)
# computed generically.

ORACLES["q180"] = rf"""
WITH RECURSIVE q AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, E'[^\t\n\f\r ]+')) AS BIGINT)
           AS ntok
  FROM documents
), {_doc_graph_cte("q")}, m AS (
  SELECT q.doc_id, q.ntok,
         COALESCE(c.comp, q.doc_id) AS root,
         CASE
           WHEN CAST('0x' || substr(md5(CAST(COALESCE(c.comp, q.doc_id)
                     AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
           WHEN CAST('0x' || substr(md5(CAST(COALESCE(c.comp, q.doc_id)
                     AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 95 THEN 'val'
           ELSE 'test'
         END AS split,
         CASE
           WHEN CAST('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 < 90 THEN 'train'
           WHEN CAST('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 < 95 THEN 'val'
           ELSE 'test'
         END AS doc_split
  FROM q LEFT JOIN comp c ON q.doc_id = c.id
), per_split AS (
  SELECT split,
         CAST(COUNT(DISTINCT root) AS BIGINT) AS n_clusters,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(ntok) AS BIGINT) AS n_tokens
  FROM m GROUP BY split
), audits AS (
  SELECT root,
         COUNT(DISTINCT split) AS k_cluster,
         COUNT(DISTINCT doc_split) AS k_doc
  FROM m GROUP BY root
), scalars AS (
  SELECT CAST(SUM(CASE WHEN k_cluster > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cross_split_clusters,
         CAST(SUM(CASE WHEN k_doc > 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS doc_fold_torn_clusters
  FROM audits
)
SELECT split, n_clusters, n_docs, n_tokens,
       cross_split_clusters, doc_fold_torn_clusters
FROM per_split CROSS JOIN scalars
ORDER BY split
"""


# q181: TRUE streaming drain of the q35 tumbling aggregation — a fully
# drained availableNow run over a bounded source must equal the batch
# twin exactly, so the oracle IS q35's SQL (same columns, same
# determinism rules).
ORACLES["q181"] = ORACLES["q35"]


# Q182 — per-doc token rarity (integer-exact surprisal core) ----------
# Tokenizer identical to q54/q100 (non-empty splits on whitespace);
# every reported number is exact BIGINT except the single ROUND(.,6)
# hapax-rate division, evaluated in the same written order as Spark's.
ORACLES["q182"] = r"""
WITH occ AS (
  SELECT doc_id, unnest(list_filter(
           regexp_split_to_array(text, E'[\t\n\f\r ]+'), x -> x <> ''))
         AS tok
  FROM documents
), freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM occ GROUP BY tok
)
SELECT
  o.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(COUNT(DISTINCT o.tok) AS BIGINT) AS n_distinct,
  CAST(SUM(f.f) AS BIGINT) AS sum_corpus_freq,
  CAST(MIN(f.f) AS BIGINT) AS min_corpus_freq,
  CAST(count_if(f.f = 1) AS BIGINT) AS n_hapax,
  ROUND(CAST(count_if(f.f = 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS hapax_rate
FROM occ o JOIN freq f ON o.tok = f.tok
GROUP BY o.doc_id
"""


# Q183 — TRUE streaming sliding-window drain ≡ q31's batch SQL.
ORACLES["q183"] = ORACLES["q31"]

# Q184 — TRUE stateful streaming dedup drain: the key-only projection
# makes the drained append output exactly the distinct key set.
ORACLES["q184"] = """
SELECT DISTINCT user_id, event_type FROM events
"""


# Q185 — TRUE streaming foreachBatch CDC MERGE drain: latest row per
# user under the (epoch-second DESC, event_id DESC) total order.
ORACLES["q185"] = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         event_id, event_type, value
  FROM events
), r AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ep DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, ep, event_id, event_type, value FROM r WHERE rn = 1
"""


# Q186 — incremental aggregate maintenance ≡ full recompute (IVM
# identity). Decimal partials merged exactly, rounded once at output.
ORACLES["q186"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(value AS DECIMAL(12,2)) AS v FROM events
), b AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS bn, SUM(v) AS bs
  FROM e WHERE event_id % 97 <> 0 GROUP BY user_id
), d AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS dn, SUM(v) AS ds
  FROM e WHERE event_id % 97 = 0 GROUP BY user_id
), m AS (
  SELECT COALESCE(b.user_id, d.user_id) AS user_id,
         COALESCE(bn, 0) + COALESCE(dn, 0) AS n,
         COALESCE(bs, CAST(0 AS DECIMAL(12,2)))
           + COALESCE(ds, CAST(0 AS DECIMAL(12,2))) AS s
  FROM b FULL OUTER JOIN d ON b.user_id = d.user_id
), f AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS fn, SUM(v) AS fs
  FROM e GROUP BY user_id
)
SELECT m.user_id, m.n,
       CAST(ROUND(m.s, 2) AS DOUBLE) AS sum_value,
       CAST(CASE WHEN m.n = f.fn AND m.s = f.fs THEN 1 ELSE 0 END
            AS INTEGER) AS consistent
FROM m JOIN f ON m.user_id = f.user_id
"""


# Q187 — TRUE streaming session-window drain ≡ q36's gaps-and-islands
# SQL minus the ordinal session_id: sessions are identified by their
# data-determined (user_id, sess_start) instead of a running index.
# Session membership is the SAME rule in both engines — floored-second
# gap ≤ 1800 — because the Spark side feeds session_window floored
# timestamps with gap 1800 s and Spark's merge boundary is INCLUSIVE
# (an event exactly gap seconds after the session end merges; pinned
# by test_streaming's boundary test).
ORACLES["q187"] = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
), f AS (
  SELECT *,
         CASE WHEN lag(ep) OVER w IS NULL
                OR ep - lag(ep) OVER w > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
), s AS (
  SELECT *,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ep, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM f
)
SELECT user_id,
       MIN(ep) AS sess_start, MAX(ep) AS sess_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s
GROUP BY user_id, session_id
"""


# Q188 — TRUE stream-stream interval join drain: the q52-family join
# at PAIR grain (append-only inner-join contract), exact half-open
# window [c_ep+1, c_ep+86401) — the 24 h attribution horizon (q52's
# 10-minute window is single-digit pairs at gate scale) — on floored
# integer seconds; every output column is a stored value.
ORACLES["q188"] = """
WITH c AS (
  SELECT event_id AS click_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS c_ep
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT event_id AS view_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS v_ep, value
  FROM events WHERE event_type = 'view'
)
SELECT c.click_id, c.user_id, c.c_ep AS click_ep,
       v.view_id, v.v_ep AS view_ep, v.value
FROM c JOIN v
  ON c.user_id = v.user_id
 AND v.v_ep >= c.c_ep + 1 AND v.v_ep < c.c_ep + 86401
"""


# Q189 — BPE corpus encoder: DuckDB replays the SAME pinned merge
# table (ops/bpe.BPE_FIXED_MERGES, fixed text in both engines) with a
# recursive CTE over the word dictionary. Each step applies ONE
# non-global regexp_replace of the current rank's delimited pair
# (' l r ' → ' lr ') — merge-first-occurrence-until-absent, which
# equals Spark's left-to-right greedy fold because fusing (l, r) can
# never create a new (l, r) adjacency. The rank pointer advances only
# when the pair is absent; terminal rows carry k = max_rank + 1.
# Normalization (lower, strip [^a-z]) keeps every symbol regex-safe.
ORACLES["q189"] = r"""
WITH RECURSIVE
merges(rank, l, r) AS (
  SELECT * FROM (VALUES
    (1,'t','h'),(2,'th','e'),(3,'e','r'),(4,'i','n'),
    (5,'a','n'),(6,'o','r'),(7,'s','t'),(8,'a','t'),
    (9,'o','w'),(10,'d','ow'),(11,'in','dow'),(12,'w','indow'),
    (13,'l','l'),(14,'g','g'),(15,'r','e'),(16,'b','at')
  ) AS m(rank, l, r)
),
wocc AS (
  SELECT doc_id, regexp_replace(lower(tok), '[^a-z]', '', 'g') AS w
  FROM (SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(text, E'[\t\n\f\r ]+'), x -> x <> ''))
        AS tok FROM documents)
  WHERE regexp_replace(lower(tok), '[^a-z]', '', 'g') <> ''
),
dict AS (SELECT DISTINCT w FROM wocc),
enc AS (
  SELECT w,
         ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s,
         1 AS k
  FROM dict
  UNION ALL
  SELECT e.w,
         CASE WHEN contains(e.s, ' ' || m.l || ' ' || m.r || ' ')
              THEN regexp_replace(e.s, ' ' || m.l || ' ' || m.r || ' ',
                                  ' ' || m.l || m.r || ' ')
              ELSE e.s END,
         CASE WHEN contains(e.s, ' ' || m.l || ' ' || m.r || ' ')
              THEN e.k ELSE e.k + 1 END
  FROM enc e JOIN merges m ON m.rank = e.k
),
word_tok AS (
  SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_tok
  FROM enc
  WHERE k = (SELECT MAX(rank) FROM merges) + 1
)
SELECT d.doc_id,
       CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_bpe_tokens,
       CAST(COUNT(o.w) AS BIGINT) AS n_words
FROM documents d
LEFT JOIN wocc o ON o.doc_id = d.doc_id
LEFT JOIN word_tok t ON t.w = o.w
GROUP BY d.doc_id
"""

# Q190 — streaming heavy-hitters drain ------------------------------
# q113's oracle VERBATIM: the drained applyInPandasWithState
# Misra-Gries candidate union is a guaranteed superset of the true
# heavy hitters (bucket-local pigeonhole + mergeable-summary error
# bound), and the batch recount makes the final answer exactly the
# naive full-vocabulary groupBy at threshold N/30.

ORACLES["q190"] = ORACLES["q113"]

# Q191 — longest-prefix-match join -----------------------------------
# The lateral-style spelling of LPM: a theta join on
# substr(key, 1, plen) = prefix (every matching route, any length),
# then row_number ordered by plen DESC picks the longest — the
# textbook single-machine form. The engine instead expands each
# lookup key into one probe arm per DISTINCT route length and hash
# equi-joins on (prefix, plen) (ops/lpm.py), so the driver hash
# proves the expand-on-length decomposition computes the identical
# longest match. Ties at equal length are impossible (two distinct
# equal-length prefixes cannot both prefix one key), so the
# row_number is deterministic.

ORACLES["q191"] = """
WITH sup AS (
  SELECT s_suppkey, reverse(lpad(CAST(s_suppkey AS VARCHAR), 12, '0')) AS d
  FROM supplier
), routes AS (
  SELECT DISTINCT substr(d, 1, 1) AS prefix FROM sup WHERE s_suppkey % 2 = 0
  UNION
  SELECT DISTINCT substr(d, 1, 3) AS prefix FROM sup WHERE s_suppkey % 3 = 0
  UNION
  SELECT DISTINCT substr(d, 1, 5) AS prefix FROM sup
), rl AS (
  SELECT prefix, length(prefix) AS plen FROM routes
), lk AS (
  SELECT c_custkey, reverse(lpad(CAST(c_custkey AS VARCHAR), 12, '0')) AS k
  FROM customer
), m AS (
  SELECT lk.c_custkey, rl.prefix, rl.plen,
         row_number() OVER (PARTITION BY lk.c_custkey
                            ORDER BY rl.plen DESC, rl.prefix) AS rn
  FROM lk JOIN rl ON substr(lk.k, 1, rl.plen) = rl.prefix
), best AS (
  SELECT c_custkey, prefix, plen FROM m WHERE rn = 1
), agg AS (
  SELECT prefix AS matched_prefix, CAST(plen AS BIGINT) AS match_len,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(MIN(c_custkey) AS BIGINT) AS min_custkey,
         CAST(MAX(c_custkey) AS BIGINT) AS max_custkey
  FROM best GROUP BY prefix, plen
), un AS (
  SELECT '(none)' AS matched_prefix, CAST(0 AS BIGINT) AS match_len,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(MIN(c_custkey) AS BIGINT) AS min_custkey,
         CAST(MAX(c_custkey) AS BIGINT) AS max_custkey
  FROM lk WHERE NOT EXISTS (
    SELECT 1 FROM rl WHERE substr(lk.k, 1, rl.plen) = rl.prefix)
  HAVING COUNT(*) > 0
)
SELECT * FROM agg UNION ALL SELECT * FROM un
ORDER BY match_len DESC, matched_prefix
"""

# q192: linear-interpolation gap fill — q57's spine and hourly CTEs
# verbatim, then the exact rational bracket interpolation: bracket
# values/hours via LAST/FIRST_VALUE IGNORE NULLS over preceding/
# following frames, DECIMAL(14,2)×DECIMAL(18,0) exact products, ONE
# double division per gap row (observed rows short-circuit on the
# integer h_next = h_prev test and emit the stored decimal exactly).

ORACLES["q192"] = """
WITH hourly AS (
  SELECT user_id,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h_ep,
         SUM(CAST(value AS DECIMAL(14,2))) AS sum_value
  FROM events
  WHERE user_id < 8
  GROUP BY 1, 2
), spine AS (
  SELECT user_id, unnest(generate_series(MIN(h_ep), MAX(h_ep), 3600)) AS h_ep
  FROM hourly
  GROUP BY user_id
), j AS (
  SELECT s.user_id, s.h_ep, h.sum_value
  FROM spine s LEFT JOIN hourly h USING (user_id, h_ep)
), f AS (
  SELECT user_id, h_ep, sum_value,
    LAST_VALUE(sum_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY h_ep
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN sum_value IS NOT NULL THEN h_ep END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY h_ep
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    FIRST_VALUE(sum_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY h_ep
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN sum_value IS NOT NULL THEN h_ep END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY h_ep
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM j
)
SELECT
  user_id,
  h_ep,
  CAST(sum_value IS NOT NULL AS INTEGER) AS observed,
  CAST(CASE WHEN nh = ph THEN CAST(pv AS DOUBLE)
       ELSE CAST(pv * CAST(nh - h_ep AS DECIMAL(18,0))
                 + nv * CAST(h_ep - ph AS DECIMAL(18,0)) AS DOUBLE)
            / CAST(nh - ph AS DOUBLE)
       END AS DOUBLE) AS lin_sum_value
FROM f
"""

# q193: deterministic contrastive negative sampling — the same md5
# folds, bucket index, and two-slice address arithmetic as the
# engine (ops/split.py's 8-hex 32-bit fold): candidate bucket =
# fold(doc_id) % 64 with a bucket-local row_number rank; draw
# address = fold(doc_id ':' slot) split into bucket (% 64) and rank
# (// 64 % bucket_count); self-hits dropped (declared). All integer
# codegen — the hash proves the distributed bucket-index plan
# computes the textbook single-table form exactly.

ORACLES["q193"] = r"""
WITH idx AS (
  SELECT doc_id AS neg_doc_id,
         CAST(len(regexp_extract_all(text, E'[^\t\n\f\r ]+')) AS BIGINT)
           AS neg_n_tokens,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 64 AS bkt,
         row_number() OVER (
           PARTITION BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8) AS BIGINT) % 64
           ORDER BY doc_id) - 1 AS rn
  FROM documents
), cnt AS (
  SELECT bkt, COUNT(*) AS c FROM idx GROUP BY bkt
), anchors AS (
  SELECT d.doc_id, s.slot,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                 || CAST(s.slot AS VARCHAR)), 1, 8)
              AS BIGINT) AS f2
  FROM documents d
  CROSS JOIN (SELECT unnest(range(0, 4)) AS slot) s
), probe AS (
  SELECT a.doc_id, a.slot, a.f2 % 64 AS tbkt, (a.f2 // 64) % c.c AS li
  FROM anchors a JOIN cnt c ON c.bkt = a.f2 % 64
)
SELECT p.doc_id,
       CAST(p.slot AS INTEGER) AS slot,
       i.neg_doc_id,
       i.neg_n_tokens
FROM probe p JOIN idx i ON i.bkt = p.tbkt AND i.rn = p.li
WHERE i.neg_doc_id <> p.doc_id
"""
