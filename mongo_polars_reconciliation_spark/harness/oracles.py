"""DuckDB oracle SQL mirroring harness/fixtures.py exactly.

Every CTE here is the 1:1 SQL translation of a fixture builder or engine
operator; the driver runs these against the same parquet tables and
hash-compares values with the Spark results. Column aliases must match the
Spark-side selects verbatim (driver sorts columns by name before hashing).
"""

from __future__ import annotations

# --- shared fixture CTEs (mirror of fixtures.load_base/build_internal/build_external)

BASE_CTES = """
base AS (
  SELECT o_orderkey AS k,
         o_totalprice AS amt,
         STRFTIME(o_orderdate, '%Y-%m-%d') AS dt,
         o_custkey AS cust
  FROM orders
),
a_tbl AS (
  SELECT CAST(k AS VARCHAR) AS _id, k, CAST(k AS VARCHAR) AS transaction_code,
         amt AS amount, dt AS trx_date, 'SALE' AS transaction_type,
         CAST(k AS VARCHAR) AS ticket_code, CAST(NULL AS VARCHAR) AS sale_ticket_code
  FROM base WHERE k % 10 <> 9
  UNION ALL
  SELECT CAST(v.k AS VARCHAR), v.k, CAST(v.k AS VARCHAR),
         s.amt, v.dt, 'VOID', CAST(v.k AS VARCHAR), CAST(s.k AS VARCHAR)
  FROM base v JOIN base s ON s.k = v.k - 1
  WHERE v.k % 10 = 9 AND v.k % 100 <> 49
  UNION ALL
  SELECT CAST(k AS VARCHAR), k, CAST(k AS VARCHAR),
         amt, dt, 'VOID', CAST(k AS VARCHAR), 'X' || CAST(k AS VARCHAR)
  FROM base WHERE k % 100 = 49
),
b_pre AS (
  SELECT k, CAST(k AS VARCHAR) AS codigo,
         amt + CASE WHEN k % 17 = 2 THEN 0.4 WHEN k % 17 = 9 THEN 7.25 ELSE 0.0 END AS importe,
         dt AS fecha, 1 AS cpy
  FROM base WHERE k % 19 <> 3
  UNION ALL
  SELECT k, CAST(k AS VARCHAR),
         amt + CASE WHEN k % 17 = 2 THEN 0.4 WHEN k % 17 = 9 THEN 7.25 ELSE 0.0 END,
         dt, 2
  FROM base WHERE k % 23 = 5 AND k % 19 <> 3
  UNION ALL
  SELECT k, CAST(k AS VARCHAR),
         amt + CASE WHEN k % 17 = 2 THEN 0.4 WHEN k % 17 = 9 THEN 7.25 ELSE 0.0 END,
         dt, 3
  FROM base WHERE k % 69 = 5 AND k % 19 <> 3
  UNION ALL
  SELECT k, 'B' || CAST(k AS VARCHAR), amt, dt, 1
  FROM base WHERE k % 29 = 11
),
b_tbl AS (
  SELECT codigo, importe, fecha,
         CAST(ROW_NUMBER() OVER (ORDER BY k, codigo, cpy) AS BIGINT) AS row_num
  FROM b_pre
)
"""

# exact-match join + winner/loser ranking (operators/match.py mirror)
MATCH_CTES = """
j1 AS (
  SELECT a._id, a.transaction_code, a.amount, a.trx_date,
         b.codigo, b.importe, b.fecha, b.row_num,
         ROW_NUMBER() OVER (PARTITION BY a._id ORDER BY b.row_num) AS rn
  FROM a_tbl a JOIN b_tbl b
    ON a.transaction_code = b.codigo AND a.amount = b.importe AND a.trx_date = b.fecha
)
"""

# zero-effect pair detection (operators/zero_effect.py mirror)
ZE_CTES = """
ze AS (
  SELECT s._id AS sale_id, v._id AS void_id, s.amount AS amount
  FROM (SELECT * FROM a_tbl WHERE transaction_type = 'SALE') s
  JOIN (SELECT * FROM a_tbl WHERE transaction_type = 'VOID') v
    ON s.ticket_code = v.sale_ticket_code AND s.amount = v.amount
)
"""

DEC_SUM = "COALESCE(CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE), 0.0)"


def q(*cte_blocks: str, select: str) -> str:
    return "WITH " + ",".join(b.strip().rstrip(",") for b in cte_blocks) + "\n" + select


ORACLES: dict[str, str] = {
    "recon_match_exact": q(
        BASE_CTES, MATCH_CTES,
        select="SELECT _id, row_num, amount, trx_date FROM j1 WHERE rn = 1",
    ),
    "recon_duplicate_losers": q(
        BASE_CTES, MATCH_CTES,
        select="SELECT row_num, codigo, importe FROM j1 WHERE rn > 1",
    ),
    "recon_residual_internal": q(
        BASE_CTES,
        select="""
SELECT a._id, a.transaction_code, a.amount FROM a_tbl a
WHERE NOT EXISTS (SELECT 1 FROM b_tbl b
  WHERE a.transaction_code = b.codigo AND a.amount = b.importe AND a.trx_date = b.fecha)
""",
    ),
    "recon_residual_external": q(
        BASE_CTES,
        select="""
SELECT b.row_num, b.codigo, b.importe FROM b_tbl b
WHERE NOT EXISTS (SELECT 1 FROM a_tbl a
  WHERE a.transaction_code = b.codigo AND a.amount = b.importe AND a.trx_date = b.fecha)
""",
    ),
    "recon_zero_effect_pairs": q(
        BASE_CTES, ZE_CTES,
        select="SELECT sale_id, void_id FROM ze",
    ),
    "recon_zero_effect_clean": q(
        BASE_CTES, ZE_CTES,
        select="""
SELECT a._id FROM a_tbl a
WHERE NOT EXISTS (SELECT 1 FROM ze WHERE ze.sale_id = a._id)
  AND NOT EXISTS (SELECT 1 FROM ze WHERE ze.void_id = a._id)
""",
    ),
    "recon_tolerance_match": q(
        BASE_CTES,
        select="""
SELECT _id, row_num, ROUND(diff, 2) AS diff FROM (
  SELECT a._id, b.row_num, ABS(b.importe - a.amount) AS diff,
         ROW_NUMBER() OVER (PARTITION BY a.transaction_code, a.trx_date
                            ORDER BY ABS(b.importe - a.amount), b.row_num) AS trn
  FROM a_tbl a JOIN b_tbl b
    ON a.transaction_code = b.codigo AND a.trx_date = b.fecha
  WHERE ABS(b.importe - a.amount) <= 1.0
) t WHERE trn = 1
""",
    ),
    "recon_cascade_summary": q(
        BASE_CTES, ZE_CTES,
        select=f"""
, a1 AS (
  SELECT a.* FROM a_tbl a
  WHERE NOT EXISTS (SELECT 1 FROM ze WHERE ze.sale_id = a._id)
    AND NOT EXISTS (SELECT 1 FROM ze WHERE ze.void_id = a._id)
),
j1 AS (
  SELECT a._id, a.transaction_code, a.amount, a.trx_date,
         b.codigo, b.importe, b.fecha, b.row_num,
         ROW_NUMBER() OVER (PARTITION BY a._id ORDER BY b.row_num) AS rn
  FROM a1 a JOIN b_tbl b
    ON a.transaction_code = b.codigo AND a.amount = b.importe AND a.trx_date = b.fecha
),
m1 AS (SELECT _id, amount FROM j1 WHERE rn = 1),
losers1 AS (SELECT codigo, importe, fecha, row_num FROM j1 WHERE rn > 1),
a_res1 AS (
  SELECT a.* FROM a1 a WHERE NOT EXISTS (SELECT 1 FROM b_tbl b
    WHERE a.transaction_code = b.codigo AND a.amount = b.importe AND a.trx_date = b.fecha)
),
b_res1 AS (
  SELECT b.codigo, b.importe, b.fecha, b.row_num FROM b_tbl b
  WHERE NOT EXISTS (SELECT 1 FROM a1 a
    WHERE a.transaction_code = b.codigo AND a.amount = b.importe AND a.trx_date = b.fecha)
  UNION ALL
  SELECT codigo, importe, fecha, row_num FROM losers1
),
tm AS (
  SELECT * FROM (
    SELECT a._id, a.transaction_code, a.amount, a.trx_date,
           b.codigo, b.importe, b.fecha, b.row_num,
           ABS(b.importe - a.amount) AS diff,
           ROW_NUMBER() OVER (PARTITION BY a.transaction_code, a.trx_date
                              ORDER BY ABS(b.importe - a.amount), b.row_num) AS trn
    FROM a_res1 a JOIN b_res1 b
      ON a.transaction_code = b.codigo AND a.trx_date = b.fecha
    WHERE ABS(b.importe - a.amount) <= 1.0
  ) t WHERE trn = 1
),
a_nmt AS (
  SELECT a.* FROM a_res1 a WHERE NOT EXISTS (SELECT 1 FROM tm
    WHERE tm.transaction_code = a.transaction_code AND tm.trx_date = a.trx_date)
),
b_nmt AS (
  SELECT b.* FROM b_res1 b WHERE NOT EXISTS (SELECT 1 FROM tm
    WHERE tm.codigo = b.codigo AND tm.importe = b.importe AND tm.fecha = b.fecha)
),
mt_all AS (SELECT _id, amount FROM m1 UNION ALL SELECT _id, amount FROM tm)
SELECT 'a_to_b_mt' AS bucket, COUNT(*) AS n, {DEC_SUM} AS amount_sum FROM mt_all
UNION ALL
SELECT 'a_to_b_nmt', COUNT(*), {DEC_SUM} FROM a_nmt
UNION ALL
SELECT 'b_to_a_nmt', COUNT(*), 0.0 FROM b_nmt
UNION ALL
SELECT 'z_eff_a', COUNT(*), {DEC_SUM} FROM ze
""",
    ),
    "recon_state_merge_keep_existing": q(
        BASE_CTES,
        select="""
, target AS (SELECT _id, 'OLD' AS status FROM a_tbl WHERE k % 4 = 0),
source AS (SELECT _id, 'PENDING' AS status FROM a_tbl)
SELECT _id, status FROM target
UNION ALL
SELECT s._id, s.status FROM source s
WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t._id = s._id)
""",
    ),
    "recon_remanent_lookup": q(
        BASE_CTES,
        select="""
, state AS (
  SELECT CAST(k AS VARCHAR) AS _id,
         CASE WHEN k % 5 = 2 THEN 'REMANENT' ELSE 'CONCILIATED' END AS conciliation_status
  FROM base
)
SELECT a._id, a.amount FROM a_tbl a
JOIN state s ON a._id = s._id AND s.conciliation_status = 'REMANENT'
""",
    ),
    "recon_union_remanent_dedup": q(
        BASE_CTES,
        select="""
, w AS (SELECT _id, 'W' AS src, 0 AS rank_src FROM a_tbl WHERE k < 700),
r AS (SELECT _id, 'R' AS src, 1 AS rank_src FROM a_tbl WHERE k % 5 = 2),
u AS (SELECT * FROM w UNION ALL SELECT * FROM r)
SELECT _id, src FROM (
  SELECT _id, src, ROW_NUMBER() OVER (PARTITION BY _id ORDER BY rank_src) AS rn FROM u
) t WHERE rn = 1
""",
    ),
    "events_hourly": """
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_bucket,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
    "events_sessionize": """
WITH e AS (
  SELECT event_id, user_id, epoch_ns(ts) AS tn FROM events
),
lagged AS (
  SELECT event_id, user_id, tn,
         LAG(tn) OVER (PARTITION BY user_id ORDER BY tn, event_id) AS prev_tn
  FROM e
),
flagged AS (
  SELECT event_id, user_id,tn,
         CASE WHEN prev_tn IS NULL OR tn - prev_tn > 1800000000000 THEN 1 ELSE 0 END AS is_new
  FROM lagged
)
SELECT event_id, user_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tn, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM flagged
""",
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1999-12-31'
GROUP BY l_returnflag, l_linestatus
""",
}
