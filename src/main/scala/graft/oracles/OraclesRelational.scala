package graft

/** DuckDB oracle SQL — relational/window/aggregate shapes.
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesRelational {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    "window_running" ->
      """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
         FROM events""",

    "window_topn" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders) WHERE rank <= 3""",

    "window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, quartile, rnk FROM (
           SELECT o_orderkey, o_orderpriority,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             CAST(rank() OVER w AS BIGINT) AS rnk
           FROM orders
           WINDOW w AS (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rnk <= 100""",

    "pivot_status" ->
      """SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS n_f,
           count(*) FILTER (o_orderstatus = 'O') AS n_o,
           count(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority""",

    "orders_by_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1""",

    "window_cume" ->
      """SELECT event_id, user_id,
           percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS pr,
           cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id) AS cd
         FROM events""",

    "crossmodal_join" ->
      """WITH t AS (SELECT doc_id, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         q AS (SELECT doc_id,
           least(1.0, greatest(0.0,
             0.2 + 0.01 * len(toks) +
             len(list_filter(toks,
               x -> x IN ('the','a','of','and','is','to','in','it','that','for')))::DOUBLE /
               greatest(len(toks), 1) -
             5.0 * length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
               greatest(length(text), 1))) AS quality
           FROM t)
         SELECT label, count(*) AS n, round(avg(quality), 4) AS avg_quality
         FROM embeddings JOIN q ON vec_id = doc_id
         WHERE quality > 0.5 GROUP BY label""",

    "throughput_rangescan" ->
      """SELECT count(*) AS n, CAST(sum(x * 2) AS BIGINT) AS total
         FROM range(100000000) t(x) WHERE x % 3 = 0""",

    "distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",

    "filtered_agg" ->
      """SELECT o_orderstatus,
         count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
         round(sum(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2) AS big_total,
         count(*) AS n
         FROM orders GROUP BY o_orderstatus""",

    "string_shape" ->
      """SELECT c_custkey, upper(substr(c_name, 1, 8)) AS prefix,
         length(c_name)::BIGINT AS name_len,
         lpad(c_custkey::VARCHAR, 8, '0') AS padded
         FROM customer""",

    "window_lag" ->
      """SELECT event_id, user_id,
         round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
         FROM events""",

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
         GROUPING(l_returnflag, l_linestatus)::BIGINT AS g,
         count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
         GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS g,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",

    "percentile_agg" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",

    "scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_above,
           round(sum(o_totalprice), 2) AS total_above
         FROM orders
         WHERE o_totalprice >
           (SELECT floor(avg(o_totalprice) * 100 + 0.5) / 100 FROM orders)
         GROUP BY o_orderstatus""",

    "group_boxplot" ->
      """WITH li AS (SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
           FROM lineitem),
         g AS (SELECT l_returnflag, count(*) AS n,
                 quantile_cont(cents, [0.25, 0.5, 0.75]) AS qs
               FROM li GROUP BY l_returnflag)
         SELECT l_returnflag, n, u.i - 1 AS q_idx, qs[u.i] AS q_value
         FROM g, (SELECT unnest(generate_series(1, 3)) AS i) u""",

    "orders_rfm" ->
      """WITH base AS (SELECT o_custkey AS c_custkey,
             max(epoch_us(o_orderdate) // 86400000000) AS recency_day,
             count(*) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_cents
           FROM orders GROUP BY 1),
         thr AS (SELECT
             quantile_cont(recency_day, 0.25) AS r1, quantile_cont(recency_day, 0.5) AS r2,
             quantile_cont(recency_day, 0.75) AS r3,
             quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
             quantile_cont(frequency, 0.75) AS f3,
             quantile_cont(monetary_cents, 0.25) AS m1, quantile_cont(monetary_cents, 0.5) AS m2,
             quantile_cont(monetary_cents, 0.75) AS m3
           FROM base)
         SELECT c_custkey, recency_day, frequency, monetary_cents,
           (1 + (recency_day >= r1)::INT + (recency_day >= r2)::INT
              + (recency_day >= r3)::INT)::BIGINT AS r_q,
           (1 + (frequency >= f1)::INT + (frequency >= f2)::INT
              + (frequency >= f3)::INT)::BIGINT AS f_q,
           (1 + (monetary_cents >= m1)::INT + (monetary_cents >= m2)::INT
              + (monetary_cents >= m3)::INT)::BIGINT AS m_q
         FROM base, thr""",

    "basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
         FROM li a JOIN li b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 3""",

    "dq_audit" ->
      """SELECT 'lineitem_null_orderkey' AS rule,
           count(*) FILTER (l_orderkey IS NULL)::BIGINT AS n_bad FROM lineitem
         UNION ALL SELECT 'lineitem_nonpositive_price',
           count(*) FILTER (l_extendedprice <= 0)::BIGINT FROM lineitem
         UNION ALL SELECT 'lineitem_discount_range',
           count(*) FILTER (l_discount < 0 OR l_discount > 0.5)::BIGINT FROM lineitem
         UNION ALL SELECT 'orders_orphan_customer', count(*)::BIGINT FROM orders
           WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
         UNION ALL SELECT 'lineitem_dup_pk', coalesce(sum(c), 0)::BIGINT
           FROM (SELECT count(*) AS c FROM lineitem
                 GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)""",

    "snapshot_diff" ->
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
         n AS (SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN text || ' rev' ELSE text END AS text
               FROM documents WHERE doc_id % 5 <> 0)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text = n.text THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""",

  )
}
