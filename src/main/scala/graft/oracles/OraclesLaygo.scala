package graft

/** DuckDB oracle SQL — laygo operator semantics (map/filter/join/branch/context/...).
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesLaygo {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    "entry" ->
      """SELECT r_name, year(o_orderdate) AS o_year,
         floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue,
         count(*)::BIGINT AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2""",

    "map_project" ->
      """SELECT l_orderkey, l_linenumber,
         floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue FROM lineitem""",

    "filter_rows" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 30 AND l_returnflag = 'R'""",

    "flatten_explode" ->
      """SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
         FROM documents""",

    "reduce_global" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev FROM lineitem""",

    "reduce_per_key" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(avg(l_quantity), 4) AS avg_qty, count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "first_n" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "union_chain" ->
      """SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
         UNION ALL
         SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS src FROM supplier""",

    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "join_shuffle" ->
      """SELECT o_orderstatus, count(*) AS n_items, round(sum(l_extendedprice), 2) AS total
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderstatus""",

    "join_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority""",

    "join_anti" ->
      """SELECT o_orderstatus, count(*) AS n_orders
         FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderstatus""",

    "branch_fanout" ->
      """SELECT 'by_status' AS branch, o_orderstatus AS k, count(*) AS v FROM orders GROUP BY 2
         UNION ALL
         SELECT 'by_priority' AS branch, o_orderpriority AS k, count(*) AS v FROM orders GROUP BY 2""",

    "branch_router" ->
      """SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                     WHEN o_orderpriority = '2-HIGH' THEN 'high'
                     ELSE 'other' END AS branch,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1""",

    "branch_broadcast" ->
      """SELECT 'bigspender' AS branch, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_totalprice > 200000
         UNION ALL
         SELECT 'urgentish' AS branch, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""",

    "tap_observe" ->
      """SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'""",

    "compose_apply" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part WHERE p_size > 20""",

    "loop_converge" ->
      """WITH RECURSIVE r AS (
           SELECT o_orderkey, o_totalprice AS v, 0 AS it FROM orders
           UNION ALL
           SELECT o_orderkey, v / 2, it + 1 FROM r WHERE v > 1000 AND it < 32)
         SELECT o_orderkey, floor(v * 10000 + 0.5) / 10000 AS v FROM r
         WHERE v <= 1000 OR it = 32""",

    "catch_quarantine" ->
      """SELECT doc_id,
         CASE WHEN n_chars % 7 = 0 THEN NULL
              ELSE round(1000.0 / (n_chars % 7), 4) END AS result,
         CASE WHEN n_chars % 7 = 0 THEN 'error' ELSE 'ok' END AS status
         FROM documents""",

    "short_circuit" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag""",

    "context_broadcast" ->
      """SELECT event_type, count(*) AS n, round(sum(value * 3), 2) AS sum_scaled
         FROM events WHERE value * 3 > 100 GROUP BY event_type""",

    "buffer_repartition" ->
      """SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
         FROM events GROUP BY event_type""",

    "set_chunker" ->
      """SELECT o_orderkey % 8 AS chunk, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1""",

    "span_corrupt" -> {
      def mk(off: Int) =
        s"(((((doc_id * 1000003 + i - $off) % 2147483647) * 48271 + 11) % 2147483647) % 1000) < 150"
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
               AS toks FROM documents),
         m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
             list_transform(generate_series(1, len(toks)), i -> struct_pack(
               t := toks[i],
               m := ${mk(1)},
               rs := (${mk(1)}) AND (i = 1 OR NOT (${mk(2)})))) AS mk
           FROM t)
         SELECT doc_id, n_tokens,
           len(list_filter(mk, e -> e.m))::BIGINT AS n_masked,
           coalesce(array_to_string(list_filter(list_transform(mk, e ->
             CASE WHEN e.rs THEN '<X>' WHEN NOT e.m THEN e.t END),
             x -> x IS NOT NULL), ' '), '') AS corrupted_text,
           coalesce(array_to_string(list_filter(list_transform(mk, e ->
             CASE WHEN e.rs THEN '<X> ' || e.t WHEN e.m THEN e.t END),
             x -> x IS NOT NULL), ' '), '') AS target_text
         FROM m"""
    },

    "group_sample_topk" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source, row_number() OVER (
             PARTITION BY lang
             ORDER BY (doc_id * 48271 + 11) % 2147483647, doc_id) AS rk
           FROM documents) WHERE rk <= 50""",

  )
}
