package graft

/** DuckDB oracle SQL — curation + skew + graph (bloom, BM25, ER, Z-order, PageRank, ...).
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesCuration {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    // the composed curation chain replayed closed-form, stage for
    // stage: gopher gate (gopher_rules CTEs) → normalized-hash min-id
    // winners (dedup_normalized's group) → exact Jaccard ≥0.8 pairs +
    // recursive-CTE components over the SURVIVOR set, min-id rep →
    // bigram-LM perplexity + per-lang tertile buckets computed over
    // the CLEANED corpus (the LM shifts with upstream filters — the
    // composition being graded) → Lehmer split on the cluster label
    "curation_e2e" ->
      """WITH RECURSIVE
         t0 AS (SELECT doc_id, lang, text,
                  list_filter(string_split(text, ' '), x -> x <> '') toks
                FROM documents),
         gm AS (SELECT doc_id, lang, text, toks, len(toks) AS n,
             list_sum(list_transform(toks, x -> length(x))) AS char_sum,
             len(list_filter(toks,
               x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
             length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
               greatest(length(text), 1) AS digit_ratio,
             len(list_distinct(toks)) AS n_dist
           FROM t0),
         gated AS (SELECT doc_id, lang, text, toks FROM gm
           WHERE (n BETWEEN 5 AND 1000)
             AND (char_sum::DOUBLE / greatest(n, 1) BETWEEN 2.0 AND 10.0)
             AND stops >= 2 AND digit_ratio < 0.1
             AND n_dist::DOUBLE / greatest(n, 1) >= 0.3),
         exw AS (SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM gated
                 GROUP BY trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))),
         exd AS (SELECT g.doc_id, g.lang, g.toks, e.n_copies
                 FROM gated g JOIN exw e USING (doc_id)),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM exd),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         lab AS (SELECT d.doc_id,
                   least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
                 FROM exd d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id),
         surv AS (SELECT exd.doc_id, exd.lang, exd.toks, exd.n_copies, lab.cluster
                  FROM exd JOIN lab USING (doc_id) WHERE lab.doc_id = lab.cluster),
         bb0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
                 FROM surv WHERE len(toks) >= 2),
         bb AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bb0),
         c AS (SELECT w1, w2, count(*) AS n_bigram FROM bb GROUP BY 1, 2),
         pr AS (SELECT w1, sum(n_bigram)::BIGINT AS n_prefix FROM c GROUP BY 1),
         lm AS (SELECT c.w1, c.w2,
                  floor(-log2(n_bigram::DOUBLE / n_prefix) * 1000000 + 0.5)::BIGINT
                    AS ubits
                FROM c JOIN pr USING (w1)),
         ppl AS (SELECT doc_id, floor(sum(ubits)::DOUBLE / count(*) + 0.5) / 1000000
                   AS avg_bits
                 FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id),
         sc AS (SELECT surv.doc_id, surv.lang, surv.cluster, surv.n_copies, ppl.avg_bits
                FROM surv JOIN ppl USING (doc_id)),
         thr AS (SELECT lang, quantile_cont(avg_bits, 1.0 / 3) AS t1,
                   quantile_cont(avg_bits, 2.0 / 3) AS t2
                 FROM sc GROUP BY lang)
         SELECT sc.doc_id, sc.n_copies::BIGINT AS n_copies, sc.cluster, sc.lang,
           avg_bits,
           CASE WHEN avg_bits <= t1 THEN 'head'
                WHEN avg_bits <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CASE WHEN ((cluster * 48271 + 11) % 2147483647) % 1000 < 900 THEN 'train'
                WHEN ((cluster * 48271 + 11) % 2147483647) % 1000 < 950 THEN 'val'
                ELSE 'test' END AS split
         FROM sc JOIN thr USING (lang)""",

    "skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "skew_two_phase" ->
      """SELECT l_partkey AS k, round(sum(l_quantity), 2) AS total
         FROM lineitem GROUP BY l_partkey""",

    "hot_key_report" ->
      """WITH c AS (SELECT user_id AS k, count(*)::BIGINT AS n
                    FROM events GROUP BY 1),
         t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM c)
         SELECT k, n, ((n * 1000) // total)::BIGINT AS share_permille,
           ((n * n_keys * 1000000) // total)::BIGINT AS skew_ratio_micro
         FROM c, t ORDER BY n DESC, k ASC LIMIT 20""",

    "join_skew_hub" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem JOIN orders
           ON (CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE l_orderkey END) = o_orderkey
         GROUP BY o_orderstatus""",

    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS u, b.l_partkey AS v
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2),
         d AS (SELECT node, count(*) AS deg
               FROM (SELECT u AS node FROM p UNION ALL SELECT v FROM p) GROUP BY 1),
         o AS (SELECT CASE WHEN (da.deg, p.u) < (db.deg, p.v) THEN p.u ELSE p.v END AS s,
                 CASE WHEN (da.deg, p.u) < (db.deg, p.v) THEN p.v ELSE p.u END AS t
               FROM p JOIN d da ON da.node = p.u JOIN d db ON db.node = p.v),
         w AS (SELECT o1.t AS x, o2.t AS y
               FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t)
         SELECT count(*)::BIGINT AS n_triangles FROM w
         WHERE EXISTS (SELECT 1 FROM p WHERE p.u = w.x AND p.v = w.y)""",

    "graph_pagerank" -> {
      def it(prev: String, cur: String) =
        s"""$cur AS (SELECT e.dst AS node,
              CAST(150000 + (85 * sum(r.r // deg.d)) // 100 AS BIGINT) AS r
            FROM e JOIN deg ON deg.src = e.src JOIN $prev r ON r.node = e.src
            GROUP BY e.dst)"""
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 3),
         e AS (SELECT pa AS src, pb AS dst FROM p UNION ALL SELECT pb, pa FROM p),
         deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         r0 AS (SELECT DISTINCT src AS node, 1000000::BIGINT AS r FROM e),
         ${it("r0", "r1")}, ${it("r1", "r2")}, ${it("r2", "r3")},
         ${it("r3", "r4")}, ${it("r4", "r5")}
         SELECT node AS part, r AS rank_e6 FROM r5"""
    },

    "bloom_semi_join" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n, sum(l_quantity) AS sum_qty
         FROM lineitem
         WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY 1""",

    "bm25_topk" ->
      """WITH t AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM t),
         s AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
           sum(CASE WHEN list_contains(toks, 'spark')  THEN 1 ELSE 0 END)::BIGINT AS df_0,
           sum(CASE WHEN list_contains(toks, 'hash')   THEN 1 ELSE 0 END)::BIGINT AS df_1,
           sum(CASE WHEN list_contains(toks, 'merge')  THEN 1 ELSE 0 END)::BIGINT AS df_2,
           sum(CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END)::BIGINT AS df_3
           FROM d),
         i AS (SELECT *,
           floor(ln((n_docs::DOUBLE - df_0::DOUBLE + 0.5) / (df_0::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_0,
           floor(ln((n_docs::DOUBLE - df_1::DOUBLE + 0.5) / (df_1::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_1,
           floor(ln((n_docs::DOUBLE - df_2::DOUBLE + 0.5) / (df_2::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_2,
           floor(ln((n_docs::DOUBLE - df_3::DOUBLE + 0.5) / (df_3::DOUBLE + 0.5) + 1.0) * 1000000 + 0.5) / 1000000 AS idf_3
           FROM s),
         c AS (SELECT doc_id,
           len(list_filter(toks, x -> x = 'spark'))::DOUBLE  AS tf0,
           len(list_filter(toks, x -> x = 'hash'))::DOUBLE   AS tf1,
           len(list_filter(toks, x -> x = 'merge'))::DOUBLE  AS tf2,
           len(list_filter(toks, x -> x = 'window'))::DOUBLE AS tf3,
           0.25 + 0.75 * (dl::DOUBLE * (SELECT n_docs FROM i)::DOUBLE / (SELECT sum_dl FROM i)::DOUBLE) AS dn
           FROM d),
         sc AS (SELECT doc_id, floor((
             (SELECT idf_0 FROM i) * tf0 * 2.2 / (tf0 + 1.2 * dn)
           + (SELECT idf_1 FROM i) * tf1 * 2.2 / (tf1 + 1.2 * dn)
           + (SELECT idf_2 FROM i) * tf2 * 2.2 / (tf2 + 1.2 * dn)
           + (SELECT idf_3 FROM i) * tf3 * 2.2 / (tf3 + 1.2 * dn)
           ) * 1000000 + 0.5)::BIGINT AS score_u FROM c)
         SELECT doc_id, score_u FROM sc WHERE score_u > 0
         ORDER BY score_u DESC, doc_id LIMIT 50""",

    "er_blocked_pairs" ->
      """WITH p AS (SELECT doc_id, lang, source, substr(text, 1, 32) AS pref FROM documents),
         r AS (SELECT *, row_number() OVER (PARTITION BY lang, source
                 ORDER BY pref, doc_id) AS rn FROM p),
         a AS (SELECT r.*, floor((rn - 1) / 8)::BIGINT + x.o AS buck
               FROM r, (VALUES (0), (1)) x(o)),
         b AS (SELECT r.*, floor((rn - 1) / 8)::BIGINT AS buck FROM r),
         j AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
                 greatest(a.doc_id, b.doc_id) AS id_b,
                 levenshtein(a.pref, b.pref) AS dist
               FROM a JOIN b ON a.lang = b.lang AND a.source = b.source
                 AND a.buck = b.buck AND b.rn > a.rn AND b.rn - a.rn <= 8)
         SELECT id_a, id_b, dist::BIGINT AS dist FROM j WHERE dist <= 18""",

    "zorder_layout" -> s"""
         WITH m AS (SELECT l_partkey % 65536 AS zx, l_suppkey % 65536 AS zy FROM lineitem),
         z AS (SELECT zx, zy, ${(0 until 16).map(i =>
           s"(((zx >> $i) & 1) << ${2 * i}) + (((zy >> $i) & 1) << ${2 * i + 1})")
           .mkString(" + ")} AS zval FROM m)
         SELECT (zval >> 26)::INTEGER AS file_id, count(*)::BIGINT AS n_rows,
           min(zx) AS x_min, max(zx) AS x_max, min(zy) AS y_min, max(zy) AS y_max
         FROM z GROUP BY 1"""
  )
}
