package graft

/** DuckDB oracle SQL — corpus ops (sampling, packing, splits, sketches, ...).
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesCorpusQ {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    "quantile_sketch" ->
      """WITH b AS (SELECT greatest(0, least(floor(o_totalprice * 100 + 0.5)::BIGINT // 65536, 1023))
                      AS bin FROM orders),
         hist AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
         cum AS (SELECT bin, sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                   AS cum FROM hist),
         tot AS (SELECT sum(c)::BIGINT AS n FROM hist),
         ex AS (SELECT quantile_cont(floor(o_totalprice * 100 + 0.5)::BIGINT,
                  [0.5, 0.9, 0.99]) AS exs FROM orders),
         ranks AS (SELECT v.i AS qi, v.q AS q, ceil(v.q * n)::BIGINT AS rank
                   FROM tot CROSS JOIN (VALUES (1, 0.5), (2, 0.9), (3, 0.99)) AS v(i, q))
         SELECT q, rank, ((min(bin) + 1) * 65536)::DOUBLE / 100 AS est_upper,
           floor(exs[qi] / 100 * 10000 + 0.5) / 10000 AS exact
         FROM cum JOIN ranks ON cum >= rank CROSS JOIN ex
         GROUP BY qi, q, rank, exs""",

    // Replays the CMS bit-exactly: FNV token hash reduced into [0,p),
    // the engine's SplitMix64 permutation constants inlined per row,
    // counter sums, min-over-rows estimate
    "freq_sketch" -> {
      val (cas, cbs) = graft.functions.MinHashSig.coeffs(4)
      val cp = graft.functions.MinHashSig.P
      val rows = (0 until 4).map(i => s"($i, ${cas(i)}, ${cbs(i)})").mkString(", ")
      s"""WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
         h AS (SELECT tok, n,
                 ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                      THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                    % $cp) + $cp) % $cp)::BIGINT AS hh
               FROM (SELECT tok, n, ${duckFnv("tok")} AS hu FROM c)),
         sg AS (SELECT tok, n, p.i AS i, ((p.a * hh + p.b) % $cp) % 1024 AS slot
                FROM h CROSS JOIN (VALUES $rows) AS p(i, a, b)),
         cms AS (SELECT i, slot, sum(n)::BIGINT AS c FROM sg GROUP BY 1, 2),
         topk AS (SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 20)
         SELECT topk.tok, topk.n::BIGINT AS n_exact, min(cms.c) AS n_est
         FROM topk JOIN sg USING (tok) JOIN cms USING (i, slot)
         GROUP BY 1, 2"""
    },

    // Replays the sketch bit-exactly: FNV-1a per distinct token (the
    // vocabulary-once-then-join trick below), low-bits slot, linear-
    // counting MLE under the half-up floor protocol
    "cardinality_sketch" ->
      s"""WITH t AS (SELECT source AS g, unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM t),
         hashed AS (SELECT tok, (${duckFnv("tok")} % 4096)::BIGINT AS slot FROM vocab),
         sl AS (SELECT g, count(DISTINCT slot) AS v_filled
                FROM (SELECT DISTINCT g, tok FROM t) d JOIN hashed USING (tok)
                GROUP BY g),
         ex AS (SELECT g, count(DISTINCT tok) AS n_exact FROM t GROUP BY g)
         SELECT ex.g AS source, n_exact, v_filled,
           CASE WHEN v_filled < 4096
             THEN floor(-4096 * ln(1 - v_filled::DOUBLE / 4096) + 0.5)::BIGINT
             ELSE NULL END AS n_est
         FROM ex JOIN sl USING (g)""",

    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ((doc_id * 48271 + 11) % 2147483647) % 1000 <
           CASE lang WHEN 'en' THEN 800 WHEN 'es' THEN 500 WHEN 'de' THEN 500
                     WHEN 'fr' THEN 300 WHEN 'zh' THEN 100 ELSE 1000 END""",

    "weighted_sample" ->
      """WITH s AS (SELECT sum(n_chars)::BIGINT AS sum_w FROM documents),
         p AS (SELECT lang,
                 least(1000000, (n_chars::BIGINT * 2000 * 1000000) // sum_w)::BIGINT
                   AS p_micro,
                 ((doc_id * 48271 + 11) % 2147483647) % 1000000 AS u_micro
               FROM documents, s)
         SELECT lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN u_micro < p_micro THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(p_micro)::BIGINT AS expected_micro,
           (sum(CASE WHEN u_micro < p_micro THEN 1 ELSE 0 END) * 1000000
             - sum(p_micro))::BIGINT AS gap_micro
         FROM p GROUP BY 1""",

    // pack CTE re-aggregated: (shard, pack) totals -> clamped fill
    // decile histogram, all exact integers
    "pack_fill_report" ->
      """WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t),
         pk AS (SELECT shard, (cum - n_tokens) // 512 AS pack_id,
                  sum(n_tokens) AS pack_tokens, count(*) AS n_docs
                FROM c GROUP BY 1, 2)
         SELECT least(pack_tokens * 10 // 512, 10)::BIGINT AS fill_decile,
           count(*) AS n_packs, sum(n_docs)::BIGINT AS n_docs,
           sum(pack_tokens)::BIGINT AS total_tokens
         FROM pk GROUP BY 1""",

    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
         SELECT doc_id, shard, n_tokens, ((cum - n_tokens) // 512)::BIGINT AS pack_id
         FROM c""",

    "chunk_sliding" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
           FROM documents),
         z AS (SELECT doc_id, tk,
             greatest(1, CAST(ceil((len(tk) - 64) / 48.0) AS BIGINT) + 1) AS nc
           FROM t),
         i AS (SELECT doc_id, tk, unnest(range(0, nc)) AS chunk_id FROM z)
         SELECT doc_id, chunk_id,
           len(tk[chunk_id*48+1 : chunk_id*48+64])::BIGINT AS n_tokens,
           array_to_string(tk[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text
         FROM i""",

    // cut points are cumulative permille: train [0,900) val [900,950)
    // test [950,1000) over the same Lehmer bucket
    "split_assign" ->
      """SELECT CASE WHEN b < 900 THEN 'train'
                     WHEN b < 950 THEN 'val'
                     ELSE 'test' END AS split,
           count(*) AS n, min(doc_id) AS min_id
         FROM (SELECT doc_id,
                 ((doc_id * 48271 + 11) % 2147483647) % 1000 AS b
               FROM documents)
         GROUP BY 1""",

    "source_mixture_weights" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         t AS (SELECT list_reduce(list_prepend(0.0,
                 list(sqrt(n_docs::DOUBLE) ORDER BY source)),
                 (acc, x) -> acc + x) AS tot FROM c)
         SELECT c.source, c.n_docs,
           floor(sqrt(c.n_docs::DOUBLE) / t.tot * 1000000 + 0.5) / 1000000 AS weight
         FROM c, t""",

    "split_cluster_safe" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
                 FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id)
         SELECT doc_id, cluster,
           CASE WHEN b < 900 THEN 'train'
                WHEN b < 950 THEN 'val'
                ELSE 'test' END AS split
         FROM (SELECT doc_id, cluster,
                 ((cluster * 48271 + 11) % 2147483647) % 1000 AS b FROM lab)""",

    "shuffle_shards" ->
      """WITH s AS (SELECT doc_id,
             (((doc_id * 48271 + 11) % 2147483647) * 48271) % 2147483647 AS scramble
           FROM documents)
         SELECT doc_id, scramble % 8 AS shard,
           row_number() OVER (PARTITION BY scramble % 8
                              ORDER BY scramble, doc_id) AS pos
         FROM s""",

    // identical IEEE op order as capSources: floor(min(1, f·tot/cnt)·1000)
    "source_cap" ->
      """WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
         g AS (SELECT count(*) AS tot FROM documents),
         r AS (SELECT source, floor(least(1.0, 0.3 * tot / cnt) * 1000) AS permille
               FROM c, g)
         SELECT d.source, count(*) AS n_kept
         FROM documents d JOIN r USING (source)
         WHERE ((d.doc_id * 48271 + 11) % 2147483647) % 1000 < permille
         GROUP BY d.source""",

    "source_overlap" ->
      """WITH t AS (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT source, CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END sh FROM t),
         e AS (SELECT DISTINCT source, sh
               FROM (SELECT source, unnest(sh) AS sh FROM s)),
         sz AS (SELECT source, count(*) AS n FROM e GROUP BY 1),
         i AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
               FROM e a JOIN e b ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2)
         SELECT source_a, source_b, za.n AS n_a, zb.n AS n_b, n_inter,
           floor(n_inter::DOUBLE / (za.n + zb.n - n_inter) * 1000000 + 0.5) / 1000000
             AS jaccard
         FROM i JOIN sz za ON source_a = za.source JOIN sz zb ON source_b = zb.source""",

    "budget_select" ->
      """WITH t AS (SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY n_tokens DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens FROM t)
         SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM c WHERE cum_tokens <= 800""",

    "mixture_epochs" ->
      """WITH reps AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         nm AS (SELECT max(n) AS n_max FROM reps),
         f AS (SELECT lang,
                 CAST(ceil(sqrt(n_max::DOUBLE / n)) AS BIGINT) AS repeats
               FROM reps, nm)
         SELECT d.doc_id, d.lang, f.repeats,
           unnest(generate_series(1, f.repeats)) AS epoch
         FROM documents d JOIN f USING (lang)""",

    "cardinality_hll" -> {
      val m = 256
      val rhoCase = (1 to 32).map(r => s"WHEN w >= ${1L << (32 - r)} THEN $r")
        .mkString("CASE ", " ", " ELSE 33 END")
      s"""WITH t AS (SELECT source AS g, unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM t),
         hh AS (SELECT tok, ${duckFnv("tok")} AS h0 FROM vocab),
         ${duckFmixCtes()},
         hw AS (SELECT tok, (h // ${1L << 56})::BIGINT AS j,
                  ((h // ${1L << 24}) % ${1L << 32})::BIGINT AS w FROM f5),
         rr AS (SELECT tok, j, $rhoCase AS r FROM hw),
         dt AS (SELECT DISTINCT g, tok FROM t),
         regs AS (SELECT g, j, max(r) AS mreg FROM dt JOIN rr USING (tok) GROUP BY 1, 2),
         gs AS (SELECT DISTINCT g FROM t),
         fl AS (SELECT gs.g, s.j, coalesce(regs.mreg, 0) AS mreg
                FROM gs CROSS JOIN generate_series(0, ${m - 1}) s(j)
                LEFT JOIN regs ON regs.g = gs.g AND regs.j = s.j),
         z AS (SELECT g, sum(1::BIGINT << (33 - mreg))::BIGINT AS z_scaled,
                 sum(CASE WHEN mreg = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero
               FROM fl GROUP BY 1),
         ex AS (SELECT g, count(DISTINCT tok) AS n_exact FROM t GROUP BY 1),
         e AS (SELECT g, z_scaled, v_zero,
                 0.7213 / (1.0 + (1.079 / ${m.toDouble})) * ${(m * m).toDouble}
                   * 8589934592.0 / z_scaled::DOUBLE AS eraw FROM z)
         SELECT ex.g AS source, n_exact::BIGINT AS n_exact,
           CASE WHEN eraw <= ${2.5 * m} AND v_zero > 0
             THEN floor(${m.toDouble} * ln(${m.toDouble} / v_zero::DOUBLE) + 0.5)
             ELSE floor(eraw + 0.5) END::BIGINT AS n_est_hll
         FROM ex JOIN e USING (g)"""
    },

    "column_stats" -> {
      val m = 256
      val rhoCase = (1 to 32).map(r => s"WHEN w >= ${1L << (32 - r)} THEN $r")
        .mkString("CASE ", " ", " ELSE 33 END")
      s"""WITH pairs AS (
           SELECT 'lang' AS g, lang::VARCHAR AS v FROM documents
           UNION ALL SELECT 'source', source::VARCHAR FROM documents
           UNION ALL SELECT 'doc_id', doc_id::VARCHAR FROM documents
           UNION ALL SELECT 'n_chars', n_chars::VARCHAR FROM documents),
         basic AS (SELECT g, count(*)::BIGINT AS n_rows,
             sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             min(v) AS min_str, max(v) AS max_str,
             sum(CASE WHEN v IS NULL THEN 0 ELSE length(v) END)::BIGINT AS sum_len
           FROM pairs GROUP BY 1),
         vocab AS (SELECT DISTINCT v AS tok FROM pairs WHERE v IS NOT NULL),
         hh AS (SELECT tok, ${duckFnv("tok")} AS h0 FROM vocab),
         ${duckFmixCtes()},
         hw AS (SELECT tok, (h // ${1L << 56})::BIGINT AS j,
                  ((h // ${1L << 24}) % ${1L << 32})::BIGINT AS w FROM f5),
         rr AS (SELECT tok, j, $rhoCase AS r FROM hw),
         dt AS (SELECT DISTINCT g, v AS tok FROM pairs WHERE v IS NOT NULL),
         regs AS (SELECT g, j, max(r) AS mreg FROM dt JOIN rr USING (tok) GROUP BY 1, 2),
         zs AS (SELECT g,
             (sum(1::BIGINT << (33 - mreg)) + ($m - count(*)) * (1::BIGINT << 33))::BIGINT
               AS z_scaled,
             ($m - count(*))::BIGINT AS v_zero FROM regs GROUP BY 1),
         es AS (SELECT g, v_zero,
             0.7213 / (1.0 + (1.079 / ${m.toDouble})) * ${(m * m).toDouble}
               * 8589934592.0 / z_scaled::DOUBLE AS eraw FROM zs),
         sing AS (SELECT g,
             CASE WHEN eraw <= ${2.5 * m} AND v_zero > 0
               THEN floor(${m.toDouble} * ln(${m.toDouble} / v_zero::DOUBLE) + 0.5)
               ELSE floor(eraw + 0.5) END::BIGINT AS ndv_est_hll FROM es),
         ex AS (SELECT g, count(DISTINCT v)::BIGINT AS ndv_exact
                FROM pairs WHERE v IS NOT NULL GROUP BY 1)
         SELECT b.g AS col_name, n_rows, n_nulls,
           coalesce(ex.ndv_exact, 0)::BIGINT AS ndv_exact,
           coalesce(sing.ndv_est_hll, 0)::BIGINT AS ndv_est_hll,
           min_str, max_str,
           ((sum_len * 1000000) // greatest(n_rows, 1))::BIGINT AS avg_len_micro
         FROM basic b LEFT JOIN ex USING (g) LEFT JOIN sing USING (g)"""
    },

    "source_overlap_hll" -> {
      val m = 256
      val rhoCase = (1 to 32).map(r => s"WHEN w >= ${1L << (32 - r)} THEN $r")
        .mkString("CASE ", " ", " ELSE 33 END")
      // sparse z: absent registers contribute 2^33 to the sum and 1 to
      // v_zero — identical integers to the dense 0-filled form
      def zAgg(keys: String) =
        s"""SELECT $keys,
            (sum(1::BIGINT << (33 - mreg)) + ($m - count(*)) * (1::BIGINT << 33))::BIGINT
              AS z_scaled,
            ($m - count(*))::BIGINT AS v_zero"""
      val eraw = s"0.7213 / (1.0 + (1.079 / ${m.toDouble})) * ${(m * m).toDouble}" +
        s" * 8589934592.0 / z_scaled::DOUBLE"
      val estCase = s"""CASE WHEN eraw <= ${2.5 * m} AND v_zero > 0
             THEN floor(${m.toDouble} * ln(${m.toDouble} / v_zero::DOUBLE) + 0.5)
             ELSE floor(eraw + 0.5) END::BIGINT"""
      s"""WITH t AS (SELECT source AS g, unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM t),
         hh AS (SELECT tok, ${duckFnv("tok")} AS h0 FROM vocab),
         ${duckFmixCtes()},
         hw AS (SELECT tok, (h // ${1L << 56})::BIGINT AS j,
                  ((h // ${1L << 24}) % ${1L << 32})::BIGINT AS w FROM f5),
         rr AS (SELECT tok, j, $rhoCase AS r FROM hw),
         dt AS (SELECT DISTINCT g, tok FROM t),
         regs AS (SELECT g, j, max(r) AS mreg FROM dt JOIN rr USING (tok) GROUP BY 1, 2),
         zs AS (${zAgg("g")} FROM regs GROUP BY 1),
         es AS (SELECT g, v_zero, $eraw AS eraw FROM zs),
         sing AS (SELECT g, $estCase AS est FROM es),
         gs AS (SELECT DISTINCT g FROM regs),
         pairs AS (SELECT a.g AS source_a, b.g AS source_b
                   FROM gs a JOIN gs b ON a.g < b.g),
         uregs AS (SELECT p.source_a, p.source_b, r.j, max(r.mreg) AS mreg
                   FROM pairs p JOIN regs r ON r.g = p.source_a OR r.g = p.source_b
                   GROUP BY 1, 2, 3),
         zu AS (${zAgg("source_a, source_b")} FROM uregs GROUP BY 1, 2),
         eu AS (SELECT source_a, source_b, v_zero, $eraw AS eraw FROM zu),
         un AS (SELECT source_a, source_b, $estCase AS est_union FROM eu),
         dh AS (SELECT DISTINCT t.g, f5.h FROM t JOIN f5 USING (tok)),
         inter AS (SELECT a.g AS source_a, b.g AS source_b,
                     count(*)::BIGINT AS n_inter_exact
                   FROM dh a JOIN dh b ON a.h = b.h AND a.g < b.g GROUP BY 1, 2)
         SELECT p.source_a, p.source_b,
           coalesce(i.n_inter_exact, 0)::BIGINT AS n_inter_exact,
           sa.est AS est_a, sb.est AS est_b, u.est_union,
           greatest(sa.est + sb.est - u.est_union, 0)::BIGINT AS n_inter_est,
           CASE WHEN coalesce(i.n_inter_exact, 0) = 0 THEN NULL
             ELSE floor((greatest(sa.est + sb.est - u.est_union, 0)
                 - i.n_inter_exact)::DOUBLE / i.n_inter_exact * 1000000 + 0.5)
               / 1000000 END AS inter_err
         FROM pairs p
         JOIN sing sa ON sa.g = p.source_a
         JOIN sing sb ON sb.g = p.source_b
         JOIN un u ON u.source_a = p.source_a AND u.source_b = p.source_b
         LEFT JOIN inter i ON i.source_a = p.source_a AND i.source_b = p.source_b"""
    },

    "join_size_estimate" -> {
      val (cas, cbs) = graft.functions.MinHashSig.coeffs(4)
      val cp = graft.functions.MinHashSig.P
      val rows = (0 until 4).map(i => s"($i, ${cas(i)}, ${cbs(i)})").mkString(", ")
      def side(table: String, key: String, where: String, n: String, out: String) =
        s"""${out}0 AS (SELECT CAST($key AS VARCHAR) AS k, count(*) AS $n
               FROM $table $where GROUP BY 1),
           ${out}h AS (SELECT k, $n,
                 ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                      THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                    % $cp) + $cp) % $cp)::BIGINT AS hh
               FROM (SELECT k, $n, ${duckFnv("k")} AS hu FROM ${out}0)),
           s$out AS (SELECT p.i AS i, ((p.a * hh + p.b) % $cp) % 1024 AS slot,
                 sum($n)::BIGINT AS c$out
               FROM ${out}h CROSS JOIN (VALUES $rows) AS p(i, a, b) GROUP BY 1, 2)"""
      s"""WITH ${side("lineitem", "l_orderkey", "", "na", "a")},
         ${side("orders", "o_orderkey", "WHERE o_orderpriority = '1-URGENT'", "nb", "b")},
         ex AS (SELECT coalesce(sum(a0.na * b0.nb), 0)::BIGINT AS n_exact
                FROM a0 JOIN b0 USING (k)),
         e AS (SELECT i, sum(ca * cb)::BIGINT AS est_i
               FROM sa JOIN sb USING (i, slot) GROUP BY 1),
         m AS (SELECT CASE WHEN count(*) < 4 THEN 0
                 ELSE min(est_i) END::BIGINT AS n_est FROM e)
         SELECT n_exact, n_est,
           CASE WHEN n_exact = 0 THEN NULL
             ELSE floor((n_est - n_exact)::DOUBLE / n_exact * 1000000 + 0.5) / 1000000
           END AS err
         FROM ex, m"""
    },

  )
}
