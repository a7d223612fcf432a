package graft

/** DuckDB oracle SQL — embedding similarity (cosine LSH, ANN, semdedup, kNN, ...).
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesSimilarityQ {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    // Replays the self-scaling banded path exactly: bits from the
    // integer count rule, the ±1 sign matrix as a literal, per-table
    // index-order-folded projections — so the candidate SET (not just
    // the verified pairs) is pinned by the hash match.
    "neardup_cosine_bucketed" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()}
         SELECT id_a, id_b, round(cs, 6) AS cosine FROM bpairs WHERE cs >= 0.4""",

    // Threshold operating-curve replay: the same banded candidate CTEs,
    // then one multi-conditional aggregate over bpairs unrolled to one
    // row per ladder point — n_candidates is threshold-independent by
    // construction, n_pairs/pair_rate pin the verify mass per theta.
    "neardup_cosine_rate_curve" -> {
      val ths = Seq(0.3, 0.4, 0.5, 0.6, 0.7)
      val rows = ths.map { t =>
        s"""SELECT $t AS threshold, tot.n_candidates,
             (SELECT count(*) FROM bp WHERE cs >= $t)::BIGINT AS n_pairs,
             floor((SELECT count(*) FROM bp WHERE cs >= $t)::DOUBLE
               / greatest(tot.n_candidates, 1)::DOUBLE * 10000 + 0.5) / 10000
               AS pair_rate
           FROM tot"""
      }.mkString("\nUNION ALL\n")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()},
         bp AS MATERIALIZED (SELECT * FROM bpairs),
         tot AS (SELECT count(*)::BIGINT AS n_candidates FROM bp)
         $rows"""
    },

    // Deployed-parameter recall harness replay: exact pairs on the
    // id%2 sample, banded pairs via the same bits-from-n + sign-matrix
    // CTEs, recall from the two exact integer counts.
    "lsh_recall_eval_deployed" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()},
         lshp AS (SELECT id_a, id_b FROM bpairs WHERE cs >= 0.4),
         ssm AS (SELECT greatest(2, (count(*) + 2047) // 2048) AS m FROM v),
         sv AS (SELECT v.* FROM v, ssm WHERE vec_id % ssm.m = 0),
         ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM sv a JOIN sv b ON a.vec_id < b.vec_id
                WHERE ${duckCos("a.e", "b.e")} >= 0.4),
         h AS (SELECT count(*) AS n_hit FROM ex
               WHERE EXISTS (SELECT 1 FROM lshp
                             WHERE lshp.id_a = ex.id_a AND lshp.id_b = ex.id_b)),
         t AS (SELECT count(*) AS n_exact FROM ex)
         SELECT (SELECT nb FROM bpar)::BIGINT AS n_bits, n_exact, n_hit,
           CASE WHEN n_exact = 0 THEN 1.0
                ELSE floor(n_hit::DOUBLE / n_exact * 10000 + 0.5) / 10000 END AS recall
         FROM t, h""",

    // batch×corpus banded replay: bits from the CORPUS-side count,
    // candidates only across the new/old boundary — the oracle pins
    // that no corpus×corpus (or batch×batch) pair can ever appear
    "neardup_cosine_incremental" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes(6, "WHERE vec_id % 10 <> 0")},
         icand AS (SELECT a.vec_id AS id_new, b.vec_id AS id_old
                   FROM bbv a JOIN bbv b
                     ON a.tbl = b.tbl AND a.bucket = b.bucket
                     AND a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0
                   GROUP BY 1, 2),
         ip AS (SELECT c.id_new, c.id_old, ${duckCos("va.e", "vb.e")} AS cs
                FROM icand c JOIN v va ON va.vec_id = c.id_new
                JOIN v vb ON vb.vec_id = c.id_old)
         SELECT id_new, id_old, round(cs, 6) AS cosine FROM ip WHERE cs >= 0.4""",

    // max over bit-identical per-pair cosines is order-independent,
    // so the aggregate max equals the packed-array row-local max
    "decontaminate_semantic" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         bench AS (SELECT vec_id, e FROM v WHERE vec_id < 10),
         corp AS (SELECT vec_id, e FROM v WHERE vec_id >= 10),
         m AS (SELECT c.vec_id, max(${duckCos("c.e", "b.e")}) AS mc
               FROM corp c CROSS JOIN bench b GROUP BY c.vec_id)
         SELECT vec_id, floor(mc * 1000000 + 0.5) / 1000000 AS max_cos,
           mc >= 0.35 AS contaminated
         FROM m""",

    // Replays the native hyperplane bucketing exactly: the ±1 sign
    // matrix is embedded as literals (same SplitMix64 derivation as
    // the kernel), and each projection folds in index order, so the
    // bucket bits — and therefore the candidate set — are identical.
    "neardup_cosine_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         bv AS (SELECT vec_id, e, ${(0 until 8).map(b =>
        s"(CASE WHEN ${duckHyperplaneProj(b, 64)} > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")} AS bucket FROM v),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${duckCos("a.e", "b.e")} AS c
               FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(c, 6) AS cosine FROM p WHERE c >= 0.4""",

    // Lehmer rounds and pool filter replayed verbatim; positives from
    // the exact top-1; slot = rank within the anchor's sampled pool.
    "contrastive_triplets" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         a AS (SELECT vec_id AS anchor_id, e AS ae FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id, e AS ce FROM v WHERE vec_id >= 10),
         pos AS (SELECT anchor_id, pos_id, pos_cos FROM (
                   SELECT a.anchor_id, c.vec_id AS pos_id,
                     ${duckCos("a.ae", "c.ce")} AS pos_cos,
                     row_number() OVER (PARTITION BY a.anchor_id
                       ORDER BY ${duckCos("a.ae", "c.ce")} DESC, c.vec_id) AS rn
                   FROM a, c) WHERE rn = 1),
         ai AS (SELECT anchor_id,
                  row_number() OVER (ORDER BY anchor_id) - 1 AS aidx FROM a),
         s1 AS (SELECT vec_id AS neg_id,
                  (vec_id * 48271) % 2147483647 AS l1 FROM c),
         s2 AS (SELECT neg_id, l1 % 10 AS aidx,
                  (l1 * 48271) % 2147483647 AS l2 FROM s1),
         pool AS (SELECT * FROM s2 WHERE l2 % 1000 < 250),
         slotted AS (SELECT neg_id, aidx,
                       row_number() OVER (PARTITION BY aidx
                         ORDER BY l2, neg_id) AS slot FROM pool)
         SELECT ai.anchor_id, p.pos_id, round(p.pos_cos, 6) AS pos_cos,
           s.neg_id, s.slot::BIGINT AS slot
         FROM slotted s JOIN ai USING (aidx) JOIN pos p USING (anchor_id)
         WHERE s.slot <= 3 AND s.neg_id <> p.pos_id""",

    // Multi-table replay: the same hyperplane sign matrix, bits
    // t·8..t·8+7 per table, pair kept on collision in ANY table
    // (UNION dedups), exact cosine verify.
    "neardup_cosine_lsh_multi" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         lmb AS (SELECT ${(1 to 16).map(b => s"WHEN m <= ${1L << b} THEN $b")
        .mkString("CASE ", " ", " ELSE 16 END")} AS nb
                 FROM (SELECT (count(*) + 63) // 64 AS m FROM v)),
         lms AS (SELECT ${duckSignMatrix(3 * 16, 64)} AS sm),
         lmv AS (SELECT vec_id, e, tt.tbl,
                   list_sum(list_transform(generate_series(1, nb),
                     j -> CASE WHEN list_reduce(list_prepend(0.0,
                                 list_transform(generate_series(1, len(e)),
                                   i -> e[i] * sm[tbl * nb + j][i])), (acc, x) -> acc + x) > 0
                               THEN 2 ** (j - 1) ELSE 0 END))::BIGINT AS bucket
                 FROM v, lms, lmb, generate_series(0, 2) tt(tbl)),
         lmc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM lmv a JOIN lmv b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
         p AS (SELECT c.id_a, c.id_b, ${duckCos("va.e", "vb.e")} AS cs
               FROM lmc c JOIN v va ON va.vec_id = c.id_a
               JOIN v vb ON vb.vec_id = c.id_b)
         SELECT id_a, id_b, round(cs, 6) AS cosine FROM p WHERE cs >= 0.4""",

    // Recall harness oracle: exact pairs on the id%2 sample, LSH pairs
    // via the same hyperplane replay as neardup_cosine_lsh, recall
    // from the two exact integer counts.
    "lsh_recall_eval" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         sm AS (SELECT greatest(2, (count(*) + 2047) // 2048) AS m FROM v),
         sv AS (SELECT v.* FROM v, sm WHERE vec_id % sm.m = 0),
         ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM sv a JOIN sv b ON a.vec_id < b.vec_id
                WHERE ${duckCos("a.e", "b.e")} >= 0.4),
         bv AS (SELECT vec_id, e, ${(0 until 8).map(b =>
        s"(CASE WHEN ${duckHyperplaneProj(b, 64)} > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")} AS bucket FROM v),
         lsh AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                 WHERE ${duckCos("a.e", "b.e")} >= 0.4),
         h AS (SELECT count(*) AS n_hit FROM ex
               WHERE EXISTS (SELECT 1 FROM lsh
                             WHERE lsh.id_a = ex.id_a AND lsh.id_b = ex.id_b)),
         t AS (SELECT count(*) AS n_exact FROM ex)
         SELECT n_exact, n_hit,
           CASE WHEN n_exact = 0 THEN 1.0
                ELSE floor(n_hit::DOUBLE / n_exact * 10000 + 0.5) / 10000 END AS recall
         FROM t, h""",

    "ann_ivf" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, e AS ce FROM v WHERE vec_id >= 10),
         ct AS (SELECT neighbor_id AS cell_id, ce AS cte FROM c ORDER BY neighbor_id LIMIT 16),
         asg AS (SELECT neighbor_id, ce, cell_id FROM (
                   SELECT c.neighbor_id, c.ce, ct.cell_id,
                     row_number() OVER (PARTITION BY c.neighbor_id
                       ORDER BY ${duckCos("c.ce", "ct.cte")} DESC, ct.cell_id) AS rn
                   FROM c, ct) WHERE rn = 1),
         pr AS (SELECT query_id, qe, cell_id FROM (
                  SELECT q.query_id, q.qe, ct.cell_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY ${duckCos("q.qe", "ct.cte")} DESC, ct.cell_id) AS rn
                  FROM q, ct) WHERE rn <= 4),
         cand AS (SELECT pr.query_id, asg.neighbor_id, ${duckCos("pr.qe", "asg.ce")} AS cosine
                  FROM asg JOIN pr USING (cell_id)),
         r AS (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
         SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM r
         WHERE rank <= 5""",

    // IVF assignment/probes replayed as in ann_ivf; PQ codes as in
    // embed_pq_encode (argmin per corpus sub-vector); coarse score =
    // integer sum of floor(d2·1e9+0.5) table entries; exact rerank.
    "ann_ivf_pq" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, e AS ce FROM v WHERE vec_id >= 10),
         ct AS (SELECT neighbor_id AS cell_id, ce AS cte FROM c ORDER BY neighbor_id LIMIT 16),
         asg AS (SELECT neighbor_id, cell_id FROM (
                   SELECT c.neighbor_id, ct.cell_id,
                     row_number() OVER (PARTITION BY c.neighbor_id
                       ORDER BY ${duckCos("c.ce", "ct.cte")} DESC, ct.cell_id) AS rn
                   FROM c, ct) WHERE rn = 1),
         pr AS (SELECT query_id, cell_id FROM (
                  SELECT q.query_id, ct.cell_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY ${duckCos("q.qe", "ct.cte")} DESC, ct.cell_id) AS rn
                  FROM q, ct) WHERE rn <= 4),
         sp AS (SELECT s FROM generate_series(0, 7) t(s)),
         cbs AS (SELECT cb0.code, sp.s AS subspace, cb0.ce[sp.s*8+1 : sp.s*8+8] AS cv
                 FROM (SELECT neighbor_id AS code, ce FROM c
                       ORDER BY neighbor_id LIMIT 16) cb0, sp),
         csub AS (SELECT neighbor_id, s AS subspace, ce[s*8+1 : s*8+8] AS sv FROM c, sp),
         codes AS (SELECT neighbor_id, subspace, code FROM (
                     SELECT csub.neighbor_id, csub.subspace, cbs.code,
                       row_number() OVER (PARTITION BY csub.neighbor_id, csub.subspace
                         ORDER BY list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8),
                           i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), (acc, x) -> acc + x),
                         cbs.code) AS rn
                     FROM csub JOIN cbs USING (subspace)) WHERE rn = 1),
         dt AS (SELECT query_id, subspace, code,
                  CAST(floor(list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8),
                    i -> (qsv[i] - cv[i]) * (qsv[i] - cv[i]))), (acc, x) -> acc + x)
                    * 1000000000 + 0.5) AS BIGINT) AS d2_e9
                FROM (SELECT query_id, s AS subspace, qe[s*8+1 : s*8+8] AS qsv FROM q, sp)
                JOIN cbs USING (subspace)),
         cand AS (SELECT pr.query_id, asg.neighbor_id FROM asg JOIN pr USING (cell_id)),
         ad AS (SELECT query_id, neighbor_id, CAST(sum(d2_e9) AS BIGINT) AS adist
                FROM cand JOIN codes USING (neighbor_id)
                JOIN dt USING (query_id, subspace, code)
                GROUP BY query_id, neighbor_id),
         sl AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY adist, neighbor_id) AS srn FROM ad) WHERE srn <= 20),
         rr AS (SELECT sl.query_id, sl.neighbor_id, ${duckCos("q.qe", "c.ce")} AS cosine
                FROM sl JOIN q USING (query_id) JOIN c USING (neighbor_id))
         SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
           SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS rank FROM rr)
         WHERE rank <= 5""",

    // trained-IVF recall: the 3 Lloyd iterations unroll as CTE blocks
    // (assign = argmax cosine over the previous centroids; update =
    // integer-frozen per-dim means, the same 2⁻²⁰-unit sums / single
    // division the Spark side computes), then the deployed IVF top-5
    // and the brute-force top-5 intersect as exact integer counts
    "ann_recall_eval" -> {
      val iters = 3
      def step(i: Int) =
        s"""asg$i AS (SELECT neighbor_id, ce, cell_id FROM (
               SELECT c.neighbor_id, c.ce, p.cell_id,
                 row_number() OVER (PARTITION BY c.neighbor_id
                   ORDER BY ${duckCos("c.ce", "p.cte")} DESC, p.cell_id) AS rn
               FROM c, ct${i - 1} p) WHERE rn = 1),
           cm$i AS (SELECT cell_id, d,
                 CAST(sum(CAST(floor(ce[d] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) * 1048576 AS DOUBLE) AS m
               FROM asg$i, generate_series(1, 64) t(d) GROUP BY cell_id, d),
           ct$i AS (SELECT cell_id, list(m ORDER BY d) AS cte FROM cm$i GROUP BY cell_id)"""
      val loops = (1 to iters).map(step).mkString(",\n")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, e AS ce FROM v WHERE vec_id >= 10),
         ct0 AS (SELECT row_number() OVER (ORDER BY neighbor_id) AS cell_id, ce AS cte
                 FROM (SELECT neighbor_id, ce FROM c ORDER BY neighbor_id LIMIT 16)),
         $loops,
         fasg AS (SELECT neighbor_id, ce, cell_id FROM (
               SELECT c.neighbor_id, c.ce, p.cell_id,
                 row_number() OVER (PARTITION BY c.neighbor_id
                   ORDER BY ${duckCos("c.ce", "p.cte")} DESC, p.cell_id) AS rn
               FROM c, ct$iters p) WHERE rn = 1),
         pr AS (SELECT query_id, qe, cell_id FROM (
               SELECT q.query_id, q.qe, p.cell_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "p.cte")} DESC, p.cell_id) AS rn
               FROM q, ct$iters p) WHERE rn <= 4),
         cand AS (SELECT pr.query_id, fasg.neighbor_id,
                 ${duckCos("pr.qe", "fasg.ce")} AS cosine
               FROM fasg JOIN pr USING (cell_id)),
         ivf AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
             WHERE rank <= 5),
         tr AS (SELECT query_id, neighbor_id FROM (
               SELECT q.query_id, c.neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "c.ce")} DESC, c.neighbor_id) AS rank
               FROM q, c) WHERE rank <= 5),
         nh AS (SELECT tr.query_id, count(*) AS n_hit
               FROM tr JOIN ivf USING (query_id, neighbor_id) GROUP BY 1),
         nt AS (SELECT query_id, count(*) AS n_truth FROM tr GROUP BY 1)
         SELECT nt.query_id, n_truth::BIGINT AS n_truth,
           coalesce(n_hit, 0)::BIGINT AS n_hit,
           floor(coalesce(n_hit, 0)::DOUBLE / n_truth::DOUBLE * 10000 + 0.5) / 10000
             AS recall
         FROM nt LEFT JOIN nh USING (query_id)"""
    },

    "semdedup_prune" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         pm AS (SELECT nid, ce, cell_id,
                  CAST(floor(cent_cos * 1000000 + 0.5) AS BIGINT) AS p
                FROM fasg)
         SELECT a.nid AS vec_id, a.cell_id, a.p AS cent_cos_micro,
           NOT EXISTS (SELECT 1 FROM pm b WHERE b.cell_id = a.cell_id
             AND (b.p < a.p OR (b.p = a.p AND b.nid < a.nid))
             AND ${duckCos("a.ce", "b.ce")} >= 0.4) AS kept
         FROM pm a""",

    "semdedup_rate_curve" -> {
      val epss = Seq(0.2, 0.3, 0.4, 0.5, 0.6)
      val rows = epss.map { e =>
        s"""SELECT $e AS eps, tot.n_total,
             (SELECT count(*) FROM mbc WHERE max_better_cos >= $e)::BIGINT
               AS n_pruned,
             floor((SELECT count(*) FROM mbc WHERE max_better_cos >= $e)::DOUBLE
               / tot.n_total::DOUBLE * 10000 + 0.5) / 10000 AS prune_rate
           FROM tot"""
      }.mkString("\nUNION ALL\n")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         pm AS MATERIALIZED (SELECT nid, ce, cell_id,
                  CAST(floor(cent_cos * 1000000 + 0.5) AS BIGINT) AS p
                FROM fasg),
         mbc AS MATERIALIZED (SELECT a.nid, max(${duckCos("a.ce", "b.ce")})
               AS max_better_cos
             FROM pm a JOIN pm b ON a.cell_id = b.cell_id
               AND (b.p < a.p OR (b.p = a.p AND b.nid < a.nid))
             GROUP BY a.nid),
         tot AS (SELECT count(*)::BIGINT AS n_total FROM pm)
         $rows"""
    },

    // greedy fold note: the reduce lambda ALWAYS returns
    // list_concat(gacc, ...) — returning gacc unchanged from a CASE
    // branch corrupts the accumulator in DuckDB 1.0.0 (verified:
    // [[1],[2],[3],[4]] with a "prune consecutive" rule yields [3]
    // instead of [1,3] when the prune branch returns gacc directly);
    // the kept set accumulates POSITIONS (plain BIGINT[]) for the
    // same reason — struct-typed accumulators corrupt too
    "semdedup_fidelity_eval" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         pm AS (SELECT nid, ce, cell_id,
                  CAST(floor(cent_cos * 1000000 + 0.5) AS BIGINT) AS p
                FROM fasg),
         dom AS (SELECT a.nid, a.cell_id,
             NOT EXISTS (SELECT 1 FROM pm b WHERE b.cell_id = a.cell_id
               AND (b.p < a.p OR (b.p = a.p AND b.nid < a.nid))
               AND ${duckCos("a.ce", "b.ce")} >= 0.4) AS kept_dom
           FROM pm a),
         cells AS (SELECT cell_id,
             list(struct_pack(p := p, vid := nid, cv := ce) ORDER BY p, nid)
               AS items
           FROM pm GROUP BY cell_id),
         gk AS (SELECT cell_id, list_transform(
             list_reduce(
               list_prepend([]::BIGINT[],
                 list_transform(generate_series(1, len(items)), j -> [j])),
               (gacc, gx) -> list_concat(gacc,
                 CASE WHEN len(list_filter(gacc, kk ->
                     ${duckCos("items[kk].cv", "items[gx[1]].cv")} >= 0.4)) > 0
                 THEN []::BIGINT[] ELSE gx END)),
             kp -> items[kp].vid) AS kept_ids
           FROM cells),
         greedy AS (SELECT cell_id, unnest(kept_ids) AS nid FROM gk)
         SELECT dom.cell_id, count(*)::BIGINT AS n_items,
           sum(CASE WHEN kept_dom THEN 1 ELSE 0 END)::BIGINT AS n_kept_dom,
           sum(CASE WHEN g.nid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_kept_greedy,
           sum(CASE WHEN kept_dom AND g.nid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_kept_both
         FROM dom LEFT JOIN greedy g
           ON dom.cell_id = g.cell_id AND dom.nid = g.nid
         GROUP BY dom.cell_id""",

    // replays the SELECTOR, not just the join: the masked-ladder
    // recall on the sampled cohort picks the smallest width >= 0.9
    // (CASE over the SQL-computed rounded recalls, ELSE = widest),
    // then the deploy chain's width-`chosen` slice IS the single-
    // width beam join at that width (fused-mask equivalence is
    // property-pinned on the engine side)
    "knn_join_ivf" -> {
      val pps = Seq(2, 4, 8)
      val hitSums = pps.map(p =>
        s"""sum(CASE WHEN (pm & $p) != 0 AND coalesce(c$p, 0) < 3
                 AND is_t THEN 1 ELSE 0 END) AS h$p""").mkString(",\n")
      def rexpr(p: Int) =
        s"floor(hs.h$p::DOUBLE / tc.n_truth::DOUBLE * 10000 + 0.5) / 10000"
      def pick(colName: String) =
        s"CASE s.chosen WHEN 2 THEN d.c2 WHEN 4 THEN d.c4 ELSE d.c8 END"
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         qall AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 2 = 0),
         qpar AS (SELECT greatest(1, (count(*) + 255) // 256) AS md FROM qall),
         q AS MATERIALIZED (SELECT query_id, qe FROM qall
               WHERE query_id % (SELECT md FROM qpar) = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         ${duckMaskedBeamLevels("q", "m", pps)},
         mcand AS MATERIALIZED (SELECT b.query_id, fasg.nid AS neighbor_id,
               ${duckCos("b.qe", "fasg.ce")} AS cosine, b.pm
             FROM fasg JOIN mq10 b ON fasg.cell_id = b.node),
         mrank AS MATERIALIZED (SELECT query_id, neighbor_id, pm,
               ${duckMaskedCnts(pps, "cosine DESC, neighbor_id")}
             FROM mcand),
         tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
               SELECT q.query_id, c.nid AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "c.ce")} DESC, c.nid) AS rank
               FROM q, c) WHERE rank <= 3),
         tc AS (SELECT count(*)::BIGINT AS n_truth FROM tr),
         hs AS (SELECT $hitSums
             FROM mrank LEFT JOIN (SELECT query_id, neighbor_id, TRUE AS is_t
               FROM tr) t USING (query_id, neighbor_id)),
         sel AS (SELECT CASE WHEN ${rexpr(2)} >= 0.9 THEN 2
                             WHEN ${rexpr(4)} >= 0.9 THEN 4
                             ELSE 8 END AS chosen FROM tc, hs),
         ${duckMaskedBeamLevels("qall", "d", pps)},
         dcand AS MATERIALIZED (SELECT b.query_id, fasg.nid AS neighbor_id,
               ${duckCos("b.qe", "fasg.ce")} AS cosine, b.pm
             FROM fasg JOIN dq10 b ON fasg.cell_id = b.node),
         drank AS MATERIALIZED (SELECT query_id, neighbor_id, cosine, pm,
               ${duckMaskedCnts(pps, "cosine DESC, neighbor_id")}
             FROM dcand)
         SELECT d.query_id,
           (coalesce(${pick("c")}, 0) + 1)::BIGINT AS rank,
           d.neighbor_id, round(d.cosine, 6) AS cosine
         FROM drank d, sel s
         WHERE (d.pm & s.chosen) != 0
           AND coalesce(${pick("c")}, 0) < 3"""
    },

    // incremental index refresh: the batch (even ids) descends the
    // odd-id corpus' tree replay with beam width 1 — the assignment
    // rule itself — and the probe table IS the result
    "ann_ivf_incremental" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe FROM v
               WHERE vec_id % 2 = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         ${duckBeam(iters = 1, maxDepth = 10, nProbe = 1)}
         SELECT query_id AS vec_id, cell_id FROM pr""",

    // drift report: corpus side from fasg (cent_cos), batch side from
    // the width-1 beam (its final sc — the same assignment-cosine
    // semantics), both frozen in 2^-20 integer units; occupancy skew
    // by exact integer cross-multiplied division (hot_key_report),
    // means rounded floor(sum/n + 0.5) like the recall harness
    "ann_ivf_drift" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe FROM v
               WHERE vec_id % 2 = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         ${duckBeam(iters = 1, maxDepth = 10, nProbe = 1)},
         uc AS (SELECT cell_id, TRUE AS isc,
                  floor(cent_cos * 1048576.0 + 0.5)::BIGINT AS cm FROM fasg
                UNION ALL
                SELECT cell_id, FALSE,
                  floor(sc * 1048576.0 + 0.5)::BIGINT FROM pr),
         pcell AS (SELECT cell_id,
             sum(CASE WHEN isc THEN 1 ELSE 0 END)::BIGINT AS n_corpus,
             sum(CASE WHEN NOT isc THEN 1 ELSE 0 END)::BIGINT AS n_batch,
             sum(CASE WHEN isc THEN cm END)::BIGINT AS ccs,
             sum(CASE WHEN NOT isc THEN cm END)::BIGINT AS bcs
           FROM uc GROUP BY 1),
         tt AS (SELECT sum(n_corpus + n_batch)::BIGINT AS total,
                  count(*)::BIGINT AS n_cells FROM pcell)
         SELECT cell_id, n_corpus, n_batch,
           (n_corpus + n_batch)::BIGINT AS n_total,
           (((n_corpus + n_batch) * n_cells * 1000000) // total)::BIGINT
             AS occ_skew_micro,
           floor(ccs::DOUBLE / n_corpus::DOUBLE + 0.5)::BIGINT
             AS corpus_mean_cos_micro,
           CASE WHEN n_batch > 0
             THEN floor(bcs::DOUBLE / n_batch::DOUBLE + 0.5)::BIGINT END
             AS batch_mean_cos_micro,
           CASE WHEN n_batch > 0
             THEN (floor(bcs::DOUBLE / n_batch::DOUBLE + 0.5)
                   - floor(ccs::DOUBLE / n_corpus::DOUBLE + 0.5))::BIGINT END
             AS drift_micro
         FROM pcell, tt""",

    "knn_recall_eval" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         qall AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 2 = 0),
         -- max(registered sampleMod, ceil(nQ/256)) — the FULL engine
         -- sampling contract (knnJoinRecallEval), not just the ceiling,
         -- so a future registration with sampleMod > 1 grades the same
         -- query set (registered sampleMod = 1 today)
         qpar AS (SELECT greatest(1, (count(*) + 255) // 256) AS md FROM qall),
         q AS MATERIALIZED (SELECT query_id, qe FROM qall
               WHERE query_id % (SELECT md FROM qpar) = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         ${duckBeam(iters = 1, maxDepth = 10, nProbe = 2)},
         cand AS (SELECT pr.query_id, fasg.nid AS neighbor_id,
                 ${duckCos("pr.qe", "fasg.ce")} AS cosine
               FROM fasg JOIN pr USING (cell_id)),
         ivf AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
             WHERE rank <= 3),
         tr AS (SELECT query_id, neighbor_id FROM (
               SELECT q.query_id, c.nid AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "c.ce")} DESC, c.nid) AS rank
               FROM q, c) WHERE rank <= 3),
         nh AS (SELECT tr.query_id, count(*) AS n_hit
               FROM tr JOIN ivf USING (query_id, neighbor_id) GROUP BY 1),
         nt AS (SELECT query_id, count(*) AS n_truth FROM tr GROUP BY 1)
         SELECT nt.query_id, n_truth::BIGINT AS n_truth,
           coalesce(n_hit, 0)::BIGINT AS n_hit,
           floor(coalesce(n_hit, 0)::DOUBLE / n_truth::DOUBLE * 10000 + 0.5) / 10000
             AS recall
         FROM nt LEFT JOIN nh USING (query_id)""",

    "knn_recall_curve" -> {
      // fused-mask replay of Similarity.knnJoinRecallCurve: one beam
      // descent carries the SET of probe widths each row survives at
      // as a bitmask (the width values are the bits, ladder mask 30);
      // per level one window counts, per width p, the strictly-better
      // rows whose mask has p — exact per-width beam rank without
      // materializing per-width beams. The candidate stage reuses the
      // trick on cosine rank for each width's top-3.
      val probePoints = Seq(2, 4, 8, 16)
      val maskAll = probePoints.sum
      def cnts(flagCol: String, ord: String) = probePoints.map(p =>
        s"""sum(CASE WHEN ($flagCol & $p) != 0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY query_id ORDER BY $ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c$p""")
        .mkString(",\n")
      def pmExpr = probePoints.map(p =>
        s"(CASE WHEN (pm & $p) != 0 AND coalesce(c$p, 0) < $p THEN $p ELSE 0 END)")
        .mkString(" + ")
      def level(l: Int): String =
        s"""mc$l AS MATERIALIZED (
             SELECT b.query_id, b.qe, b.pm,
               b.node * 2 + k.child AS cnode, ${duckCos("b.qe", "k.ctv")} AS sc
             FROM mq$l b JOIN bkx$l k USING (node)
             UNION ALL
             SELECT b.query_id, b.qe, b.pm, b.node AS cnode, b.sc
             FROM mq$l b WHERE NOT EXISTS (
               SELECT 1 FROM bkx$l k WHERE k.node = b.node)),
           mr$l AS MATERIALIZED (SELECT *, ${cnts("pm", "sc DESC, cnode")}
             FROM mc$l),
           mq${l + 1} AS MATERIALIZED (
             SELECT query_id, qe, cnode AS node, sc, ($pmExpr) AS pm
             FROM mr$l WHERE ($pmExpr) != 0)"""
      val levels = (0 until 10).map(level).mkString(",\n")
      val hitSums = probePoints.map(p =>
        s"""sum(CASE WHEN (pm & $p) != 0 AND coalesce(c$p, 0) < 3
                 AND is_t THEN 1 ELSE 0 END) AS h$p""").mkString(",\n")
      val rows = probePoints.map { p =>
        s"""SELECT $p AS n_probe, tc.n_queries, tc.n_truth,
             hs.h$p::BIGINT AS n_hit,
             floor(hs.h$p::DOUBLE / tc.n_truth::DOUBLE * 10000 + 0.5) / 10000
               AS recall
           FROM tc, hs"""
      }.mkString("\nUNION ALL\n")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         c AS MATERIALIZED (SELECT vec_id AS nid, e AS ce FROM v WHERE vec_id % 2 = 1),
         qall AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 2 = 0),
         qpar AS (SELECT greatest(1, (count(*) + 255) // 256) AS md FROM qall),
         q AS MATERIALIZED (SELECT query_id, qe FROM qall
               WHERE query_id % (SELECT md FROM qpar) = 0),
         ${duckBisectTree(iters = 1, maxDepth = 10, ncells = duckCellsPlan(64), target = 64)},
         mq0 AS MATERIALIZED (SELECT query_id, qe, 1::BIGINT AS node,
               1.0::DOUBLE AS sc, $maskAll AS pm FROM q),
         $levels,
         mcand AS MATERIALIZED (SELECT b.query_id, fasg.nid AS neighbor_id,
               ${duckCos("b.qe", "fasg.ce")} AS cosine, b.pm
             FROM fasg JOIN mq10 b ON fasg.cell_id = b.node),
         mrank AS MATERIALIZED (SELECT query_id, neighbor_id, pm,
               ${cnts("pm", "cosine DESC, neighbor_id")}
             FROM mcand),
         tr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
               SELECT q.query_id, c.nid AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${duckCos("q.qe", "c.ce")} DESC, c.nid) AS rank
               FROM q, c) WHERE rank <= 3),
         tc AS (SELECT count(*)::BIGINT AS n_truth,
               count(DISTINCT query_id)::BIGINT AS n_queries FROM tr),
         hs AS (SELECT $hitSums
             FROM mrank LEFT JOIN (SELECT query_id, neighbor_id, TRUE AS is_t
               FROM tr) t USING (query_id, neighbor_id))
         $rows"""
    },

    "ann_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT * FROM v WHERE vec_id < 10),
         c AS (SELECT * FROM v WHERE vec_id >= 10),
         s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(q.e)),
                   i -> q.e[i] * c.e[i])), (acc, x) -> acc + x) /
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(q.e)),
                   i -> q.e[i] * q.e[i])), (acc, x) -> acc + x) *
                 list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(c.e)),
                   i -> c.e[i] * c.e[i])), (acc, x) -> acc + x)) AS cosine
               FROM q, c),
         r AS (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rank FROM s)
         SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM r
         WHERE rank <= 5""",

    "embed_pq_encode" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         cb AS (SELECT vec_id AS code, e AS ce FROM v ORDER BY vec_id LIMIT 16),
         sp AS (SELECT s FROM generate_series(0, 7) t(s)),
         sub AS (SELECT vec_id, s AS subspace, e[s*8+1 : s*8+8] AS sv FROM v, sp),
         cbs AS (SELECT code, s AS subspace, ce[s*8+1 : s*8+8] AS cv FROM cb, sp),
         d AS (SELECT vec_id, subspace, code,
                 list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8),
                   i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), (acc, x) -> acc + x) AS d2
               FROM sub JOIN cbs USING (subspace)),
         r AS (SELECT vec_id, subspace, code, d2,
                 row_number() OVER (PARTITION BY vec_id, subspace
                                    ORDER BY d2, code) AS rn FROM d)
         SELECT vec_id, subspace::BIGINT AS subspace, code, round(d2, 6) AS dist2
         FROM r WHERE rn = 1""",

    "embed_normalize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(e)),
                   i -> e[i] * e[i])), (acc, x) -> acc + x)) AS norm
               FROM v),
         x AS (SELECT vec_id, norm, e, unnest(generate_series(1, len(e))) AS i FROM n)
         SELECT vec_id, norm, i - 1 AS dim,
           CASE WHEN norm = 0 THEN 0.0 ELSE e[i] / norm END AS unit_val
         FROM x""",

    "embed_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         m AS (SELECT vec_id, e,
                 coalesce(list_max(list_transform(e, x -> abs(x))), 0.0) AS maxabs FROM v),
         s AS (SELECT vec_id, e,
                 CASE WHEN maxabs = 0 THEN 0.0 ELSE 127.0 / maxabs END AS scale FROM m),
         x AS (SELECT vec_id, scale, e, unnest(generate_series(1, len(e))) AS i FROM s)
         SELECT vec_id, scale, i - 1 AS dim,
           CAST(floor(e[i] * scale + 0.5) AS INTEGER) AS q
         FROM x""",

    "embed_norm_stats" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
         n AS (SELECT label,
                 CAST(floor(sqrt(list_reduce(list_prepend(0.0,
                   list_transform(generate_series(1, len(e)), i -> e[i] * e[i])),
                   (acc, x) -> acc + x)) * 10000 + 0.5) AS BIGINT) AS norm_e4
               FROM v)
         SELECT label, count(*) AS n_vectors, min(norm_e4) AS min_norm_e4,
           max(norm_e4) AS max_norm_e4, CAST(sum(norm_e4) AS BIGINT) AS sum_norm_e4
         FROM n GROUP BY label""",

    "embed_centroids" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
         x AS (SELECT label, e, unnest(generate_series(1, len(e))) AS i FROM v),
         c AS (SELECT label, i - 1 AS dim,
                 CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS c_e6 FROM x)
         SELECT label, dim, count(*) AS n, CAST(sum(c_e6) AS BIGINT) AS sum_e6
         FROM c GROUP BY label, dim""",

    "embed_drift" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         x AS (SELECT label, vec_id % 2 AS snap, e, unnest(generate_series(1, len(e))) AS i
               FROM v),
         c AS (SELECT label, snap, i - 1 AS dim,
                 CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS c_e6 FROM x),
         g AS (SELECT label, snap, dim, count(*) AS n, sum(c_e6)::BIGINT AS s
               FROM c GROUP BY 1, 2, 3),
         j AS (SELECT a.label, a.dim, a.n AS n_a, b.n AS n_b,
                 a.s::DOUBLE / a.n / 1000000 AS m_a, b.s::DOUBLE / b.n / 1000000 AS m_b
               FROM g a JOIN g b ON a.label = b.label AND a.dim = b.dim
                 AND a.snap = 0 AND b.snap = 1),
         l AS (SELECT label, max(n_a) AS n_a, max(n_b) AS n_b,
                 list_sort(list(struct_pack(dim := dim, m_a := m_a, m_b := m_b))) AS ds
               FROM j GROUP BY label),
         f AS (SELECT label, n_a, n_b,
                 list_reduce(list_prepend(0.0, list_transform(ds, x -> x.m_a * x.m_b)),
                   (a, b) -> a + b) AS dot,
                 list_reduce(list_prepend(0.0, list_transform(ds, x -> x.m_a * x.m_a)),
                   (a, b) -> a + b) AS na2,
                 list_reduce(list_prepend(0.0, list_transform(ds, x -> x.m_b * x.m_b)),
                   (a, b) -> a + b) AS nb2,
                 list_reduce(list_prepend(0.0,
                     list_transform(ds, x -> (x.m_a - x.m_b) * (x.m_a - x.m_b))),
                   (a, b) -> a + b) AS l2
               FROM l)
         SELECT label, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           floor(dot / sqrt(na2) / sqrt(nb2) * 1000000 + 0.5) / 1000000 AS cosine,
           floor(sqrt(l2) * 1000000 + 0.5) / 1000000 AS l2_shift
         FROM f""",

    "neardup_rate_by_source" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         m AS (SELECT DISTINCT doc_id FROM
                 (SELECT id_a AS doc_id FROM p UNION ALL SELECT id_b FROM p))
         SELECT d.source, count(*) AS n_docs,
           count(m.doc_id) AS n_near_dup,
           floor(count(m.doc_id)::DOUBLE / count(*) * 10000 + 0.5) / 10000 AS dup_rate
         FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
         GROUP BY d.source""",

    "embed_covariance" ->
      """WITH v AS (SELECT embedding AS e FROM embeddings),
         pr AS (SELECT unnest(flatten(list_transform(generate_series(1, 16), i ->
                  list_transform(generate_series(i, 16), j ->
                    struct_pack(i := i - 1, j := j - 1,
                      p := floor(e[i]::DOUBLE * e[j]::DOUBLE * 100000000 + 0.5)::BIGINT)))))
                  AS s
                FROM v),
         m AS (SELECT s.i AS i, s.j AS j, count(*) AS n, sum(s.p)::BIGINT AS sp
               FROM pr GROUP BY 1, 2),
         d AS (SELECT s.i AS i, sum(s.x)::BIGINT AS sx FROM (
                 SELECT unnest(list_transform(generate_series(1, 16), k ->
                   struct_pack(i := k - 1,
                     x := floor(e[k]::DOUBLE * 10000 + 0.5)::BIGINT))) AS s
                 FROM v) GROUP BY 1)
         SELECT m.i::BIGINT AS i, m.j::BIGINT AS j, n,
           floor((sp::DOUBLE / 100000000 / n
             - (di.sx::DOUBLE / 10000 / n) * (dj.sx::DOUBLE / 10000 / n)) * 1000000
             + 0.5) / 1000000 AS cov
         FROM m JOIN d di ON m.i = di.i JOIN d dj ON m.j = dj.i""",

  )
}
