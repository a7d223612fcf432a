package graft

/** DuckDB oracle SQL — text dedup families (exact/minhash/substring/clusters/...).
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesDedup {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text""",

    "dedup_normalized" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents
         GROUP BY trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))""",

    // NFC-first variant on planted composed (chr(233) = U+00E9) vs
    // decomposed (chr(769) = combining acute) twins
    "dedup_normalized_nfc" ->
      """WITH u AS (
           SELECT doc_id, text || ' caf' || chr(233) || ' r' || chr(233)
             || 'sum' || chr(233) AS mtext FROM documents
           UNION ALL
           SELECT doc_id + 1000000000, text || ' cafe' || chr(769) || ' re'
             || chr(769) || 'sume' || chr(769) AS mtext FROM documents)
         SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM u
         GROUP BY trim(regexp_replace(regexp_replace(lower(nfc_normalize(mtext)),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))""",

    "dedup_incremental" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents
         WHERE doc_id % 10 <> 0
           AND text NOT IN (SELECT text FROM documents WHERE doc_id % 10 = 0)
         GROUP BY text""",

    "ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
               FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM p WHERE jaccard >= 0.6""",

    // positioned 16-token windows grouped by shingle TEXT (the
    // injective-in-practice FNV equivalence every shingle oracle
    // uses); coverage = win + Σ min(win, Δpos) over sorted starts —
    // exact interval union in closed integer form
    "substring_dup_stats" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sh AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, unnest(
                  CASE WHEN len(toks) >= 16
                    THEN list_transform(generate_series(1, len(toks) - 15),
                           i -> struct_pack(pos := (i - 1)::BIGINT,
                                            s := array_to_string(toks[i:i+15], ' ')))
                    ELSE [struct_pack(pos := 0::BIGINT, s := array_to_string(toks, ' '))]
                  END) AS w FROM t),
         ww AS (SELECT doc_id, n_tokens, w.pos AS pos, w.s AS s FROM sh),
         dup AS (SELECT s FROM (SELECT s, count(*) AS c FROM ww GROUP BY s) WHERE c >= 2),
         dp AS (SELECT doc_id, any_value(n_tokens) AS n_tokens,
                  count(*) AS n_dup_windows, list_sort(list(pos)) AS ps
                FROM ww WHERE s IN (SELECT s FROM dup) GROUP BY doc_id),
         cov AS (SELECT doc_id, n_dup_windows,
                   least(16, n_tokens)
                   + coalesce(list_sum(list_transform(generate_series(2, len(ps)),
                       i -> least(least(16, n_tokens), ps[i] - ps[i-1]))), 0) AS covered
                 FROM dp),
         tot AS (SELECT doc_id, any_value(n_tokens) AS n_tokens,
                   count(*) AS n_windows FROM ww GROUP BY doc_id)
         SELECT t.doc_id, t.n_tokens, t.n_windows,
           coalesce(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
           floor(coalesce(c.covered, 0)::DOUBLE / greatest(t.n_tokens, 1) * 10000 + 0.5)
             / 10000 AS dup_token_frac
         FROM tot t LEFT JOIN cov c USING (doc_id)""",

    "substring_dedup_apply" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sh AS (SELECT doc_id, unnest(
                  CASE WHEN len(toks) >= 16
                    THEN list_transform(generate_series(1, len(toks) - 15),
                           i -> struct_pack(pos := (i - 1)::BIGINT,
                                            s := array_to_string(toks[i:i+15], ' ')))
                    ELSE [struct_pack(pos := 0::BIGINT, s := array_to_string(toks, ' '))]
                  END) AS w FROM t),
         ww AS (SELECT doc_id, w.pos AS pos, w.s AS s,
                  doc_id * 1048576 + w.pos AS okey FROM sh),
         wk AS (SELECT s, min(okey) AS wkey FROM ww GROUP BY 1),
         rm AS (SELECT doc_id, list_sort(list(pos)) AS rp
                FROM ww JOIN wk USING (s) WHERE okey <> wkey GROUP BY 1),
         k AS (SELECT t.doc_id, toks, coalesce(rm.rp, []) AS rp,
                 least(16, len(toks))::BIGINT AS weff
               FROM t LEFT JOIN rm USING (doc_id)),
         f AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                 list_filter(list_transform(generate_series(1, len(toks)),
                   i -> CASE WHEN len(list_filter(rp,
                          p -> p <= i - 1 AND i - 1 < p + weff)) > 0
                        THEN NULL ELSE toks[i] END), x -> x IS NOT NULL) AS kept
               FROM k)
         SELECT doc_id, n_tokens, len(kept)::BIGINT AS n_kept,
           coalesce(array_to_string(kept, ' '), '') AS cleaned_text
         FROM f""",

    // line granularity: 8-token chunks, winner = min(doc·2^20+line_no)
    // per line TEXT (the same injective-in-practice FNV equivalence as
    // the substring oracles); text_clean is byte-exact reassembly of
    // the surviving lines in original order
    "line_dedup_apply" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT doc_id, toks, CAST(ceil(len(toks) / 8.0) AS BIGINT) AS n_lines FROM t),
         l0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, n_lines),
                  j -> struct_pack(ln := (j - 1)::BIGINT,
                                   s := array_to_string(toks[(j-1)*8+1:(j-1)*8+8], ' ')))) AS w
                FROM b),
         l AS (SELECT doc_id, w.ln AS line_no, w.s AS line,
                 doc_id * 1048576 + w.ln AS okey FROM l0),
         wk AS (SELECT line, min(okey) AS wkey FROM l GROUP BY 1),
         kn AS (SELECT doc_id, list_sort(list(line_no)) AS kl
                FROM l JOIN wk USING (line) WHERE okey = wkey GROUP BY 1),
         f AS (SELECT b.doc_id, b.n_lines, coalesce(kl, []) AS kl, toks
               FROM b LEFT JOIN kn USING (doc_id))
         SELECT doc_id, n_lines, len(kl)::BIGINT AS n_kept,
           coalesce(array_to_string(list_transform(kl,
             j -> array_to_string(toks[j*8+1:j*8+8], ' ')), chr(10)), '') AS text_clean
         FROM f""",

    "dedup_minhash" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
               FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM p WHERE jaccard >= 0.8""",

    "neardup_incremental" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS id_new, b.doc_id AS id_old,
                 len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
               FROM s a JOIN s b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
         SELECT id_new, id_old, round(jaccard, 4) AS jaccard FROM p WHERE jaccard >= 0.8""",

    "dedup_clusters" ->
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
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id""",

    // dedup_clusters' reach CTE over the UNION of the text-pair and
    // banded-cosine-pair predicates (both replayed exactly as in their
    // own oracles)
    "dedup_multisignal" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         tp AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()},
         vp AS (SELECT id_a AS ia, id_b AS ib FROM bpairs WHERE cs >= 0.4),
         p AS (SELECT ia, ib FROM tp UNION SELECT ia, ib FROM vp),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id""",

    // minhash-fed multisignal: the text channel is the banded-MinHash
    // candidate set verified at 0.6 — the SplitMix64 permutations and
    // 32×4 band-equality predicate replayed as in minhash_recall_eval
    // — unioned with the banded-cosine channel, same reach CTE.
    "dedup_multisignal_lsh" -> {
      val (mas, mbs) = graft.functions.MinHashSig.coeffs(128)
      val mp = graft.functions.MinHashSig.P
      val minsSql = (0 until 128)
        .map(j => s"min((${mas(j)} * h + ${mbs(j)}) % $mp) AS m$j").mkString(", ")
      val bandEq = (0 until 32).map(b =>
        (0 until 4).map(r => s"a.m${b * 4 + r} = b.m${b * 4 + r}")
          .mkString("(", " AND ", ")")).mkString(" OR ")
      s"""WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         hs AS (SELECT doc_id,
                  ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                       THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                     % $mp) + $mp) % $mp)::BIGINT AS h
                FROM (SELECT doc_id, ${duckFnv("(g || ' ')")} AS hu
                      FROM (SELECT doc_id, unnest(sh) AS g FROM s))),
         sig AS (SELECT doc_id, $minsSql FROM hs GROUP BY doc_id),
         mcand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
                   FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandEq)),
         tp AS (SELECT x.ia, x.ib FROM mcand x
                JOIN s sa ON sa.doc_id = x.ia JOIN s sb ON sb.doc_id = x.ib
                WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                  / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.6),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         ${duckBandedCtes()},
         vp AS (SELECT id_a AS ia, id_b AS ib FROM bpairs WHERE cs >= 0.4),
         p AS (SELECT ia, ib FROM tp UNION SELECT ia, ib FROM vp),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id"""
    },

    // THE FULL RECOMPUTE at 0.8 over every pair — deliberately not the
    // incremental composition: a green hash proves the engine's
    // incremental path (prev labels as star edges + delta links)
    // equals clustering from scratch
    "dedup_clusters_incremental" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM s a JOIN s b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
         SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))::BIGINT AS cluster
         FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id""",

    // same reach CTE as dedup_clusters; family sizes re-aggregated by
    // size class with exact integer doc/removable mass
    "dedup_cluster_sizes" ->
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
                 FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id),
         m AS (SELECT cluster, count(*) AS cluster_size FROM lab GROUP BY cluster)
         SELECT cluster_size, count(*) AS n_clusters,
           (cluster_size * count(*))::BIGINT AS n_docs,
           ((cluster_size - 1) * count(*))::BIGINT AS n_removable
         FROM m GROUP BY cluster_size""",

    // same reach CTE as dedup_clusters; survivor = longest member
    // (ties to min id) via a deterministic per-cluster window
    "cluster_survivors" ->
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
                 FROM documents d LEFT JOIN reach r ON r.a = d.doc_id GROUP BY d.doc_id),
         m AS (SELECT cluster, count(*) AS n_members FROM lab GROUP BY cluster),
         w AS (SELECT l.cluster, d.doc_id, d.n_chars,
                 row_number() OVER (PARTITION BY l.cluster
                                    ORDER BY d.n_chars DESC, d.doc_id) AS rn
               FROM lab l JOIN documents d USING (doc_id))
         SELECT w.cluster, w.doc_id, w.n_chars, m.n_members
         FROM w JOIN m USING (cluster) WHERE rn = 1""",

    // Replays the native banded MinHash bit-exactly: shingle hash =
    // FNV-1a over the shingle text plus trailing separator (the
    // kernel's per-token `(h^0x20)*prime` IS the FNV-1a step on a
    // space byte), folded mod P with Scala floorMod semantics; the
    // 128 permutation (a,b) pairs are the kernel's own SplitMix64
    // stream embedded as literals; candidates = ≥1 of 32 four-slot
    // bands equal; recall = caught/exact at threshold 0.6.
    "minhash_recall_eval" -> {
      val (mas, mbs) = graft.functions.MinHashSig.coeffs(128)
      val mp = graft.functions.MinHashSig.P
      val minsSql = (0 until 128)
        .map(j => s"min((${mas(j)} * h + ${mbs(j)}) % $mp) AS m$j").mkString(", ")
      val bandEq = (0 until 32).map(b =>
        (0 until 4).map(r => s"a.m${b * 4 + r} = b.m${b * 4 + r}")
          .mkString("(", " AND ", ")")).mkString(" OR ")
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                     FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         hs AS (SELECT doc_id,
                  ((((CASE WHEN hu >= '9223372036854775808'::HUGEINT
                       THEN hu - '18446744073709551616'::HUGEINT ELSE hu END)
                     % $mp) + $mp) % $mp)::BIGINT AS h
                FROM (SELECT doc_id, ${duckFnv("(g || ' ')")} AS hu
                      FROM (SELECT doc_id, unnest(sh) AS g FROM s))),
         sig AS (SELECT doc_id, $minsSql FROM hs GROUP BY doc_id),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandEq)),
         jac AS (SELECT x.id_a, x.id_b FROM cand x
                 JOIN s sa ON sa.doc_id = x.id_a JOIN s sb ON sb.doc_id = x.id_b
                 WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                   / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.6),
         ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM s a JOIN s b ON a.doc_id < b.doc_id
                WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6)
         SELECT (SELECT count(*) FROM ex)::BIGINT AS n_exact,
           (SELECT count(*) FROM jac)::BIGINT AS n_lsh,
           CASE WHEN (SELECT count(*) FROM ex) = 0 THEN 1.0
                ELSE floor((SELECT count(*) FROM jac)::DOUBLE
                  / (SELECT count(*) FROM ex) * 10000 + 0.5) / 10000 END AS recall"""
    },

    // Replays the native SimHash64: FNV-1a per DISTINCT token (hash
    // values are a pure function of the token bytes, so hashing the
    // vocabulary once and joining is exactly the per-occurrence vote),
    // ±1 votes summed per (doc, bit), sign vector banded 4×16 bits,
    // pigeonhole band join, exact per-bit Hamming verify.
    "dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                          x -> x <> '')) AS tok FROM documents),
         vocab AS (SELECT DISTINCT tok FROM toks),
         hashed AS (SELECT tok, ${duckFnv("tok")} AS h FROM vocab),
         pw(bit, p) AS (VALUES $duckBitPowers),
         bits AS (SELECT tok, bit, ((h // p) % 2)::BIGINT AS b FROM hashed, pw),
         perdoc AS (SELECT t.doc_id, b.bit, sum(CASE WHEN b.b = 1 THEN 1 ELSE -1 END) AS cnt
                    FROM toks t JOIN bits b USING (tok) GROUP BY 1, 2),
         fp AS (SELECT doc_id, bit, CASE WHEN cnt > 0 THEN 1 ELSE 0 END AS fb FROM perdoc),
         bands AS (SELECT doc_id, bit % 4 AS band, sum(fb * (1 << (bit // 4)))::BIGINT AS band_val
                   FROM fp GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                    AND a.doc_id < b.doc_id),
         ham AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN fp fa ON fa.doc_id = c.id_a
                   JOIN fp fb2 ON fb2.doc_id = c.id_b AND fb2.bit = fa.bit
                 GROUP BY 1, 2)
         SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""",

    "dedup_survivors" ->
      """WITH w AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         SELECT d.doc_id, d.lang, d.source, d.n_chars
         FROM documents d JOIN w USING (doc_id)""",

  )
}
