package graft

/** DuckDB oracle SQL — text analysis (BPE, langid, quality, PII, perplexity, ...).
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesText {
  import OracleDsl._

  /** Shared CTE chain for the backoff-trigram queries: the three LM
    * tables (frozen micro-bit surprisals, alpha inside the log), the
    * scoring coalesce, and per-position backoff-level flags in `sc`.
    */
  private val trigramPplCtes: String =
    """WITH t AS (SELECT doc_id, doc_id % 2 = 0 AS is_t,
                      list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         g AS (SELECT doc_id, is_t, unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1], w3 := toks[i + 2]))) AS tg
               FROM t WHERE len(toks) >= 3),
         tt AS (SELECT doc_id, is_t, tg.w1 AS w1, tg.w2 AS w2, tg.w3 AS w3 FROM g),
         t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tt WHERE is_t GROUP BY 1, 2, 3),
         p3 AS (SELECT w1, w2, sum(c3)::BIGINT AS c2p FROM t3 GROUP BY 1, 2),
         lm3 AS (SELECT w1, w2, w3,
                   floor(-log2(c3::DOUBLE / c2p) * 1000000 + 0.5)::BIGINT AS tri_ubits
                 FROM t3 JOIN p3 USING (w1, w2)),
         b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w2 := toks[i], w3 := toks[i + 1]))) AS bg
               FROM t WHERE is_t AND len(toks) >= 2),
         t2 AS (SELECT bg.w2 AS w2, bg.w3 AS w3, count(*) AS cb FROM b GROUP BY 1, 2),
         p2 AS (SELECT w2, sum(cb)::BIGINT AS cbp FROM t2 GROUP BY 1),
         lm2 AS (SELECT w2, w3,
                   floor(-log2(0.4 * cb::DOUBLE / cbp) * 1000000 + 0.5)::BIGINT AS bi_ubits
                 FROM t2 JOIN p2 USING (w2)),
         u1 AS (SELECT w3, count(*) AS c1 FROM (
                  SELECT unnest(toks) AS w3 FROM t WHERE is_t) GROUP BY 1),
         tot AS (SELECT sum(c1)::BIGINT AS n_toks, count(*)::BIGINT AS vocab FROM u1),
         lm1 AS (SELECT w3, floor(-log2(0.16 * (c1 + 1)::DOUBLE / (n_toks + vocab))
                   * 1000000 + 0.5)::BIGINT AS uni_ubits
                 FROM u1, tot),
         sc AS (SELECT tt.doc_id,
                  coalesce(lm3.tri_ubits, lm2.bi_ubits, lm1.uni_ubits,
                    floor(-log2(0.16 / (n_toks + vocab)::DOUBLE)
                      * 1000000 + 0.5)::BIGINT) AS ubits,
                  (lm3.tri_ubits IS NULL AND lm2.bi_ubits IS NOT NULL) AS is_bi,
                  (lm3.tri_ubits IS NULL AND lm2.bi_ubits IS NULL) AS is_uni
                FROM tt
                LEFT JOIN lm3 USING (w1, w2, w3)
                LEFT JOIN lm2 USING (w2, w3)
                LEFT JOIN lm1 USING (w3)
                CROSS JOIN tot)"""

  val sql: Map[String, String] = Map(
    "bpe_train_steps" -> {
      val unions = (1 to bpeSteps).map(s => s"SELECT * FROM b$s").mkString(" UNION ALL ")
      s"""WITH $bpeTrainCtes
         SELECT step, l AS sym_left, r AS sym_right, cnt AS pair_freq
         FROM ($unions)"""
    },

    // identical merge-unroll chain, but the word source is the GPT-2
    // style regex pre-tokenizer over the punctuated mixed text (the
    // same lookaround-free pattern both engines run verbatim)
    "bpe_pretok_train" -> {
      val unions = (1 to bpeSteps).map(s => s"SELECT * FROM b$s").mkString(" UNION ALL ")
      val toks = """toks AS (SELECT unnest(list_filter(regexp_extract_all(
           lower(text || ' it''s doc-' || CAST(doc_id AS VARCHAR) || ', ok!'),
           '''(s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s'']+|''+'),
           x -> x <> '')) AS w FROM documents)"""
      s"""WITH ${bpeTrainCtesFrom(toks, bpeStepCtes)}
         SELECT step, l AS sym_left, r AS sym_right, cnt AS pair_freq
         FROM ($unions)"""
    },

    // encode = the trainer chain (b1..bK learned identically), then the
    // same per-step CANONICAL merge applied to each DOCUMENT's words
    // (duplicates kept) instead of the aggregated vocabulary
    "bpe_encode" -> {
      // absent merge rules (degenerate corpus) leave the scalar
      // subqueries NULL — the canonical merge with NULL symbols is the
      // identity, the same no-op default as the engine's bpeEncode
      val encCtes = (1 to bpeSteps).map { s =>
        s"""encm$s AS MATERIALIZED (SELECT doc_id, syms, rl, rr,
               ${duckMergePos("syms", "rl", "rr")} AS mp
             FROM enc${s - 1}, (SELECT max(l) AS rl, max(r) AS rr FROM b$s) jre$s),
           enc$s AS MATERIALIZED (SELECT doc_id,
               ${duckMergeApply("syms", "mp", "rl", "rr")} AS syms
             FROM encm$s)"""
      }.mkString(",\n         ")
      s"""WITH $bpeTrainCtes,
         dtoks AS (SELECT doc_id, unnest(list_filter(string_split(
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g')), ' '), x -> x <> '')) AS w FROM documents),
         enc0 AS MATERIALIZED (SELECT doc_id,
             list_transform(generate_series(1, length(w)), i -> w[i]) AS syms
           FROM dtoks),
         $encCtes
         SELECT doc_id, count(*)::BIGINT AS n_words,
           sum(len(syms))::BIGINT AS n_bpe_tokens
         FROM enc$bpeSteps GROUP BY doc_id"""
    },

    // BYTE-level trainer: identical merge-unroll chain, but seqs0 is
    // each pre-token's UTF-8 bytes through the bytes-to-unicode list
    // (generated from the engine's own table) over the salted
    // non-ASCII corpus
    "bpe_byte_train" -> {
      val unions = (1 to bpeSteps).map(s => s"SELECT * FROM b$s").mkString(" UNION ALL ")
      s"""WITH $bpeByteTrainCtes
         SELECT step, l AS sym_left, r AS sym_right, cnt AS pair_freq
         FROM ($unions)"""
    },

    // byte-level encode: the byte trainer chain (b1..bK learned
    // identically), then the same per-step canonical merge applied to
    // each DOCUMENT's pre-token byte symbols (duplicates kept)
    "bpe_byte_encode" -> {
      val encCtes = (1 to bpeSteps).map { s =>
        s"""encm$s AS MATERIALIZED (SELECT doc_id, syms, rl, rr,
               ${duckMergePos("syms", "rl", "rr")} AS mp
             FROM enc${s - 1}, (SELECT max(l) AS rl, max(r) AS rr FROM b$s) jre$s),
           enc$s AS MATERIALIZED (SELECT doc_id,
               ${duckMergeApply("syms", "mp", "rl", "rr")} AS syms
             FROM encm$s)"""
      }.mkString(",\n         ")
      s"""WITH $bpeByteTrainCtes,
         $bpeByteDocToksCte,
         enc0 AS MATERIALIZED (SELECT doc_id, ${duckByteSyms("w")} AS syms
           FROM dtoks, b2u),
         $encCtes
         SELECT doc_id, count(*)::BIGINT AS n_words,
           sum(len(syms))::BIGINT AS n_bpe_tokens
         FROM enc$bpeSteps GROUP BY doc_id"""
    },

    "bpe_vocab" ->
      s"""WITH $bpeTrainCtes,
         vsyms AS (SELECT unnest(syms) AS symbol, freq FROM seqs$bpeSteps)
         SELECT symbol, sum(freq)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_occurrences
         FROM vsyms GROUP BY symbol""",

    // byte-level vocab: the byte trainer chain's final state exploded
    // — same aggregation as bpe_vocab over the byte-symbol seqs
    "bpe_byte_vocab" ->
      s"""WITH $bpeByteTrainCtes,
         vsyms AS (SELECT unnest(syms) AS symbol, freq FROM seqs$bpeSteps)
         SELECT symbol, sum(freq)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_occurrences
         FROM vsyms GROUP BY symbol""",

    "text_langid" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sc AS (SELECT doc_id,
           len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
           len(list_filter(toks, t -> t IN ('el','la','de','que','y'))) AS s_es,
           len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS s_de,
           len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr
           FROM t)
         SELECT doc_id, CASE
           WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
           WHEN s_de >= s_fr THEN 'de'
           ELSE 'fr' END AS lang_pred FROM sc""",

    "langid_confusion" ->
      """WITH t AS (SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         sc AS (SELECT doc_id, lang,
           len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
           len(list_filter(toks, t -> t IN ('el','la','de','que','y'))) AS s_es,
           len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS s_de,
           len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr
           FROM t),
         p AS (SELECT lang, CASE
           WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
           WHEN s_de >= s_fr THEN 'de'
           ELSE 'fr' END AS lang_pred FROM sc)
         SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2""",

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         m AS (SELECT doc_id, text, len(toks) AS n,
           list_sum(list_transform(toks, x -> length(x))) AS char_sum,
           len(list_filter(toks,
             x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
             greatest(length(text), 1) AS digit_ratio
           FROM t)
         SELECT doc_id, n::BIGINT AS n_tokens,
           round(char_sum::DOUBLE / greatest(n, 1), 4) AS avg_token_len,
           round(stops::DOUBLE / greatest(n, 1), 4) AS stop_ratio,
           round(least(1.0, greatest(0.0,
             0.2 + 0.01 * n + stops::DOUBLE / greatest(n, 1) - 5.0 * digit_ratio)), 4) AS quality
         FROM m""",

    "text_tokens" ->
      """SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_ws_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_bpe_tokens
         FROM documents""",

    "text_fingerprint" ->
      """SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
             t -> (length(t) * 256 + ascii(t))::BIGINT)),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM documents""",

    "text_pii" ->
      """SELECT doc_id,
         len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_email,
         len(regexp_extract_all(text, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b'))::BIGINT AS n_phone,
         len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
         len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))::BIGINT AS n_ssn,
         (regexp_matches(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')
          OR regexp_matches(text, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')
          OR regexp_matches(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')
          OR regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')) AS has_pii
         FROM documents""",

    // replacement nesting mirrors the Spark fold order (email, phone,
    // ipv4, ssn); 'g' flag = replace-all, matching Spark regexp_replace
    "pii_redact" ->
      """SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
           '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS redacted
         FROM documents
         WHERE regexp_matches(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')
            OR regexp_matches(text, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')
            OR regexp_matches(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')
            OR regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')""",

    "token_cooccurrence" ->
      """WITH dt AS (SELECT doc_id AS doc,
             unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
           FROM documents),
         tf AS (SELECT tok, count(*) AS df_tok FROM dt GROUP BY tok),
         n AS (SELECT count(*) AS n_docs FROM documents),
         pc AS (SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_pair
                FROM dt a JOIN dt b ON a.doc = b.doc AND a.tok < b.tok
                GROUP BY 1, 2 HAVING count(*) >= 50)
         SELECT pc.tok_a, pc.tok_b, pc.n_pair,
           round(pc.n_pair::DOUBLE * (SELECT n_docs FROM n) /
             (fa.df_tok::DOUBLE * fb.df_tok::DOUBLE), 6) AS lift
         FROM pc JOIN tf fa ON pc.tok_a = fa.tok JOIN tf fb ON pc.tok_b = fb.tok""",

    "decontaminate" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         bench AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 10 = 0),
         corp AS (SELECT doc_id, sh FROM s WHERE doc_id % 10 <> 0),
         hits AS (SELECT c.doc_id, count(*) AS n_shared
                  FROM (SELECT doc_id, unnest(sh) AS g FROM corp) c
                  JOIN bench USING (g) GROUP BY c.doc_id)
         SELECT c.doc_id, CAST(len(c.sh) AS BIGINT) AS n_shingles,
           coalesce(h.n_shared, 0) AS n_shared,
           coalesce(h.n_shared, 0) > 0 AS contaminated
         FROM corp c LEFT JOIN hits h USING (doc_id)""",

    "repetition_stats" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, CASE WHEN len(toks) >= 2
                 THEN list_transform(generate_series(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+1], ' '))
                 ELSE [array_to_string(toks, ' ')] END sh FROM t),
         c AS (SELECT doc_id, gm, count(*) AS c
               FROM (SELECT doc_id, unnest(sh) AS gm FROM s) GROUP BY doc_id, gm)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_shingles,
           count(*) AS n_distinct, max(c) AS max_repeat
         FROM c GROUP BY doc_id""",

    "token_diversity" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS c
               FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY doc_id, tok),
         a AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
                 sum(c * c)::BIGINT AS sum_sq
               FROM c GROUP BY doc_id)
         SELECT doc_id, n_tokens, n_distinct, sum_sq,
           floor((1 - sum_sq::DOUBLE / (n_tokens * n_tokens)) * 1000000 + 0.5) / 1000000
             AS simpson,
           floor((n_tokens * n_tokens)::DOUBLE / sum_sq * 10000 + 0.5) / 10000
             AS effective_vocab
         FROM a""",

    // interpolated-quantile threshold: quantile_cont matches Spark's
    // percentile() definition (index p·(n−1), linear interpolation)
    "quantile_gate" ->
      """WITH s AS (SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
               AS n_bpe_tokens
           FROM documents)
         SELECT doc_id, n_bpe_tokens FROM s
         WHERE n_bpe_tokens >= (SELECT quantile_cont(n_bpe_tokens, 0.75) FROM s)""",

    // histogram threshold replay: same clamped integer bins, cumulative
    // walk to rank = ceil(q*n), est threshold = upper bin edge; exact
    // quantile_cont rides along for the measured error columns
    "quantile_gate_sketch" ->
      """WITH s AS (SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT
               AS n_bpe_tokens
           FROM documents),
         b AS (SELECT greatest(0, least(floor(n_bpe_tokens * 100 + 0.5)::BIGINT // 100, 1023))
                 AS bin FROM s),
         hist AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
         cum AS (SELECT bin, sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
                 FROM hist),
         tot AS (SELECT sum(c)::BIGINT AS n FROM hist),
         est AS (SELECT ((min(bin) + 1) * 100)::DOUBLE / 100 AS thr_est
                 FROM cum, tot WHERE cum >= ceil(0.75 * n)),
         ex AS (SELECT floor(quantile_cont(floor(n_bpe_tokens * 100 + 0.5)::BIGINT, 0.75)
                  / 100 * 10000 + 0.5) / 10000 AS thr_exact FROM s)
         SELECT doc_id, n_bpe_tokens, thr_est, thr_exact,
           floor((thr_est - thr_exact) * 10000 + 0.5) / 10000 AS thr_err
         FROM s, est, ex WHERE n_bpe_tokens >= thr_est""",

    "boilerplate_score" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 2
                 THEN list_transform(generate_series(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+1], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
         df AS (SELECT g, count(*) AS d FROM ex GROUP BY g),
         freq AS (SELECT g FROM df WHERE d >= 30),
         hits AS (SELECT ex.doc_id, count(*) AS n_boiler
                  FROM ex JOIN freq USING (g) GROUP BY ex.doc_id)
         SELECT s.doc_id, len(s.sh)::BIGINT AS n_shingles,
           coalesce(h.n_boiler, 0)::BIGINT AS n_boiler,
           floor((CASE WHEN len(s.sh) > 0
                       THEN coalesce(h.n_boiler, 0)::DOUBLE / len(s.sh)
                       ELSE 0.0 END) * 10000 + 0.5) / 10000 AS boiler_ratio
         FROM s LEFT JOIN hits h USING (doc_id)""",

    "tfidf_top_terms" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
         docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT t.doc_id, t.term, t.tf,
             t.tf * ((n.n_docs * 1000) // d.df) AS score
           FROM tf t JOIN docfreq d USING (term) CROSS JOIN n)
         SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rank FROM scored) AS ranked
         WHERE rank <= 3""",

    "corpus_top_terms" ->
      """WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
                       FROM documents)
         SELECT term, count(*) AS n FROM toks GROUP BY term
         ORDER BY n DESC, term LIMIT 20""",

    "bigram_condprob" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         c AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS n_bigram FROM b GROUP BY 1, 2),
         p AS (SELECT w1, sum(n_bigram)::BIGINT AS n_prefix FROM c GROUP BY 1)
         SELECT c.w1, c.w2, n_bigram, n_prefix,
           floor(n_bigram::DOUBLE / n_prefix * 1000000 + 0.5) / 1000000 AS condprob
         FROM c JOIN p USING (w1) WHERE n_bigram >= 5
         ORDER BY n_bigram DESC, w1, w2 LIMIT 50""",

    "corpus_gate" ->
      """WITH t AS (SELECT doc_id, lang, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         m AS (SELECT doc_id, lang, len(toks) AS n,
             len(list_filter(toks,
               x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
             length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
               greatest(length(text), 1) AS digit_ratio,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
             len(list_filter(toks, t -> t IN ('el','la','de','que','y'))) AS s_es,
             len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS s_de,
             len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr
           FROM t),
         r AS (SELECT doc_id, max(c) AS mr FROM (
                 SELECT doc_id, gm, count(*) AS c FROM (
                   SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                     THEN list_transform(generate_series(1, len(toks) - 1),
                            i -> array_to_string(toks[i:i+1], ' '))
                     ELSE [array_to_string(toks, ' ')] END) AS gm FROM t)
                 GROUP BY doc_id, gm)
               GROUP BY doc_id),
         f AS (SELECT m.doc_id,
             n < 30 AS f_short,
             least(1.0, greatest(0.0, 0.2 + 0.01 * n
               + stops::DOUBLE / greatest(n, 1) - 5.0 * digit_ratio)) < 0.6 AS f_quality,
             mr > 2 AS f_repeat,
             (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                   WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                   WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END) <> lang AS f_lang
           FROM m JOIN r ON m.doc_id = r.doc_id)
         SELECT 'too_short' AS rule, count(*) FILTER (f_short)::BIGINT AS n_docs FROM f
         UNION ALL SELECT 'low_quality', count(*) FILTER (f_quality)::BIGINT FROM f
         UNION ALL SELECT 'repetitive', count(*) FILTER (f_repeat)::BIGINT FROM f
         UNION ALL SELECT 'off_language', count(*) FILTER (f_lang)::BIGINT FROM f
         UNION ALL SELECT 'pass', count(*) FILTER (NOT f_short AND NOT f_quality
           AND NOT f_repeat AND NOT f_lang)::BIGINT FROM f""",

    "doc_perplexity" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         bb AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         c AS (SELECT w1, w2, count(*) AS n_bigram FROM bb GROUP BY 1, 2),
         p AS (SELECT w1, sum(n_bigram)::BIGINT AS n_prefix FROM c GROUP BY 1),
         lm AS (SELECT c.w1, c.w2,
                  floor(-log2(n_bigram::DOUBLE / n_prefix) * 1000000 + 0.5)::BIGINT
                    AS ubits
                FROM c JOIN p USING (w1))
         SELECT doc_id, count(*) AS n_bigrams,
           floor(sum(ubits)::DOUBLE / count(*) + 0.5) / 1000000 AS avg_bits
         FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id""",

    // stupid-backoff trigram LM trained on the even-id half: each
    // level's surprisal frozen as micro-bits with alpha inside the
    // log (same libm-double protocol as doc_perplexity); coalesce
    // down the trigram -> bigram -> add-one-unigram chain
    "doc_perplexity_trigram" ->
      s"""$trigramPplCtes
         SELECT doc_id, count(*) AS n_trigrams,
           sum(CASE WHEN is_bi THEN 1 ELSE 0 END)::BIGINT AS n_bi_back,
           sum(CASE WHEN is_uni THEN 1 ELSE 0 END)::BIGINT AS n_uni_back,
           floor(sum(ubits)::DOUBLE / count(*) + 0.5) / 1000000 AS avg_bits
         FROM sc GROUP BY doc_id""",

    // the trigram signal driving the same per-lang tercile machinery
    "quality_buckets_trigram" ->
      s"""$trigramPplCtes,
         ppl AS (SELECT doc_id, floor(sum(ubits)::DOUBLE / count(*) + 0.5) / 1000000
                   AS avg_bits
                 FROM sc GROUP BY doc_id),
         s AS (SELECT d.doc_id, d.lang, avg_bits
               FROM documents d JOIN ppl ON d.doc_id = ppl.doc_id),
         thr AS (SELECT lang, quantile_cont(avg_bits, 1.0 / 3) AS t1,
                   quantile_cont(avg_bits, 2.0 / 3) AS t2
                 FROM s GROUP BY lang)
         SELECT s.doc_id, s.lang, avg_bits,
           CASE WHEN avg_bits <= t1 THEN 'head'
                WHEN avg_bits <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM s JOIN thr USING (lang)""",


    // add-one-smoothed target/corpus LM log-ratio, frozen per bigram
    // as micro-bits (same libm-double protocol as doc_perplexity),
    // doc weight = integer sum
    "dsir_weights" ->
      """WITH t AS (SELECT doc_id, lang = 'en' AS is_t,
                      list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT doc_id, is_t, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         bb AS (SELECT doc_id, is_t, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         c AS (SELECT w1, w2, count(*) AS n_all,
                 coalesce(sum(CASE WHEN is_t THEN 1 ELSE 0 END), 0) AS n_t
               FROM bb GROUP BY 1, 2),
         tot AS (SELECT sum(n_all)::BIGINT AS nn_all, sum(n_t)::BIGINT AS nn_t,
                   count(*)::BIGINT AS vocab FROM c),
         lm AS (SELECT w1, w2,
                  floor((log2((n_t + 1)::DOUBLE / (nn_t + vocab))
                       - log2((n_all + 1)::DOUBLE / (nn_all + vocab)))
                    * 1000000 + 0.5)::BIGINT AS rbits
                FROM c, tot)
         SELECT doc_id, count(*) AS n_bigrams, sum(rbits)::BIGINT AS dsir_mbits,
           sum(rbits) > 0 AS target_like
         FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id""",

    "quality_buckets" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
               FROM t WHERE len(toks) >= 2),
         bb AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         c AS (SELECT w1, w2, count(*) AS n_bigram FROM bb GROUP BY 1, 2),
         p AS (SELECT w1, sum(n_bigram)::BIGINT AS n_prefix FROM c GROUP BY 1),
         lm AS (SELECT c.w1, c.w2,
                  floor(-log2(n_bigram::DOUBLE / n_prefix) * 1000000 + 0.5)::BIGINT
                    AS ubits
                FROM c JOIN p USING (w1)),
         ppl AS (SELECT doc_id, floor(sum(ubits)::DOUBLE / count(*) + 0.5) / 1000000
                   AS avg_bits
                 FROM bb JOIN lm USING (w1, w2) GROUP BY doc_id),
         s AS (SELECT d.doc_id, d.lang, avg_bits
               FROM documents d JOIN ppl ON d.doc_id = ppl.doc_id),
         thr AS (SELECT lang, quantile_cont(avg_bits, 1.0 / 3) AS t1,
                   quantile_cont(avg_bits, 2.0 / 3) AS t2
                 FROM s GROUP BY lang)
         SELECT s.doc_id, s.lang, avg_bits,
           CASE WHEN avg_bits <= t1 THEN 'head'
                WHEN avg_bits <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM s JOIN thr USING (lang)""",

    "shingle_novelty" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
                    FROM documents),
         s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
         f AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g),
         nov AS (SELECT first_doc AS doc_id, count(*) AS n_novel FROM f GROUP BY first_doc)
         SELECT s.doc_id, len(s.sh)::BIGINT AS n_shingles,
           coalesce(nov.n_novel, 0)::BIGINT AS n_novel,
           floor(coalesce(nov.n_novel, 0)::DOUBLE / len(s.sh) * 10000 + 0.5) / 10000 AS novelty
         FROM s LEFT JOIN nov ON s.doc_id = nov.doc_id""",

    "gopher_rules" ->
      """WITH t AS (SELECT doc_id, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         m AS (SELECT doc_id, len(toks) AS n,
           list_sum(list_transform(toks, x -> length(x))) AS char_sum,
           len(list_filter(toks,
             x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
             greatest(length(text), 1) AS digit_ratio,
           len(list_distinct(toks)) AS n_dist
           FROM t)
         SELECT doc_id, n::BIGINT AS n_tokens,
           (n BETWEEN 5 AND 1000) AS r_word_count,
           (char_sum::DOUBLE / greatest(n, 1) BETWEEN 2.0 AND 10.0) AS r_avg_len,
           (stops >= 2) AS r_stop,
           (digit_ratio < 0.1) AS r_digit,
           (n_dist::DOUBLE / greatest(n, 1) >= 0.3) AS r_dup,
           ((n BETWEEN 5 AND 1000) AND (char_sum::DOUBLE / greatest(n, 1) BETWEEN 2.0 AND 10.0)
             AND (stops >= 2) AND (digit_ratio < 0.1)
             AND (n_dist::DOUBLE / greatest(n, 1) >= 0.3)) AS keep
         FROM m""",

    // naive-Bayes quality classifier: gopher-keep weak labels, add-one
    // per-class token counts, log-odds + class prior frozen as integer
    // micro-bits (the dsir protocol), per-doc integer sum vs 0
    "quality_classifier" ->
      """WITH t AS (SELECT doc_id, text,
                      list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents),
         m AS (SELECT doc_id, toks, len(toks) AS n,
           list_sum(list_transform(toks, x -> length(x))) AS char_sum,
           len(list_filter(toks,
             x -> x IN ('the','a','of','and','is','to','in','it','that','for'))) AS stops,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE /
             greatest(length(text), 1) AS digit_ratio,
           len(list_distinct(toks)) AS n_dist
           FROM t),
         lab AS (SELECT doc_id, toks,
           ((n BETWEEN 5 AND 1000) AND (char_sum::DOUBLE / greatest(n, 1) BETWEEN 2.0 AND 10.0)
             AND (stops >= 2) AND (digit_ratio < 0.1)
             AND (n_dist::DOUBLE / greatest(n, 1) >= 0.3)) AS label
           FROM m),
         inst AS (SELECT doc_id, label, unnest(toks) AS w FROM lab),
         c AS (SELECT w, count(*) AS n_all,
                 coalesce(sum(CASE WHEN label THEN 1 ELSE 0 END), 0) AS n_pos
               FROM inst GROUP BY 1),
         tot AS (SELECT sum(n_pos)::BIGINT AS np, sum(n_all - n_pos)::BIGINT AS nn,
                   count(*)::BIGINT AS vocab FROM c),
         lm AS (SELECT w,
                  floor((log2((n_pos + 1)::DOUBLE / (np + vocab))
                       - log2((n_all - n_pos + 1)::DOUBLE / (nn + vocab)))
                    * 1000000 + 0.5)::BIGINT AS rbits
                FROM c, tot),
         pri AS (SELECT floor(log2(
                   (sum(CASE WHEN label THEN 1 ELSE 0 END) + 1)::DOUBLE
                   / (sum(CASE WHEN label THEN 0 ELSE 1 END) + 1))
                   * 1000000 + 0.5)::BIGINT AS prior_mbits FROM lab),
         ds AS (SELECT doc_id, count(*) AS n_toks, sum(rbits)::BIGINT AS sum_rbits
                FROM inst JOIN lm USING (w) GROUP BY doc_id)
         SELECT lab.doc_id, label, coalesce(n_toks, 0)::BIGINT AS n_toks,
           (prior_mbits + coalesce(sum_rbits, 0))::BIGINT AS nb_mbits,
           (prior_mbits + coalesce(sum_rbits, 0)) > 0 AS predicted,
           ((prior_mbits + coalesce(sum_rbits, 0)) > 0) = label AS agree
         FROM lab LEFT JOIN ds USING (doc_id) CROSS JOIN pri""",

  )
}
