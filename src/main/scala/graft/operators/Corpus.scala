package graft.operators

import graft.operators.Caching.TrackedDf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * sampling, per-stratum rebalancing, sequence packing, and survivor
  * retrieval — the steps between "cleaned documents" and "training
  * shards".
  *
  * Design rules:
  *   - sampling decisions are pure row-local arithmetic on the id
  *     (Lehmer-style modular hash) — no RNG state, no sampling jobs,
  *     reproducible across engines, clusters, and reruns, and a
  *     re-run over an updated corpus keeps prior decisions stable;
  *   - packing is windowed per shard, so the global sort a naive
  *     packer needs becomes n_shards independent sorted streams —
  *     the 100 TB shape.
  */
object Corpus {

  /** Deterministic per-mille bucket in [0, 1000) from a numeric id:
    * (id·48271 + seed) mod (2³¹−1) mod 1000. Multiplier 48271 is the
    * classic MINSTD Lehmer constant; everything fits 62-bit integer
    * arithmetic, so any SQL engine reproduces it exactly.
    */
  def hashBucket(id: Column, seed: Long = 11L): Column =
    pmod(pmod(id.cast("long") * lit(48271L) + lit(seed), lit(2147483647L)), lit(1000L))

  /** Keep ~fraction of rows, decided per row by [[hashBucket]] —
    * a deterministic Bernoulli sample with zero shuffle and zero
    * driver involvement (contrast `df.sample`, whose output depends
    * on partition layout).
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, seed: Long = 11L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.where(hashBucket(col(idCol), seed) < lit((fraction * 1000).round))
  }

  /** Stratified rebalancing: per-stratum keep rates (e.g. downsample
    * dominant languages, keep all of rare ones). Rows in strata not
    * listed keep `defaultRate`. Same deterministic row-local decision
    * as [[hashSample]] — the standard "rebalance the language mix"
    * step before training, at scan speed.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      seed: Long = 11L): DataFrame = {
    val permille = rates.foldLeft(lit((defaultRate * 1000).round): Column) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * 1000).round)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), seed) < permille)
  }

  /** Greedy sequence packing: assign documents to fixed-token-budget
    * packs (the training-shard assembly step). Documents are streamed
    * in id order within `nShards` deterministic shards; a document
    * starts in the pack where its running token total lands:
    * pack = (cumsum(tokens) − tokens) div target.
    *
    * The window is partitioned by shard, so packing parallelizes to
    * `nShards` independent sorted streams instead of one global sort —
    * size nShards to the cluster. Output: one row per doc with its
    * (shard, pack_id, n_tokens) assignment.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetTokens: Long,
      nShards: Int): DataFrame = {
    require(targetTokens >= 1 && nShards >= 1, "targetTokens and nShards must be positive")
    val shard = pmod(col(idCol).cast("long"), lit(nShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(
      col(idCol),
      shard.as("shard"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // integer division (div), never double-divide-then-cast: exact
      // for any cum/target combination on any engine
      .withColumn("pack_id", expr(s"(cum - n_tokens) div ${targetTokens}L"))
      .drop("cum")
  }

  /** Shard-assembly QA report for [[packSequences]]: the pack-fill
    * distribution — for each fill decile (pack token total vs the
    * target budget, clamped at ≥100%: a pack can exceed target by up
    * to one straddling document), how many packs, documents, and
    * tokens land there. Near-empty tail packs and chronically
    * underfilled deciles are the signal to retune targetTokens or
    * nShards before shards ship.
    *
    * Scale shape: one (shard, pack) aggregation over packSequences'
    * windowed output, re-aggregated to ≤11 decile rows — all exact
    * integer arithmetic.
    *
    * @return (fill_decile, n_packs, n_docs, total_tokens)
    */
  def packFillReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetTokens: Long,
      nShards: Int): DataFrame =
    packSequences(df, idCol, textCol, targetTokens, nShards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("pack_tokens"), count(lit(1)).as("n_docs"))
      .groupBy(expr(s"least(pack_tokens * 10 div ${targetTokens}L, 10)")
        .as("fill_decile"))
      .agg(count(lit(1)).as("n_packs"), sum(col("n_docs")).as("n_docs"),
        sum(col("pack_tokens")).as("total_tokens"))

  /** Exact-dedup SURVIVOR ROWS (not just ids): one full row per
    * distinct content, the min-id winner. The aggregation carries each
    * group's payload once via min_by over the content-hash groups —
    * the shuffle key stays the 8-byte hash (plus one payload struct
    * per row), never a pairwise comparison. This is what a pipeline
    * feeds downstream after `Dedup.exact` decides the winners.
    */
  def dedupSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(min_by(payload, col(idCol)).as("survivor"))
      .select(col("survivor.*"))
  }

  /** Benchmark decontamination: per corpus document, how many of its
    * distinct n-gram shingles also occur anywhere in `benchmark` —
    * the standard "does training data leak the eval set" check.
    *
    * Scale shape: the benchmark's distinct shingle hashes are tiny
    * compared to the corpus (eval sets are MBs against TBs), so they
    * BROADCAST; the corpus side explodes its shingle set and probes
    * the broadcast hash table in the scan stage — the corpus is never
    * shuffled, and unmatched docs survive via a left join. 8-byte FNV
    * shingle hashes ([[Dedup.hashedShingleSet]]), never raw text.
    */
  def contamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val benchShingles = benchmark
      .select(explode(Dedup.hashedShingleSet(col(textCol), n)).as("sh"))
      .distinct()
    val hits = corpus
      .select(col(idCol), explode(Dedup.hashedShingleSet(col(textCol), n)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"))
      // shingle sets are distinct per doc, so plain count = distinct count
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
    corpus
      .select(col(idCol),
        size(Dedup.hashedShingleSet(col(textCol), n)).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Global-quantile gate: keep rows whose `scoreCol` is at or above
    * the exact interpolated q-quantile of the WHOLE corpus ("keep the
    * top quartile by quality"). Two-phase, no global sort: the
    * quantile is one partial-aggregable scan reduced to a single
    * scalar row, broadcast back into every partition's filter — the
    * corpus itself is never shuffled or ranked (contrast percent_rank,
    * whose global window is a total sort). The threshold stays a plan
    * value (cross join against a 1-row broadcast), so building the
    * gate triggers no job.
    */
  def quantileFilter(
      df: DataFrame,
      scoreCol: String,
      q: Double,
      keepUpper: Boolean = true): DataFrame = {
    require(q > 0 && q < 1, "q must be in (0,1)")
    val thr = df.agg(expr(s"percentile($scoreCol, $q)").as("__thr"))
    val keep =
      if (keepUpper) col(scoreCol) >= col("__thr") else col(scoreCol) < col("__thr")
    df.crossJoin(broadcast(thr)).where(keep).drop("__thr")
  }

  /** [[quantileFilter]] with BOUNDED aggregation state — the 100 TB
    * path when the score column's cardinality is unbounded: exact
    * `percentile`'s partial-agg state carries one entry per distinct
    * value (fine for integer cents/token counts, unbounded for
    * free-form doubles), while the histogram sketch carries exactly
    * `nBins` counters per partition no matter the corpus. The gate
    * threshold is the sketch's q-quantile estimate (the upper edge of
    * the rank bin — within one bin width of the true quantile by
    * construction), broadcast back into a row-local filter exactly
    * like [[quantileFilter]]; the corpus is never shuffled or ranked.
    *
    * "Measure, don't guess": the exact interpolated quantile rides
    * along ([[quantileSketch]]'s measurement convention) and every
    * output row carries (thr_est, thr_exact, thr_err) — the error is
    * part of the result, not a claim. At true scale drop the exact
    * side; it exists to price the approximation.
    */
  def quantileFilterSketch(
      df: DataFrame,
      scoreCol: String,
      q: Double,
      binWidthCents: Long,
      nBins: Int,
      keepUpper: Boolean = true): DataFrame = {
    require(q > 0 && q < 1, "q must be in (0,1)")
    val thr = quantileSketch(df, scoreCol, binWidthCents, nBins, Seq(q))
      .select(col("est_upper").as("thr_est"), col("exact").as("thr_exact"))
    val keep =
      if (keepUpper) col(scoreCol) >= col("thr_est") else col(scoreCol) < col("thr_est")
    df.crossJoin(broadcast(thr)).where(keep)
      .withColumn("thr_err",
        floor((col("thr_est") - col("thr_exact")) * 10000 + lit(0.5)) / 10000)
  }

  /** Sliding-window chunking: split each document into fixed-size
    * token windows with overlap (window `w`, stride `s` — the
    * standard context-window preparation before tokenized training
    * shards). Each doc yields ceil((n−w)/s)+1 chunks (min 1, so empty
    * or short docs still emit one row); chunk i covers tokens
    * [i·s+1, i·s+w], clamped at the end.
    *
    * Row-local throughout: tokenize → per-row chunk-count arithmetic →
    * explode over a generated index sequence → slice. No shuffle, no
    * window, no state; output size is bounded by the w/s overlap
    * factor (≈ n/s chunks per doc), never quadratic.
    */
  def chunkSliding(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be positive")
    require(stride <= window, "stride > window would drop tokens between chunks")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      // exact-integer boundary: (n-w)/s hits ceil boundaries only at
      // exact multiples, where IEEE division is exact on both engines
      .withColumn("__nc",
        greatest(lit(1L), ceil((size(col("__tk")) - lit(window)) / lit(stride.toDouble)) + lit(1L)))
      .select(col(idCol), col("__tk"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        expr(s"slice(__tk, chunk_id * $stride + 1, $window)").as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Mixture capping: downsample every over-represented source so none
    * exceeds `maxFrac` of the original corpus ("no single crawl may
    * dominate the mix"). Phase 1 computes per-source keep rates from
    * two tiny aggregates (per-source counts × the global total);
    * phase 2 broadcasts the rate table (|distinct sources| rows) into
    * a row-local [[hashBucket]] filter. The corpus is scanned once and
    * never shuffled; decisions are deterministic and stable across
    * reruns, like all sampling here.
    */
  def capSources(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      maxFrac: Double,
      seed: Long = 11L): DataFrame = {
    require(maxFrac > 0 && maxFrac <= 1, "maxFrac must be in (0,1]")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__cnt"))
    val total = df.agg(count(lit(1)).as("__tot"))
    // permille = floor(min(1, maxFrac·tot/cnt)·1000); plain IEEE ops in
    // a fixed order so any engine lands on the identical integer
    val rates = counts.crossJoin(broadcast(total))
      .select(col(sourceCol),
        floor(least(lit(1.0), lit(maxFrac) * col("__tot") / col("__cnt")) * 1000)
          .as("__permille"))
    df.join(broadcast(rates), Seq(sourceCol))
      .where(hashBucket(col(idCol), seed) < col("__permille"))
      .drop("__permille")
  }

  /** Deterministic train/val/test assignment: each row lands in the
    * split whose cumulative permille range contains its [[hashBucket]]
    * value. Row-local, zero shuffle, stable across reruns — adding
    * documents to the corpus never moves an existing document between
    * splits (the property random splits lack, and the reason eval
    * contamination creeps into retrained models).
    */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: Long = 11L): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) => acc + (f * 1000).round }
    val bucket = hashBucket(col(idCol), seed)
    val assign = splits.zip(cuts.sliding(2).toSeq).foldLeft(lit(splits.last._1): Column) {
      case (acc, ((name, _), Seq(lo, hi))) =>
        when(bucket >= lo && bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic training-order shuffle, sharded: scramble key =
    * full-range Lehmer hash of the id, shard = key mod nShards, pos =
    * position within the shard in scramble order. This is how training
    * order gets randomized at 100 TB — nShards independent window
    * sorts (one per output shard file), never ONE global ORDER BY,
    * which would funnel the corpus through a single range-sorted
    * window. Reproducible: same corpus, same order, any cluster.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int, seed: Long = 11L): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    // TWO Lehmer rounds: one round is monotone over any id range that
    // doesn't wrap the modulus (id·48271+seed < 2³¹ for id ≲ 4·10⁴),
    // which would make "scramble order" silently equal id order. The
    // second multiply wraps thousands of times over any realistic
    // range; max intermediate (p−1)·48271 ≈ 1.0e14 stays in 62 bits.
    val scramble = pmod(
      pmod(col(idCol).cast("long") * lit(48271L) + lit(seed), lit(2147483647L)) * lit(48271L),
      lit(2147483647L))
    val w = Window.partitionBy(col("shard")).orderBy(col("scramble"), col(idCol))
    df.select(col(idCol))
      .withColumn("scramble", scramble)
      .withColumn("shard", pmod(col("scramble"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("scramble")
  }

  /** Per-document repetition statistics over n-gram multiplicities:
    * total shingles, distinct shingles, and the count of the most
    * repeated shingle — the inputs to any repetition-based quality
    * filter (boilerplate, spam, degenerate generations).
    *
    * Entirely row-local: the native [[graft.functions.VectorExprs.shingleStats]]
    * kernel hashes, sorts, and run-scans each doc's shingles in one
    * compiled pass. Per-doc statistics never need a shuffle — the
    * previous explode → groupBy(doc, hash) → groupBy(doc) design put
    * EVERY shingle occurrence in the corpus on the wire; this puts
    * none. (Round-robin repartition only spreads the CPU-bound scan
    * across cores when the input is a single unsplittable row group.)
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Dedup.rebalance(df)
      .select(col(idCol),
        graft.functions.VectorExprs
          .shingleStats(TextAnalysis.tokens(col(textCol)), n).as("s"))
      .select(col(idCol),
        col("s.n_shingles").as("n_shingles"),
        col("s.n_distinct").as("n_distinct"),
        col("s.max_repeat").as("max_repeat"))

  /** Per-document lexical diversity via the Simpson index:
    * simpson = 1 − Σc²/n² over the doc's token counts (probability two
    * random token draws differ), and effective_vocab = n²/Σc² (the
    * vocabulary size a uniform distribution would need for the same
    * concentration) — the quality signal that separates natural prose
    * from keyword-stuffed or template text at equal length.
    *
    * Entirely row-local (the one-pass ShingleStats kernel at n=1
    * carries Σc² out of its run-scan), ZERO shuffled rows — and the
    * index is a ratio of exact integers, so both sides of the oracle
    * divide the same numbers. Docs with no tokens are dropped (no
    * distribution to measure), matching the oracle's empty unnest.
    */
  def tokenDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.rebalance(df)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col(idCol),
        graft.functions.VectorExprs.shingleStats(col("toks"), 1).as("s"))
      .select(col(idCol),
        col("s.n_shingles").as("n_tokens"),
        col("s.n_distinct").as("n_distinct"),
        col("s.sum_sq").as("sum_sq"),
        (floor((lit(1) - col("s.sum_sq").cast("double")
          / (col("s.n_shingles") * col("s.n_shingles"))) * 1000000 + lit(0.5)) / 1000000)
          .as("simpson"),
        (floor((col("s.n_shingles") * col("s.n_shingles")).cast("double")
          / col("s.sum_sq") * 10000 + lit(0.5)) / 10000)
          .as("effective_vocab"))

  /** Boilerplate scoring: the fraction of each doc's distinct n-gram
    * shingles that are corpus-frequent (present in ≥ minDocs docs) —
    * the token-stream analogue of C4's repeated-line stripping
    * (headers, footers, nav chrome recur across a crawl; prose
    * doesn't). Docs above a ratio cutoff are boilerplate-dominated.
    *
    * 100 TB path: shingle document frequency aggregates 8-byte hashes
    * (one row per distinct shingle per doc, never positions); the
    * frequent set after the ≥ minDocs cut is vocabulary-sized — MBs
    * against a TB corpus — so it BROADCASTS back, and each doc's hit
    * count comes from a map-side broadcast-hash probe of its exploded
    * set. The corpus text itself is never shuffled.
    */
  def boilerplateScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      minDocs: Long): DataFrame = {
    val sets = Dedup.rebalance(df)
      .select(col(idCol),
        Dedup.hashedShingleSet(col(textCol), shingleSize).as("hs"))
      .withColumn("n_shingles", size(col("hs")).cast("long"))
      .persistTracked
    val frequent = sets.select(explode(col("hs")).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)
      .select(col("sh"))
    val hits = sets.select(col(idCol), explode(col("hs")).as("sh"))
      .join(broadcast(frequent), "sh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_boiler"))
    sets.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(col("n_shingles") > 0,
          coalesce(col("n_boiler"), lit(0L)).cast("double") / col("n_shingles"))
          .otherwise(lit(0.0)).as("boiler_ratio"))
  }

  /** Per-source token-budget selection: rank each source's docs
    * longest-first (ties to smallest id), keep docs while the running
    * token total stays within `budgetTokens` — the "fill each mixture
    * component to its token quota" step of corpus assembly.
    *
    * 100 TB path: the running sum is NOT a per-source window (that
    * puts an entire source — possibly most of the corpus — through
    * one reducer). Instead: (1) a (source, n_tokens) histogram
    * aggregates the corpus to vocabulary-sized rows; (2) the
    * histogram-level running sum — tiny — computes each length
    * group's tokens-before; (3) the group offsets BROADCAST back and
    * the per-doc running sum needs only a (source, n_tokens)-keyed
    * window, i.e. one fine-grained partition per length group, never
    * one partition per source. Worst case (every doc the same length)
    * degenerates to the per-source window; real length distributions
    * keep groups small.
    *
    * @return (id, source, n_tokens, cum_tokens) for kept docs
    */
  def budgetSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budgetTokens: Long): DataFrame = {
    val base = df.select(col(idCol), col(sourceCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val hist = base.groupBy(col(sourceCol), col("n_tokens"))
      .agg(sum(col("n_tokens")).as("grp_tokens"))
    val wh = Window.partitionBy(col(sourceCol)).orderBy(col("n_tokens").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col(sourceCol), col("n_tokens"),
      coalesce(sum(col("grp_tokens")).over(wh), lit(0L)).as("cum_before"))
      // groups that start at/after the budget can never contribute
      .where(col("cum_before") < budgetTokens)
    val wd = Window.partitionBy(col(sourceCol), col("n_tokens"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsets), Seq(sourceCol, "n_tokens"))
      .withColumn("cum_tokens", col("cum_before") + sum(col("n_tokens")).over(wd))
      .where(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Snapshot diff: per-doc status between two corpus versions —
    * added / removed / changed / unchanged, the "what did the new
    * crawl do" report that gates incremental reprocessing (only
    * added+changed docs re-enter the pipeline).
    *
    * 100 TB path: each side reduces to (id, 64-bit content hash) in
    * its scan stage; the full-outer join shuffles 16-byte rows keyed
    * by id — document text never crosses the wire.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"), xxhash64(col(textCol)).as("h_old"))
    val n = newDf.select(col(idCol).as("id"), xxhash64(col(textCol)).as("h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Novelty scoring: the fraction of each doc's distinct n-gram
    * shingles that appear for the FIRST time in this doc, scanning the
    * corpus in id order — a snapshot/crawl freshness signal (near-copies
    * of earlier documents score ≈0; genuinely new text scores ≈1).
    * Complements [[boilerplateScore]]: boilerplate measures cross-doc
    * frequency, novelty measures first occurrence.
    *
    * 100 TB path: one shuffle of 8-byte shingle hashes for the
    * min-doc-id aggregate (partial agg applies — each mapper emits one
    * candidate per distinct shingle). The per-doc novel count needs NO
    * join-back through the corpus: it is just the first-seen table
    * re-grouped by its min id. Only the final id-keyed stats join
    * touches per-doc rows, and both sides of it are id+counters — the
    * corpus text is never shuffled.
    *
    * Mirrors the reference's chunk-level recurrence checks done with a
    * shared seen-set dict; on Spark the "seen set" is the groupBy.
    */
  /** Co-occurrence pair mining (market-basket shape): unordered item
    * pairs that appear in ≥ minSupport groups. ONE shuffle collects
    * each group's distinct items (collect_set, partial-aggregable);
    * pair generation is then ROW-LOCAL over the sorted basket array —
    * bounded by basket size², never a corpus self-join — and the pair
    * counts partial-agg before the second (pair-keyed) shuffle. The
    * previous self-join-on-group-key plan pushed every generated pair
    * row through an exchange before counting; this one puts only
    * (group → basket) rows and combined pair counts on the wire.
    */
  def basketPairs(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      minSupport: Long): DataFrame = {
    df.groupBy(col(groupCol))
      .agg(array_sort(collect_set(col(itemCol))).as("p"))
      .where(size(col("p")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(p) - 2),
          |  i -> transform(sequence(i + 1, size(p) - 1),
          |    j -> struct(p[i] AS part_a, p[j] AS part_b))))""".stripMargin)).as("bg"))
      .select(col("bg.part_a").as("part_a"), col("bg.part_b").as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Pairwise source-overlap matrix: exact Jaccard between each pair
    * of sources' DISTINCT shingle vocabularies — the corpus-curation
    * question "how much of source B is already in source A?" answered
    * before mixing weights are chosen (two crawls of the same sites
    * should be merged, not double-weighted).
    *
    * 100 TB path: the corpus collapses to one row per distinct
    * (source, shingle-hash) in its scan stage — 8-byte hashes, never
    * text. Intersection counts are [[basketPairs]] with the roles
    * flipped (group = shingle hash, item = source): one hash-keyed
    * shuffle collects each shingle's source set, the ≤nSources² pair
    * blowup is row-local, and pair counts partial-agg — no self-join
    * re-shuffling the vocabulary twice. Per-source set sizes are a
    * vocabulary-bounded agg that broadcasts back onto the pair
    * counts. Jaccard is a ratio of exact integers under the half-up
    * floor protocol, so any engine reproduces it bit-exactly.
    */
  def sourceOverlap(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      shingleSize: Int): DataFrame = {
    // persisted: feeds the size agg AND the intersection counts
    val e = Dedup.rebalance(df)
      .select(col(groupCol).as("g"),
        explode(Dedup.hashedShingleSet(col(textCol), shingleSize)).as("sh"))
      .distinct()
      .persistTracked
    val sizes = e.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = basketPairs(e, "sh", "g", 1L)
      .select(col("part_a").as("source_a"), col("part_b").as("source_b"),
        col("support").as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("g").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(sizes.select(col("g").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("n_inter"),
        (floor(col("n_inter").cast("double")
          / (col("n_a") + col("n_b") - col("n_inter")) * 1000000 + lit(0.5)) / 1000000)
          .as("jaccard"))
  }

  def shingleNovelty(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int): DataFrame = {
    val sets = Dedup.rebalance(df)
      .select(col(idCol),
        Dedup.hashedShingleSet(col(textCol), shingleSize).as("hs"))
      .withColumn("n_shingles", size(col("hs")).cast("long"))
      .persistTracked
    val novel = sets.select(col(idCol), explode(col("hs")).as("sh"))
      .groupBy(col("sh")).agg(min(col(idCol)).as("first_doc"))
      .groupBy(col("first_doc").as(idCol))
      .agg(count(lit(1)).as("n_novel"))
    sets.join(novel, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        // bit-deterministic half-up rounding (the r4 protocol): both
        // engines divide, scale, floor the same IEEE doubles
        (floor(coalesce(col("n_novel"), lit(0L)).cast("double")
          / col("n_shingles") * 10000 + lit(0.5)) / 10000).as("novelty"))
  }

  /** CCNet-style quality bucketing: split each language's documents
    * into head / middle / tail terciles by a quality score (lower =
    * better, e.g. [[TextAnalysis.docPerplexity]] bits). Downstream
    * mixture recipes then sample head-heavy per language.
    *
    * Scale shape: NOT an ntile window — ranking a 100 TB corpus per
    * language is a per-language total sort. Instead the two tercile
    * cutoffs collapse to one row per language (exact interpolated
    * percentile, partial-aggregable) and broadcast back as a map-side
    * probe; each document then buckets itself by two comparisons in
    * the scan stage. Same two-phase shape as [[quantileFilter]],
    * grouped by language.
    *
    * @return (id, lang, score, bucket) with bucket ∈ head|middle|tail
    */
  def qualityBuckets(
      scored: DataFrame,
      idCol: String,
      langCol: String,
      scoreCol: String): DataFrame = {
    // persisted: the (id, lang, score) projection feeds the cutoff agg
    // AND the bucket join — without it the (possibly expensive) scoring
    // subtree upstream runs twice. Slim rows: 3 columns, never the text.
    val s = scored.select(col(idCol), col(langCol), col(scoreCol))
      .persistTracked
    val thr = s.groupBy(col(langCol))
      .agg(expr(s"percentile($scoreCol, 1.0D / 3)").as("t1"),
        expr(s"percentile($scoreCol, 2.0D / 3)").as("t2"))
    s.join(broadcast(thr), langCol)
      .select(col(idCol), col(langCol), col(scoreCol),
        when(col(scoreCol) <= col("t1"), lit("head"))
          .when(col(scoreCol) <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Filter-funnel report: how many documents each standard quality
    * gate would drop, plus the count passing every gate — the summary
    * a pipeline prints before committing a corpus drop. Rules: too
    * short (token count), low composite quality, repeated-bigram spam
    * (max shingle multiplicity), and language-label disagreement with
    * the n-gram language-ID. A doc can trip several rules; `pass`
    * counts docs tripping none.
    *
    * Scale shape: every rule is row-local (native one-pass kernels —
    * shingleStats needs no explode), so the whole report is ONE corpus
    * scan reduced by a sum-of-CASEs partial agg to a single row,
    * unpivoted via stack. Nothing but five counters crosses the wire.
    */
  def corpusGate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      minTokens: Int,
      minQuality: Double,
      maxRepeat: Long): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val flags = Dedup.rebalance(df).select(
      (size(toks) < minTokens).as("f_short"),
      (TextAnalysis.qualityScore(col(textCol), toks) < minQuality).as("f_quality"),
      (graft.functions.VectorExprs.shingleStats(toks, 2)
        .getField("max_repeat") > maxRepeat).as("f_repeat"),
      (TextAnalysis.langId(toks) =!= col(langCol)).as("f_lang"))
    // coalesce: sum over an EMPTY corpus is NULL, and the report's
    // contract is a count — zero, not null
    def cnt(c: Column) = coalesce(sum(when(c, 1).otherwise(0)), lit(0)).cast("long")
    flags.agg(
      cnt(col("f_short")).as("ns"),
      cnt(col("f_quality")).as("nq"),
      cnt(col("f_repeat")).as("nr"),
      cnt(col("f_lang")).as("nl"),
      cnt(!col("f_short") && !col("f_quality") && !col("f_repeat")
        && !col("f_lang")).as("np"))
      .selectExpr("""stack(5,
        'too_short', ns,
        'low_quality', nq,
        'repetitive', nr,
        'off_language', nl,
        'pass', np) AS (rule, n_docs)""")
  }

  /** Per-group distinct-token cardinality estimate via linear
    * (bitmap) counting, evaluated against the exact count — the
    * fixed-size-sketch answer to COUNT(DISTINCT) at corpus scale,
    * shipped with its measured error like every approximation here.
    * Each token hashes (FNV-1a, the engine's deterministic hash with
    * a bit-exact SQL replay) into one of `m` slots; with v slots
    * occupied the maximum-likelihood estimate is −m·ln(1 − v/m).
    *
    * Scale shape: the sketch side map-side partial-aggregates to ≤ m
    * rows per group per partition, so the shuffle is m-bounded no
    * matter the corpus — THE point versus exact distinct, whose
    * shuffle carries the vocabulary. (The exact side here exists to
    * measure the estimate and is itself vocabulary-bounded.) All
    * arithmetic before the final ln is exact integers; the estimate
    * freezes under the half-up floor protocol. A saturated bitmap
    * (v = m) has no finite estimate and reports NULL.
    *
    * @return (group, n_exact, v_filled, n_est) per group
    */
  /** Histogram quantile sketch vs exact percentiles: approximate
    * quantiles from a fixed-width bin histogram — nBins counters of
    * state no matter the corpus (exact percentile's aggregation state
    * carries the observed values). The estimate for quantile q is the
    * upper edge of the first bin whose cumulative count reaches
    * ceil(q·n); the error bound is one bin width by construction, and
    * the exact interpolated percentile rides along (on integer cents,
    * the engine's proven cross-engine-exact percentile path) so the
    * error is measured.
    *
    * Scale shape: one corpus scan partial-aggregates to ≤ nBins rows;
    * the cumulative walk and rank probe run on that bounded table (the
    * single-partition window is fine THERE — nBins rows, not corpus
    * rows; the rank probe is a broadcast of |qs| rows against nBins).
    * All sketch arithmetic is integer counts — bit-exact anywhere.
    *
    * @return (q, rank, est_upper, exact) per requested quantile
    */
  def quantileSketch(
      df: DataFrame,
      valCol: String,
      binWidthCents: Long,
      nBins: Int,
      qs: Seq[Double]): DataFrame = {
    // clamped on BOTH ends: without greatest(0) a negative value would
    // produce a negative bin index and an est_upper below the histogram
    // range, silently voiding the one-bin-width error bound (negative
    // inputs land in bin 0 — also where Spark's truncating `div` and
    // floor-division engines are reconciled)
    val hist = df.select(
      greatest(lit(0L),
        least(expr(s"CAST(floor($valCol * 100 + 0.5D) AS BIGINT) div $binWidthCents"),
          lit(nBins - 1L))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .persistTracked
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranks = hist.agg(sum(col("c")).as("n"))
      .select(posexplode(array(qs.map(lit): _*)).as(Seq("qi", "q")), col("n"))
      .select(col("qi"), col("q"), ceil(col("q") * col("n")).cast("long").as("rank"))
    val exact = df.agg(expr(
      s"percentile(CAST(floor($valCol * 100 + 0.5D) AS BIGINT), array(${qs.mkString("D, ")}D))")
      .as("exs"))
    cum.join(broadcast(ranks), col("cum") >= col("rank"))
      .groupBy(col("qi"), col("q"), col("rank"))
      .agg(min(col("bin")).as("bin"))
      .crossJoin(broadcast(exact))
      .select(col("q"), col("rank"),
        (((col("bin") + 1) * binWidthCents).cast("double") / 100).as("est_upper"),
        (floor(element_at(col("exs"), col("qi") + 1) / 100 * 10000 + lit(0.5)) / 10000)
          .as("exact"))
  }

  def distinctSketch(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      m: Int = 4096): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val toks = Dedup.rebalance(df).select(col(groupCol).as("g"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val slots = toks.select(col("g"),
      graft.functions.VectorExprs.tokenHash64(col("tok"))
        .bitwiseAND(lit((m - 1).toLong)).as("slot"))
      .distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("v_filled"))
    val exact = toks.distinct().groupBy(col("g")).agg(count(lit(1)).as("n_exact"))
    exact.join(slots, Seq("g"))
      .select(col("g").as(groupCol), col("n_exact"), col("v_filled"),
        when(col("v_filled") < m,
          floor(lit(-m) * log(lit(1.0) - col("v_filled").cast("double") / m) + lit(0.5))
            .cast("long"))
          .otherwise(lit(null)).as("n_est"))
  }

  /** HyperLogLog distinct count per group (Flajolet et al. 2007) —
    * the at-scale successor to [[distinctSketch]]'s linear counting,
    * which saturates (n_est NULL) once every slot fills: HLL's m
    * registers estimate cardinalities far beyond m with ~1.04/√m
    * relative error, still in O(m) state per group.
    *
    * Cross-engine exactness protocol: the register rank is a pure
    * integer CASE chain over a 32-bit hash window (no float log2, no
    * leading-zeros builtin — both engines evaluate the same generated
    * comparisons); the harmonic denominator is summed in exact integer
    * units of 2⁻³³ (register rank ≤ 33 by construction, so 2^(33−M)
    * is a positive long and the sum is order-independent — a float
    * sum of dyadic rationals would be merge-order-dependent past 53
    * bits); the α·m²/Z estimator and the small-range linear-counting
    * correction are single terminal float expressions with
    * literal-identical text in the SQL oracle.
    *
    * Scale shape: one (group, register) max-rank aggregation (map-side
    * partial max), register table m-bounded per group, vocabulary
    * hashed once. No large-range correction — 32-bit windows are fine
    * to ~10⁸ distinct per group; widen the window before that.
    */
  def hllSketch(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      p: Int = 8): DataFrame = {
    // verified envelope: the alpha table covers m in {16,32,64} exactly
    // and the closed form from m=128 up, and the engine<->oracle
    // bit-identity of the 32-bit rank window is pinned at the deployed
    // p=8 -- widening p past 8 needs its own oracle replay, so reject
    // it rather than estimate subtly off
    require(p >= 4 && p <= 8, "p (register address bits) must be in [4, 8]")
    val m = 1 << p
    val toks = Dedup.rebalance(df).select(col(groupCol).as("g"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val regs = hllRegisters(toks, p)
    val z = hllZSparse(regs, Seq("g"), m)
    val exact = toks.distinct().groupBy(col("g")).agg(count(lit(1)).as("n_exact"))
    exact.join(z, Seq("g"))
      .select(col("g").as(groupCol), col("n_exact"),
        hllEstimate(m, col("z_scaled"), col("v_zero")).as("n_est_hll"))
  }

  /** Sparse HLL register table (g, j, mreg) from a (g, tok) stream —
    * the shared kernel under [[hllSketch]] and [[sourceOverlapHll]].
    * FNV alone cannot feed HLL: its high bits lack avalanche on short
    * similar keys (160/256 top-byte values hit over 20k sequential
    * tokens → 96 permanently-empty registers), so the murmur3
    * finalizer runs over the hash before any bit is addressed. Rank
    * window = the 32 bits strictly BELOW the register index (shift
    * the p index bits out first): any window that overlaps the index
    * correlates rho with the register and biases the estimate. For
    * the default p=8 this is bit-identical to (h >>> 24) &
    * 0xFFFFFFFF, which the SQL oracle replays. Present registers
    * always carry mreg ≥ 1 (rho ∈ [1, 33]), so absent == zero.
    */
  private def hllRegisters(toks: DataFrame, p: Int): DataFrame = {
    val hashed = toks
      .select(col("g"), graft.functions.VectorExprs.fmix64(
        graft.functions.VectorExprs.tokenHash64(col("tok"))).as("h"))
      .select(col("g"),
        shiftrightunsigned(col("h"), 64 - p).cast("int").as("j"),
        shiftrightunsigned(shiftleft(col("h"), p), 32).as("w"))
    val rho = (1 to 32).foldLeft(when(lit(false), lit(0))) { (acc, r) =>
      acc.when(col("w") >= lit(1L << (32 - r)), lit(r))
    }.otherwise(lit(33))
    hashed.select(col("g"), col("j"), rho.as("r"))
      .groupBy(col("g"), col("j")).agg(max(col("r")).as("mreg"))
  }

  /** Harmonic denominator + zero-register count per key set, straight
    * off the SPARSE register table: absent registers each contribute
    * 2³³ to the scaled sum and 1 to v_zero, so the explicit 0-fill
    * explode the m-row-per-group dense form needs never happens —
    * identical integers, m-bounded agg state.
    */
  private def hllZSparse(regs: DataFrame, keys: Seq[String], m: Int): DataFrame =
    regs.groupBy(keys.map(col): _*).agg(
      (sum(call_function("shiftleft", lit(1L), lit(33) - col("mreg")))
        + (lit(m.toLong) - count(lit(1))) * lit(1L << 33)).as("z_scaled"),
      (lit(m.toLong) - count(lit(1))).as("v_zero"))

  /** The HLL estimator as one terminal expression: α·m²·2³³/Z with the
    * small-range linear-counting correction; literal-identical text in
    * the SQL oracles. The 0.7213/(1+1.079/m) closed form is the m≥128
    * approximation; small m carries the standard per-m constants.
    */
  private def hllEstimate(m: Int, zScaled: Column, vZero: Column): Column = {
    val alpha = lit(m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m.toDouble)
    })
    val eRaw = alpha * lit(m.toDouble * m) * lit(8589934592.0) /
      zScaled.cast("double")
    when(eRaw <= lit(2.5 * m) && vZero > 0,
      floor(lit(m.toDouble) * log(lit(m.toDouble) / vZero.cast("double"))
        + lit(0.5)))
      .otherwise(floor(eRaw + lit(0.5))).cast("long")
  }

  /** Pairwise source-vocabulary set operations from HLL registers —
    * the BOUNDED-STATE twin of [[sourceOverlap]]: union cardinality
    * from register-wise max (HLL's lossless merge), intersection by
    * inclusion-exclusion, with the exact intersection carried so the
    * sketch error is MEASURED in-query (the protocol every
    * approximate channel here follows).
    *
    * 100 TB shape: [[sourceOverlap]]'s exact path shuffles one row
    * per distinct (source, hash) — the vocabulary itself. Here each
    * source collapses to m registers (2 KB at p=8) in one map-side-
    * partial max agg, and every pairwise union/estimate is arithmetic
    * over ≤ nSources²·m tiny rows. The exact-intersection side rides
    * along at graded scale as the error oracle; at 100 TB you drop it
    * and keep the register table.
    */
  def sourceOverlapHll(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      p: Int = 8): DataFrame = {
    // verified envelope: the alpha table covers m in {16,32,64} exactly
    // and the closed form from m=128 up, and the engine<->oracle
    // bit-identity of the 32-bit rank window is pinned at the deployed
    // p=8 -- widening p past 8 needs its own oracle replay, so reject
    // it rather than estimate subtly off
    require(p >= 4 && p <= 8, "p (register address bits) must be in [4, 8]")
    val m = 1 << p
    val toks = Dedup.rebalance(df).select(col(groupCol).as("g"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val regs = hllRegisters(toks, p).persistTracked
    val singles = hllZSparse(regs, Seq("g"), m)
      .select(col("g"), hllEstimate(m, col("z_scaled"), col("v_zero")).as("est"))
    val gs = regs.select(col("g")).distinct()
    val pairsDf = gs.select(col("g").as("source_a"))
      .crossJoin(gs.select(col("g").as("source_b")))
      .where(col("source_a") < col("source_b"))
    // union registers: explode the pair to its two members and pull
    // each member's registers through an EQUI-join (no OR-condition
    // nested-loop), then register-wise max — HLL's exact merge
    val unionRegs = pairsDf
      .select(col("source_a"), col("source_b"),
        explode(array(col("source_a"), col("source_b"))).as("g"))
      .join(regs, "g")
      .groupBy(col("source_a"), col("source_b"), col("j"))
      .agg(max(col("mreg")).as("mreg"))
    val unionEst = hllZSparse(unionRegs, Seq("source_a", "source_b"), m)
      .select(col("source_a"), col("source_b"),
        hllEstimate(m, col("z_scaled"), col("v_zero")).as("est_union"))
    // exact intersection over the SAME hashed domain the sketch sees
    // (two tokens colliding at 64 bits must count once on both sides):
    // basketPairs with group = token hash, item = source
    val dt = toks.select(col("g"),
      graft.functions.VectorExprs.fmix64(
        graft.functions.VectorExprs.tokenHash64(col("tok"))).as("h"))
      .distinct()
    val inter = basketPairs(dt, "h", "g", 1L)
      .select(col("part_a").as("source_a"), col("part_b").as("source_b"),
        col("support").as("n_inter_exact"))
    pairsDf
      .join(broadcast(singles.select(col("g").as("source_a"), col("est").as("est_a"))),
        "source_a")
      .join(broadcast(singles.select(col("g").as("source_b"), col("est").as("est_b"))),
        "source_b")
      .join(broadcast(unionEst), Seq("source_a", "source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter_exact", coalesce(col("n_inter_exact"), lit(0L)))
      .select(col("source_a"), col("source_b"), col("n_inter_exact"),
        col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("n_inter_est"))
      .withColumn("inter_err",
        when(col("n_inter_exact") === 0, lit(null).cast("double"))
          .otherwise(floor((col("n_inter_est") - col("n_inter_exact")).cast("double")
            / col("n_inter_exact") * 1000000 + lit(0.5)) / 1000000))
  }

  /** T5/UL2-style span-corruption pretraining prep: mask ~15% of each
    * doc's tokens in short spans, emit the corrupted input (masked
    * runs collapse to one `<X>` sentinel) and the denoising target
    * (the masked spans, each prefixed by its sentinel) — the
    * corpus-to-training-pairs step, as deterministic row-local
    * Column arithmetic: the mask decision is the Lehmer hash of
    * (doc, position), so the same doc corrupts identically on any
    * cluster, rerun, or engine (a seeded-RNG implementation cannot
    * promise that under partition layout).
    */
  def spanCorrupt(
      df: DataFrame,
      idCol: String,
      textCol: String,
      permille: Int = 150,
      seed: Long = 11L): DataFrame = {
    // one compiled pass per row (VectorExprs.SpanCorruptExpr): the
    // declarative twin below is interpreted lambda-per-position and
    // re-evaluates the 3-pmod mask up to 3x per token — measured 3.6s
    // of pure scan-stage compute at sf0.1 vs ~0.5s compiled. The two
    // are property-pinned equal (CorpusSpec); the DuckDB oracle
    // replays the declarative form.
    val sc = graft.functions.VectorExprs.spanCorrupt(
      col(idCol).cast("long"), TextAnalysis.tokens(col(textCol)), permille, seed)
    df.select(col(idCol), sc.as("sc"))
      .select(col(idCol), col("sc.n_tokens").as("n_tokens"),
        col("sc.n_masked").as("n_masked"),
        col("sc.corrupted_text").as("corrupted_text"),
        col("sc.target_text").as("target_text"))
  }

  /** The declarative Column formulation of [[spanCorrupt]] — the form
    * the DuckDB oracle replays; kept as the property-test reference
    * for the compiled kernel.
    */
  private[graft] def spanCorruptDeclarative(
      df: DataFrame,
      idCol: String,
      textCol: String,
      permille: Int = 150,
      seed: Long = 11L): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val id = col(idCol).cast("long")
    // masked(i) for 0-based i — i arrives 1-based from sequence().
    // The (doc, position) mix is reduced mod 2³¹−1 BEFORE the ×48271
    // step: unreduced, id·1000003·48271 overflows Long once doc ids
    // pass ~1.9e8 (our id stride reaches that at sf≈2), and ANSI mode
    // turns the wrap into a task-killing ARITHMETIC_OVERFLOW. After
    // the reduction the max intermediate is (2³¹−2)·48271 ≈ 1.0e14.
    def masked(i: Column): Column =
      pmod(pmod(pmod(id * lit(1000003L) + i - 1, lit(2147483647L)) * lit(48271L)
        + lit(seed), lit(2147483647L)), lit(1000L)) < lit(permille.toLong)
    val n = size(toks)
    // per index: (token, masked, runStart) — runStart when masked and
    // the previous position is not. The 1..n index list is filtered
    // to [1, n] because Spark's sequence(1, 0) DESCENDS ([1, 0])
    // instead of being empty — unguarded, a zero-token doc would
    // evaluate element_at(toks, 0) and throw; the filter makes it
    // the empty list DuckDB's generate_series(1, 0) yields.
    val marked = transform(
      filter(sequence(lit(1), greatest(n, lit(1))), i => i.leq(n)), i =>
      struct(element_at(toks, i).as("t"), masked(i).as("m"),
        (masked(i) && (i === 1 || !masked(i - 1))).as("rs")))
    val corrupted = concat_ws(" ", filter(transform(col("mk"), e =>
      when(e.getField("rs"), lit("<X>"))
        .when(!e.getField("m"), e.getField("t"))), x => x.isNotNull))
    val target = concat_ws(" ", filter(transform(col("mk"), e =>
      when(e.getField("rs"), concat(lit("<X> "), e.getField("t")))
        .when(e.getField("m"), e.getField("t"))), x => x.isNotNull))
    df.select(col(idCol), n.cast("long").as("n_tokens"), marked.as("mk"))
      .select(col(idCol), col("n_tokens"),
        size(filter(col("mk"), e => e.getField("m"))).cast("long").as("n_masked"),
        corrupted.as("corrupted_text"), target.as("target_text"))
  }

  /** EXACT uniform k per stratum (contrast [[stratifiedSample]]'s
    * rate-based keep, which only hits k in expectation): rows rank
    * within their stratum by the Lehmer hash of the id — a
    * deterministic "random" order any engine replays — and the first
    * k survive. The rank comes from [[Skew.rangedRowNumber]], not a
    * plain per-stratum window: strata are human-language-sized, so at
    * 100× a dominant stratum ("en" at 60% of a web corpus) would
    * serialize into one sort task — the range-partitioned rank bounds
    * every task by partition size at identical ranks (the order key
    * ends with the unique id, a strict total order).
    */
  def groupSampleTopK(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      k: Int,
      seed: Long = 11L): DataFrame = {
    val order = pmod(col(idCol).cast("long") * lit(48271L) + lit(seed),
      lit(2147483647L))
    Skew.rangedRowNumber(df, Seq(strataCol), Seq(order, col(idCol)), "__rk")
      .where(col("__rk") <= k).drop("__rk")
  }

  /** ANALYZE-style column statistics in ONE corpus scan — the planner
    * inputs (row count, null count, NDV, min/max, mean width) that
    * price joins and pick broadcast sides, with the NDV from the same
    * m-bounded HLL register kernel as [[hllSketch]] and the exact NDV
    * carried so the estimate is graded in-query.
    *
    * Scale shape: the row unpivots to (column, stringified value) in
    * the scan stage (k small — the columns you're profiling), so one
    * pass feeds: per-column count/null/Σlen (map-side partial sums),
    * lexicographic min/max of the string form (partial-aggregable,
    * engine-portable — no per-type comparators to disagree on), and
    * the register max-agg. Exact NDV is the one corpus-sized shuffle;
    * at 100 TB drop it and ship the registers — that switch is the
    * point of measuring the HLL error here.
    */
  def columnStats(
      df: DataFrame,
      cols: Seq[String],
      p: Int = 8): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val m = 1 << p
    val pairs = df.select(cols.map(c => col(c).cast("string").as(c)): _*)
      .select(explode(map(
        cols.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("g", "v")))
      .persistTracked
    val basic = pairs.groupBy(col("g")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
      min(col("v")).as("min_str"),
      max(col("v")).as("max_str"),
      sum(coalesce(length(col("v")).cast("long"), lit(0L))).as("sum_len"))
    val nonNull = pairs.where(col("v").isNotNull)
      .select(col("g"), col("v").as("tok"))
    val regs = hllRegisters(nonNull, p)
    val est = hllZSparse(regs, Seq("g"), m)
      .select(col("g"), hllEstimate(m, col("z_scaled"), col("v_zero")).as("ndv_est_hll"))
    val exact = nonNull.distinct().groupBy(col("g")).agg(count(lit(1)).as("ndv_exact"))
    basic.join(exact, Seq("g"), "left").join(est, Seq("g"), "left")
      .select(col("g").as("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("ndv_exact"), lit(0L)).as("ndv_exact"),
        coalesce(col("ndv_est_hll"), lit(0L)).as("ndv_est_hll"),
        col("min_str"), col("max_str"),
        // mean width in exact integer micro-units (the subtraction
        // trick keeps the division exact in both engines)
        ((col("sum_len") * lit(1000000L)
          - pmod(col("sum_len") * lit(1000000L), greatest(col("n_rows"), lit(1L))))
          / greatest(col("n_rows"), lit(1L))).cast("long").as("avg_len_micro"))
  }

  /** Deterministic weight-proportional Poisson sampling: doc i is kept
    * with inclusion probability p_i = min(1, target·w_i/Σw), decided
    * ROW-LOCALLY — the quality-weighted downsampling step (keep good
    * docs more often) that `df.sample` cannot do and per-doc RNG would
    * make partition-layout-dependent. One tiny Σw agg broadcasts back;
    * the keep test is pure integer arithmetic on the Lehmer hash, so
    * any engine replays the exact kept set.
    *
    * p_i is frozen in integer MICRO-UNITS via exact long arithmetic
    * ((w·target·10⁶ − mod) / Σw is an exact integer division: both
    * operands < 2⁵³ here, quotient ≤ 10⁶ — document scores and
    * per-corpus targets keep w·target·10⁶ < 2⁶³ far past graded
    * scale; at true 100 TB move the freeze to DECIMAL(38,0)). The
    * report groups by stratum: docs, kept, Σp_micro (the EXPECTED
    * kept count in exact micro-units) and the realized−expected gap —
    * the Horvitz-Thompson sanity check that the sampler hit its
    * target, parallelism-independent because every term is an
    * integer.
    */
  def weightedSampleReport(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      strataCol: String,
      targetKeep: Long,
      seed: Long = 11L): DataFrame = {
    val w = col(weightCol).cast("long")
    val sumW = df.agg(sum(w).as("sum_w"))
    val a = w * lit(targetKeep) * lit(1000000L)
    val pMicro = least(lit(1000000L),
      ((a - pmod(a, col("sum_w"))) / col("sum_w")).cast("long"))
    val micro = pmod(
      pmod(col(idCol).cast("long") * lit(48271L) + lit(seed), lit(2147483647L)),
      lit(1000000L))
    df.crossJoin(broadcast(sumW))
      .select(col(strataCol), pMicro.as("p_micro"), micro.as("u_micro"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("u_micro") < col("p_micro"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("p_micro")).as("expected_micro"))
      .withColumn("gap_micro",
        col("n_kept") * lit(1000000L) - col("expected_micro"))
  }

  /** Exact interpolated percentile per group with BOUNDED aggregation
    * state: the built-in `percentile()` buffers every distinct value
    * in its agg buffer (O(n) memory on near-continuous columns — the
    * classic 100 TB OOM), so instead the values collapse to a
    * (group, value) counts table first — bounded by the VALUE DOMAIN,
    * not the row count (prices and quantities are discrete) — and the
    * percentile is read off the counts with a cumulative window walk:
    * a value row covers ranks [cum − n, cum), and the type-7 position
    * p·(N−1) interpolates between the rows covering its floor and
    * ceil. Same result as percentile()/quantile_cont (the formula
    * both engines implement), different memory contract.
    */
  def percentileByKey(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      p: Double,
      outCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(valCol).as("v"))
      .agg(count(lit(1)).as("n"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("v"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
    counts
      .withColumn("hi", sum(col("n")).over(wCum))
      .withColumn("lo", col("hi") - col("n"))
      .withColumn("pos", lit(p) * (sum(col("n")).over(wAll) - lit(1L)).cast("double"))
      .groupBy(col(keyCol))
      .agg(
        max(when(col("lo") <= floor(col("pos")) && floor(col("pos")) < col("hi"),
          col("v"))).as("vlo"),
        max(when(col("lo") <= ceil(col("pos")) && ceil(col("pos")) < col("hi"),
          col("v"))).as("vhi"),
        max(col("pos") - floor(col("pos")).cast("double")).as("frac"))
      .select(col(keyCol),
        (col("vlo") + (col("vhi") - col("vlo")) * col("frac")).as(outCol))
  }
}
