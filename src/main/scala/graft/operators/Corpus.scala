package graft.operators

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

  /** Exact-dedup SURVIVOR ROWS (not just ids): one full row per
    * distinct content, the min-id winner. The aggregation carries each
    * group's payload once via min_by over the content-hash groups —
    * the shuffle key stays the 8-byte hash (plus one payload struct
    * per row), never a pairwise comparison. This is what a pipeline
    * feeds downstream after `Dedup.exact` decides the winners.
    */
  def dedupSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
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

  /** Per-document repetition statistics over n-gram multiplicities:
    * total shingles, distinct shingles, and the count of the most
    * repeated shingle — the inputs to any repetition-based quality
    * filter (boilerplate, spam, degenerate generations).
    *
    * Two-level aggregation so the shuffle key is (doc, 8-byte hash)
    * and the per-key combine is map-side partial — no per-row O(len²)
    * multiplicity scan, no raw shingle text on the wire.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // repartition before the CPU-bound explode: a single unsplittable
    // row group must not serialize the shingle generation
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
        explode(TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n)).as("sh"))
      .groupBy(col(idCol), xxhash64(col("sh")).as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_shingles"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_repeat"))
}
