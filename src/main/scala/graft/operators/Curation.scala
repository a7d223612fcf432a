package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw crawl and tokenization: rule-based quality gating
  * (Gopher/C4-style), Bloom-pruned semi joins, BM25 relevance ranking,
  * blocked fuzzy entity resolution, and Z-order layout keys for
  * locality-preserving file assignment.
  *
  * All kernels are built-in-function compositions (codegen'd, no UDFs);
  * the only driver-side state is the Bloom bitmap, which is
  * size-bounded by construction (mBits/8 bytes regardless of corpus
  * size) — the same contract as the sketch operators.
  */
object Curation {

  // ---- Gopher-style quality rules -----------------------------------

  /** Rule flags in the spirit of Gopher's quality heuristics (Rae et
    * al. 2021, §A.1.1) over whitespace-token text. Every rule is a
    * row-local boolean; the conjunction is the keep decision. At 100 TB
    * this is a pure scan stage — no shuffle, no state — and belongs
    * before any dedup so junk never reaches the expensive operators.
    *
    * Returns (n_tokens, r_word_count, r_avg_len, r_stop, r_digit,
    * r_dup, keep) columns to select alongside the document id.
    */
  def gopherFlags(text: Column): Seq[Column] = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    val avgLen = TextAnalysis.tokenCharSum(toks).cast("double") /
      greatest(n, lit(1)).cast("double")
    val digitRatio = TextAnalysis.digitRatio(text)
    val rWc = n.between(5, 1000)
    val rAvg = avgLen.between(2.0, 10.0)
    val rStop = TextAnalysis.stopwordHits(toks) >= 2
    val rDigit = digitRatio < 0.1
    // repetition guard: a doc whose distinct-token ratio collapses is
    // boilerplate or a generation loop, both poison for training
    val rDup = size(array_distinct(toks)).cast("double") /
      greatest(n, lit(1)).cast("double") >= 0.3
    Seq(
      n.cast("long").as("n_tokens"),
      rWc.as("r_word_count"), rAvg.as("r_avg_len"), rStop.as("r_stop"),
      rDigit.as("r_digit"), rDup.as("r_dup"),
      (rWc && rAvg && rStop && rDigit && rDup).as("keep"))
  }

  /** Closed-form model-based quality classifier: multinomial naive
    * Bayes over whitespace tokens, WEAK-LABELED by the [[gopherFlags]]
    * keep rule — the step past rule gates every modern corpus run
    * takes (the fastText-classifier slot in CCNet/RefinedWeb
    * pipelines), with the one classifier whose training is a plain
    * deterministic aggregation both engines can replay: per-class
    * token counts in ONE groupBy, add-one smoothing, class-prior and
    * per-token log-odds frozen as integer micro-bits (the
    * [[TextAnalysis.dsirWeights]] protocol), applied row-locally as an
    * order-independent integer sum. Train + apply live in one plan —
    * no iteration, no driver-side model state; the "model" is a
    * vocab-bounded table joined at scan time.
    *
    * Per-doc agreement with its own weak label rides in the output
    * (the confusion matrix is one groupBy over `label, predicted`
    * away), so the rule-vs-model divergence — the documents the model
    * would rescue or reject against the rules — is graded evidence,
    * not a side claim.
    *
    * Scale shape: the labeled frame (tokenize + gopher rule flags —
    * the expensive row-local work) is persisted once and consumed by
    * four plans (count pass, prior, doc scores, final join); shuffles
    * are keyed on tokens with the LM side vocab-bounded, one
    * broadcast totals row, one broadcast prior row. Docs with zero
    * tokens carry no evidence and score exactly the prior (left join
    * + coalesce).
    *
    * @return (id, label, n_toks, nb_mbits, predicted, agree)
    */
  def nbQualityClassifier(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import Caching.TrackedDf
    val labeled = Dedup.rebalance(df)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"),
        gopherFlags(col(textCol)).last.as("label"))
      .persistTracked
    val inst = labeled.select(col(idCol), col("label"), explode(col("toks")).as("w"))
    val cnt = inst.groupBy(col("w"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"))
    val totals = cnt.agg(sum(col("n_pos")).as("np"),
      sum(col("n_all") - col("n_pos")).as("nn"), count(lit(1)).as("vocab"))
    val lm = cnt.crossJoin(broadcast(totals))
      .select(col("w"),
        floor((log2((col("n_pos") + 1).cast("double") / (col("np") + col("vocab")))
          - log2((col("n_all") - col("n_pos") + 1).cast("double")
            / (col("nn") + col("vocab"))))
          * 1000000 + lit(0.5)).cast("long").as("rbits"))
    val prior = labeled.agg(count(lit(1)).as("d_all"),
      sum(when(col("label"), 1L).otherwise(0L)).as("d_pos"))
      .select(floor(log2((col("d_pos") + 1).cast("double")
        / (col("d_all") - col("d_pos") + 1)) * 1000000 + lit(0.5))
        .cast("long").as("prior_mbits"))
    val docScores = inst.join(lm, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("rbits")).as("sum_rbits"))
    labeled.select(col(idCol), col("label"))
      .join(docScores, Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .select(col(idCol), col("label"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        (col("prior_mbits") + coalesce(col("sum_rbits"), lit(0L))).as("nb_mbits"))
      .withColumn("predicted", col("nb_mbits") > 0)
      .withColumn("agree", col("predicted") === col("label"))
  }

  // ---- Declarative Bloom filter -------------------------------------

  /** Build a Bloom bitmap over `key` values entirely with built-in
    * aggregates: each key explodes to its k probe positions, positions
    * group to 64-bit words via bit_or, and only the ≤ mBits/64 words
    * come back to the driver. The bitmap is then a plan literal — at
    * 100 TB you ship mBits/8 bytes to every scan task instead of
    * shuffling the probe side, which is the point of a Bloom semi join.
    *
    * Probe positions are double hashing over xxhash64 (Kirsch &
    * Mitzenmacher: pos_i = h1 + i·h2 mod m), deterministic across
    * retries and engines.
    */
  def bloomBuild(df: DataFrame, key: Column, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val positions = df
      .select(explode(array((0 until k).map(i => bloomPos(key, i, mBits)): _*)).as("pos"))
    val words = positions
      .groupBy(shiftright(col("pos"), 6).cast("int").as("word"))
      .agg(bit_or(call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int"))).as("bits"))
      .collect()
    val out = new Array[Long](mBits / 64)
    words.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Membership probe against a built bitmap: true for every inserted
    * key, false for most others (false-positive rate ~(kn/m)^k). The
    * two 31-bit base hashes are built-in xxhash64 (codegen'd); the
    * k-position probe loop is the native [[graft.functions.BloomProbe]]
    * expression, which holds the bitmap ONCE as a codegen reference
    * object — the earlier k×element_at formulation embedded k copies
    * of the full bitmap literal in the plan. Same positions, same
    * result, one bitmap copy, still whole-stage codegen at scan speed.
    */
  def bloomMightContain(bits: Array[Long], mBits: Int, k: Int, key: Column): Column = {
    require(mBits == bits.length * 64, s"bitmap length ${bits.length} != mBits/64")
    import org.apache.spark.sql.GraftBridge
    // mask both hashes to 31 bits before the Kirsch-Mitzenmacher
    // combination so h1 + i·h2 can never overflow a long (ANSI mode
    // makes overflow an error, not a wrap)
    val h1 = xxhash64(key, lit(0x9e3779b9L)).bitwiseAND(lit(0x7fffffffL))
    val h2 = xxhash64(key, lit(0x85ebca6bL)).bitwiseAND(lit(0x7fffffffL))
    GraftBridge.column(graft.functions.BloomProbe(
      GraftBridge.expression(h1), GraftBridge.expression(h2), bits, k))
  }

  private def bloomPos(key: Column, i: Int, mBits: Int): Column = {
    // build-side twin of the probe arithmetic (see bloomMightContain)
    val h1 = xxhash64(key, lit(0x9e3779b9L)).bitwiseAND(lit(0x7fffffffL))
    val h2 = xxhash64(key, lit(0x85ebca6bL)).bitwiseAND(lit(0x7fffffffL))
    pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))
  }

  // ---- BM25 ranking --------------------------------------------------

  /** BM25 relevance of each document against a fixed query-term set
    * (Robertson & Walker 1994). Cross-engine exactness protocol: the
    * corpus stats (N, avgdl, per-term df) reduce to ONE broadcast row;
    * each term's idf is frozen as integer micro-units
    * floor(ln(1+(N−df+0.5)/(df+0.5))·10⁶+½) so the only transcendental
    * is evaluated once per term, not per row; the per-doc score is the
    * FIXED-ORDER sum of the per-term contributions (term order = the
    * `terms` argument), keeping the float arithmetic bit-identical at
    * any parallelism and across engines.
    *
    * Scale shape: one stats aggregation (map-side partial, 1-row
    * result), one broadcast cross join, then a pure scan stage; top-k
    * by TakeOrderedAndProject (per-partition heap, no global sort).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int): DataFrame = {
    // k1 = 1.2, b = 0.75 as literal decimal text in BOTH engines so the
    // parsed doubles are the same nearest-representable values; corpus
    // stats stay exact integers (LONG sums, never a float avg — a float
    // sum is merge-order-dependent) and are divided once per row
    val withToks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val statAggs =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.zipWithIndex.map { case (t, j) =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$j")
      }
    val stats = withToks.agg(statAggs.head, statAggs.tail: _*)
    val withIdf = terms.indices.foldLeft(stats) { (df, j) =>
      df.withColumn(s"idf_$j",
        floor(log((col("n_docs").cast("double") - col(s"df_$j").cast("double") + lit(0.5))
          / (col(s"df_$j").cast("double") + lit(0.5)) + lit(1.0))
          * 1000000 + lit(0.5)) / 1000000)
    }
    val scored = withToks.crossJoin(broadcast(withIdf))
    val dlNorm = lit(0.25) + lit(0.75) *
      (col("dl").cast("double") * col("n_docs").cast("double") / col("sum_dl").cast("double"))
    val contribs = terms.zipWithIndex.map { case (t, j) =>
      // Column DSL, not an interpolated expr() string: a term with a
      // quote would otherwise break parsing (or inject SQL)
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      col(s"idf_$j") * tf * lit(2.2) / (tf + lit(1.2) * dlNorm)
    }
    scored
      .select(col(idCol),
        floor(contribs.reduce(_ + _) * 1000000 + lit(0.5)).cast("long").as("score_u"))
      .where(col("score_u") > 0)
      .orderBy(col("score_u").desc, col(idCol))
      .limit(k)
  }

  // ---- Blocked fuzzy entity resolution -------------------------------

  /** Entity-resolution candidate pairs via the sorted-neighborhood
    * method (Hernández & Stolfo): within each block, rows are ranked
    * by their sort key (prefix, then id) and only pairs within
    * `window` rank positions are compared — near-identical records
    * sort adjacently, so a small window catches them while the
    * comparison count is n·window, LINEAR in the corpus (a full
    * within-block join is Σ_b |b|², quadratic the moment block
    * cardinality stops growing with n).
    *
    * The rank-window join is an equi-join, not a theta join: the
    * a-side probes its own rank bucket and the next one (explode of
    * two keys), and the |rank difference| ≤ window filter runs on the
    * bucket-collision survivors. Per-block ranking is a window
    * row_number — one shuffle on the block key, the same partitioning
    * the join reuses. Only windowed survivors pay the O(len²)
    * levenshtein on the bounded prefix.
    */
  def blockedPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      prefixLen: Int,
      maxDist: Int,
      window: Int = 8): DataFrame = {
    val pre = blockRank(
      docs.select(
        (Seq(col(idCol), substring(col(textCol), 1, prefixLen).as("pref")) ++
          blockCols.map(col)): _*),
      blockCols, idCol)
    val a = pre
      .withColumn("buck", explode(array(
        floor((col("rn") - 1) / window).cast("long"),
        floor((col("rn") - 1) / window).cast("long") + 1)))
      .select((pre.columns.map(c => col(c).as(s"a_$c")) :+ col("buck").as("a_buck")).toIndexedSeq: _*)
    val bb = pre
      .withColumn("buck", floor((col("rn") - 1) / window).cast("long"))
      .select((pre.columns.map(c => col(c).as(s"b_$c")) :+ col("buck").as("b_buck")).toIndexedSeq: _*)
    val joinCond = (blockCols.map(c => col(s"a_$c") === col(s"b_$c")) :+
      (col("a_buck") === col("b_buck"))).reduce(_ && _) &&
      col("b_rn") > col("a_rn") && col("b_rn") - col("a_rn") <= window
    a.join(bb, joinCond)
      .select(least(col(s"a_$idCol"), col(s"b_$idCol")).as("id_a"),
        greatest(col(s"a_$idCol"), col(s"b_$idCol")).as("id_b"),
        levenshtein(col("a_pref"), col("b_pref")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Exact per-block rank (row_number ordered by (pref, id) within the
    * block key) with BOUNDED task sizes regardless of block skew —
    * [[Skew.rangedRowNumber]] with the block key as strata and
    * (pref, id) as the strict total order.
    */
  private[graft] def blockRank(
      rows: DataFrame,
      blockCols: Seq[String],
      idCol: String): DataFrame =
    Skew.rangedRowNumber(rows, blockCols, Seq(col("pref"), col(idCol)))

  // ---- Join-size estimation ------------------------------------------

  /** Count-Min inner-product estimate of a join's output cardinality
    * (Cormode & Muthukrishnan §4.3) next to the exact count: each
    * side's per-key counts collapse into a d×w counter table, the
    * per-row inner product Σ_slot cA·cB upper-bounds |A ⋈ B|, and the
    * min over the d rows is the estimate. This is the query-planner
    * statistic that decides broadcast-vs-shuffle and flags exploding
    * joins BEFORE paying for them: at 100 TB the sketch tables are
    * d·w integers per side regardless of key cardinality, so the
    * estimate costs two scan-side aggregations while the exact count
    * costs the join itself.
    *
    * Exactness protocol: counts, slot sums, and inner products are all
    * integers (order-independent); the relative error is a single
    * terminal division. Slots reuse the minhash permutation kernel on
    * the stringified key — the freq_sketch oracle machinery, replayed
    * verbatim in SQL.
    */
  def joinSizeEstimate(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column,
      d: Int,
      w: Int): DataFrame = {
    import graft.functions.VectorExprs
    val cntsA = left.select(leftKey.cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("na"))
    val cntsB = right.select(rightKey.cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("nb"))
    val exact = cntsA.join(cntsB, "k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("n_exact"))
    def sketch(cnts: DataFrame, nCol: String, out: String): DataFrame =
      cnts.select(col(nCol),
          posexplode(VectorExprs.minhashSig(
            array(VectorExprs.tokenHash64(col("k"))), d)).as(Seq("i", "perm")))
        .select(col(nCol), col("i"), (col("perm") % w).as("slot"))
        .groupBy(col("i"), col("slot")).agg(sum(col(nCol)).as(out))
    // a hash row with NO colliding slots has inner product 0 — the
    // best estimate — so fewer than d surviving rows means 0, not the
    // min over the survivors
    val est = sketch(cntsA, "na", "ca")
      .join(sketch(cntsB, "nb", "cb"), Seq("i", "slot"))
      .groupBy(col("i")).agg(sum(col("ca") * col("cb")).as("est_i"))
      .agg(when(count(lit(1)) < d, 0L).otherwise(min(col("est_i"))).as("n_est"))
    exact.crossJoin(est).select(col("n_exact"), col("n_est"),
      when(col("n_exact") === 0L, lit(null))
        .otherwise(floor((col("n_est") - col("n_exact")).cast("double") / col("n_exact")
          * 1000000 + lit(0.5)) / 1000000).as("err"))
  }

  // ---- Z-order layout ------------------------------------------------

  /** 2×16-bit Morton (Z-order) interleave: bit i of x lands at 2i, bit
    * i of y at 2i+1. Pure shift/mask arithmetic so the same expression
    * text runs on any engine and stays in codegen.
    */
  def zOrderKey(x: Column, y: Column, bits: Int = 16): Column = {
    val xm = pmod(x.cast("long"), lit(1L << bits))
    val ym = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** File-layout audit for Z-order clustering: rows are assigned to
    * files by the TOP bits of their z-value — a pure value-based
    * bucketing, so the assignment is scan-local (no global sort; at
    * scale you'd feed the same key to repartitionByRange + sortWithin
    * Partitions, and these buckets are exactly the range bounds). The
    * per-file min/max spans on both dimensions are the evidence: a
    * z-ordered file touches a narrow rectangle of (x, y), which is
    * what lets min/max zone maps prune scans on EITHER column.
    */
  def zOrderLayout(
      df: DataFrame,
      x: Column,
      y: Column,
      fileBits: Int,
      bits: Int = 16): DataFrame = {
    val z = zOrderKey(x, y, bits)
    df.select(
        shiftright(z, 2 * bits - fileBits).cast("int").as("file_id"),
        pmod(x.cast("long"), lit(1L << bits)).as("zx"),
        pmod(y.cast("long"), lit(1L << bits)).as("zy"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("zx")).as("x_min"), max(col("zx")).as("x_max"),
        min(col("zy")).as("y_min"), max(col("zy")).as("y_max"))
  }
}
