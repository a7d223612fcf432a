package graft.operators

import graft.operators.Caching.TrackedDf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * 100 TB design rules baked in:
  *   - the shuffle key is always a small fixed-width hash (content
  *     hash, LSH band signature, SimHash band) — never raw text;
  *   - candidate generation is a bucket equi-join (O(n·bands) rows),
  *     never an all-pairs cartesian;
  *   - verification (exact Jaccard / Hamming) runs only on bucket
  *     collisions.
  */
object Dedup {

  /** Spread CPU-bound per-row stages (shingling, signatures) across
    * the cluster when the source layout would serialize them — a
    * single unsplittable row group must not pin the compute to one
    * core. CONDITIONAL: a well-split source (a 100 TB corpus has
    * ~10⁵–10⁶ input splits) passes through untouched — an
    * unconditional repartition here would round-robin the entire
    * corpus text through a shuffle for nothing.
    *
    * The probe reads `queryExecution.toRdd` partition counts: physical
    * planning only (no job, no InternalRow→Row conversion layer), but
    * it IS a non-AQE plan of the subtree per call — keep rebalance at
    * source boundaries, not inside loops. Under AQE the probe on a
    * mid-chain input additionally finalizes the adaptive plan
    * (executing its shuffle stages — ~0.3 s ghost jobs inside
    * curation_e2e), but an r18 experiment that skipped the probe for
    * exchange-containing plans REGRESSED (4.7 s → 6.1 s): AQE's
    * advisory-byte coalescing collapses small shuffles to 1–4
    * partitions, and without the explicit respread the CPU-bound
    * shingling/tokenize stages downstream run on those few cores.
    * The probe's cost is the price of a correct CPU-spread decision.
    * Known blind spot, accepted: a source with many partitions of
    * which only one is POPULATED (partition-count ≥ target but data
    * skewed) passes through untouched; downstream exchanges + AQE
    * skew handling own that case, and the salted-join operators
    * (Skew.scala) are the explicit fallback.
    */
  private[operators] def rebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Exact dedup: one survivor (min id) per distinct content. Grouping
    * is by 64-bit content hash so the shuffle carries 8 bytes per row,
    * not the document body; at 64 bits, collisions at 100 TB doc
    * counts (~1e11) are ~1e-11 per pair bucket and acceptable for
    * training-data dedup (use a 128-bit pair of seeds if not).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Canonical text form for normalization-aware dedup: lowercase,
    * strip everything outside [a-z0-9 ], collapse runs of spaces, trim.
    * Pure scan-stage Column arithmetic; the regexes are global-replace
    * in both engines (Spark by default, the oracle via the 'g' flag)
    * and lookaround-free, so any engine canonicalizes identically.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Exact dedup over the CANONICAL form — the production default
    * (trivial reformatting: case, punctuation, double spaces — hides
    * most verbatim copies from raw-byte hashing). Same contract as
    * [[exact]]: min-id winner, copy count, 8-byte hash shuffle.
    */
  def exactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(normalized(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** [[normalized]] with Unicode NFC canonicalization FIRST: composed
    * vs decomposed accents (é vs e+U+0301), fullwidth forms and other
    * canonically-equivalent byte sequences are invisible to the
    * lower+strip chain alone — the decomposed form keeps its ASCII
    * base letter where the composed form is stripped whole, so the
    * same sentence hashes apart. NFC (codegen'd row-local
    * [[graft.functions.NfcNormalize]]) folds both to one byte
    * sequence before the chain; DuckDB's `nfc_normalize` is the exact
    * oracle contract.
    */
  def normalizedNfc(text: Column): Column =
    normalized(graft.functions.VectorExprs.nfc(text))

  /** [[exactNormalized]] over the NFC-first canonical form — same
    * min-id winner / copy count / 8-byte hash shuffle contract.
    */
  def exactNormalizedNfc(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(normalizedNfc(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** 128-bit variant: two independently-seeded 64-bit hashes as the
    * group key. At 1e11+ documents the 64-bit birthday bound starts to
    * matter for exactness guarantees; 128 bits does not. Still an
    * 16-byte shuffle key, never the text.
    */
  def exact128(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(
      xxhash64(col(textCol)).as("h1"),
      xxhash64(lit("graft-seed-2"), col(textCol)).as("h2"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"), col("h1"), col("h2"))

  /** Incremental exact dedup: the survivors of a NEW batch against an
    * EXISTING corpus — the daily-increment shape of a crawl pipeline
    * (dedup the delta, never re-dedup the accumulated 100 TB).
    *
    * Within-batch winners are min-id per content hash (same contract
    * as [[exact]]); the anti join against the existing corpus's hash
    * set then drops anything already known. Both sides shuffle on the
    * 8-byte hash only — the existing corpus contributes one hash per
    * doc, never its text, which is exactly the "dedup index" a
    * production pipeline would persist between runs ([[exact128]]'s
    * double hash upgrades the collision bound the same way here).
    */
  def exactIncremental(
      batch: DataFrame,
      existing: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val knownHashes = existing
      .select(xxhash64(col(textCol)).as("content_hash")).distinct()
    batch
      .groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .join(knownHashes, Seq("content_hash"), "left_anti")
      .select(col(idCol), col("n_copies"))
  }

  // ---- MinHash + LSH ------------------------------------------------

  /** Sorted-distinct 64-bit shingle-hash set for a text column — one
    * native pass (tokenize stays a cheap expression; windowing,
    * hashing, dedup, sort run in `ShingleSet`).
    */
  def hashedShingleSet(textCol: Column, shingleSize: Int): Column =
    graft.functions.VectorExprs.shingleSet(
      TextAnalysis.tokens(textCol), shingleSize)

  /** MinHash signature (array<long> of `numHashes` slots) over a
    * hashed-shingle array column: the native `MinHashSig` expression
    * computes all permutation minima in a single pass — no UDF, no
    * shuffle, no per-slot re-traversal of the shingle array.
    */
  def minHashSignature(shingleHashCol: Column, numHashes: Int): Column =
    graft.functions.VectorExprs.minhashSig(shingleHashCol, numHashes)

  /** Candidate near-dup pairs via banded LSH over MinHash signatures.
    *
    * Input: df(idCol, shingles array). Output: (id_a, id_b) candidate
    * pairs, id_a < id_b, distinct.
    *
    * bands·rowsPerBand = numHashes. Each doc explodes to `bands` rows
    * keyed by (band index, band signature hash); the self-equi-join on
    * that key is the only shuffle — O(n·bands) rows of (long, long),
    * which is what survives a 100 TB corpus. With rowsPerBand=4,
    * bands=32: P(candidate | J=0.9) ≈ 1−(1−0.9⁴)³² ≈ 1−3e-15,
    * P(candidate | J=0.2) ≈ 5%, and false candidates are cheap to
    * verify.
    */
  def lshCandidates(
      sigDf: DataFrame,
      idCol: String,
      sigCol: String,
      bands: Int,
      rowsPerBand: Int): DataFrame = {
    val banded = bandKeys(sigDf, idCol, sigCol, bands, rowsPerBand)
    val left  = banded.select(col(idCol).as("id_a"), col("band"), col("band_sig"))
    val right = banded.select(col(idCol).as("id_b"), col("band"), col("band_sig"))
    left.join(right, Seq("band", "band_sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** (id, band, band_sig) band-key rows for a signature table — the
    * LSH index representation both the self-join ([[lshCandidates]])
    * and the incremental new-vs-corpus join consume.
    */
  def bandKeys(
      sigDf: DataFrame,
      idCol: String,
      sigCol: String,
      bands: Int,
      rowsPerBand: Int): DataFrame = {
    val bandSigs = (0 until bands).map(b =>
      xxhash64(lit(b), slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand)))
    sigDf.select(
      col(idCol),
      posexplode(array(bandSigs: _*)).as(Seq("band", "band_sig")))
  }

  /** Exact Jaccard verification of candidate pairs against sorted
    * hashed-shingle sets: |∩| via the native merge walk, no per-row
    * hash-set allocation.
    */
  def verifyJaccard(
      candidates: DataFrame,
      shingleDf: DataFrame, // (id, sorted hashed shingle set)
      idCol: String,
      setCol: String,
      threshold: Double): DataFrame = {
    val a = shingleDf.select(col(idCol).as("id_a"), col(setCol).as("set_a"))
    val b = shingleDf.select(col(idCol).as("id_b"), col(setCol).as("set_b"))
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("inter",
        graft.functions.VectorExprs.sortedIntersectSize(col("set_a"), col("set_b"))
          .cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("set_a")) + size(col("set_b")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** End-to-end MinHash near-dup pairs: shingle → sign → band →
    * bucket-join → exact verify. Returns (id_a, id_b, jaccard).
    */
  def minHashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    // persisted: reused by signature generation and pair verification
    val sets = rebalance(df).select(
      col(idCol),
      hashedShingleSet(col(textCol), shingleSize).as("shingle_set"))
      .persistTracked
    val sigs = sets.select(
      col(idCol),
      minHashSignature(col("shingle_set"), numHashes).as("sig"))
    val cands = lshCandidates(sigs, idCol, "sig", bands, numHashes / bands)
    verifyJaccard(cands, sets, idCol, "shingle_set", threshold)
  }

  /** Incremental MinHash near-dup: pairs each NEW doc against the
    * accumulated CORPUS without ever re-pairing the corpus with
    * itself. This is the daily-snapshot shape: the corpus's band keys
    * are an index a production pipeline computes once and persists
    * (like [[exactIncremental]]'s hash index); each increment only
    * generates signatures for the new batch and equi-joins its band
    * keys against the index.
    *
    * 100 TB path: shuffle rows are (8-byte id, band, 8-byte band sig)
    * — O(new·bands + corpus·bands), never |new|·|corpus|; exact
    * verification touches only bucket-collision candidates, and with
    * 32×4 bands P(miss | J=0.8) ≈ 5e-8, so the oracle can be the
    * exact cross Jaccard at the query threshold.
    *
    * @return (id_new, id_old, jaccard) — every near-dup link from the
    *         batch into the corpus (a batch doc may hit many).
    */
  def minHashNearDupsIncremental(
      newDf: DataFrame,
      corpusDf: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / bands
    def sets(df: DataFrame) = rebalance(df).select(
      col(idCol),
      hashedShingleSet(col(textCol), shingleSize).as("shingle_set"))
      .persistTracked
    def banded(s: DataFrame) = bandKeys(
      s.select(col(idCol), minHashSignature(col("shingle_set"), numHashes).as("sig")),
      idCol, "sig", bands, rowsPerBand)
    val newSets = sets(newDf)
    val oldSets = sets(corpusDf)
    val cands = banded(newSets).select(col(idCol).as("id_new"), col("band"), col("band_sig"))
      .join(banded(oldSets).select(col(idCol).as("id_old"), col("band"), col("band_sig")),
        Seq("band", "band_sig"))
      .select("id_new", "id_old")
      .distinct()
    cands
      .join(newSets.select(col(idCol).as("id_new"), col("shingle_set").as("set_a")), "id_new")
      .join(oldSets.select(col(idCol).as("id_old"), col("shingle_set").as("set_b")), "id_old")
      .withColumn("inter",
        graft.functions.VectorExprs.sortedIntersectSize(col("set_a"), col("set_b"))
          .cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("set_a")) + size(col("set_b")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_old"), col("jaccard"))
  }

  /** Measured recall of the deployed banded-MinHash near-dup path
    * against exact PPJoin ground truth at the SAME threshold — the
    * text-side counterpart of `Similarity.lshRecallEval`, and the
    * number that justifies (or vetoes) running minhash below the
    * provably-safe 0.8 threshold: at 0.6 with 32×4 bands, theory says
    * ~1.2% of boundary pairs slip; this measures the actual figure on
    * the actual corpus.
    *
    * Both sides are full-scale scalable plans (PPJoin prefix index,
    * band equi-join) — no sampling needed, unlike the embedding
    * harness where exact ground truth means all-pairs cosine. Output
    * is one row (n_exact, n_lsh, recall) from two exact integer
    * counts. Oracle-checkable bit-exactly because the SplitMix64
    * permutation coefficients are embedded in the oracle SQL
    * ([[graft.functions.MinHashSig.coeffs]]) and the FNV shingle
    * hash replays in unsigned mod-2⁶⁴ arithmetic.
    */
  def minHashRecallEval(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    val nExact = ngramJaccardPairs(df, idCol, textCol, threshold)
      .agg(count(lit(1)).as("n_exact"))
    val nLsh = minHashNearDups(df, idCol, textCol, threshold)
      .agg(count(lit(1)).as("n_lsh"))
    nExact.crossJoin(nLsh)
      .select(col("n_exact"), col("n_lsh"),
        when(col("n_exact") === 0, lit(1.0))
          .otherwise(floor(col("n_lsh").cast("double") / col("n_exact") * 10000
            + lit(0.5)) / 10000)
          .as("recall"))
  }

  /** Exact n-gram Jaccard near-dup pairs via a prefix-filtered
    * inverted shingle index (PPJoin-style, no MinHash approximation,
    * no cartesian).
    *
    * Candidate generation indexes only each doc's PREFIX — the first
    * n − ⌈t·n⌉ + 1 shingle hashes in a fixed global order (hash
    * order). Two sets with Jaccard ≥ t must overlap in ≥ ⌈t/(1+t)·
    * (na+nb)⌉ ≥ 1 elements of their prefixes under any shared total
    * order, so the equi-join on prefix hashes keeps full recall while
    * shrinking both the index (≈(1−t)·n rows per doc) and,
    * quadratically, the pair blowup on common shingles. Candidates
    * are then verified with exact |∩|/|∪| on the full sorted-hash
    * sets. Shuffle keys: shingle hash (candidates), pair id (verify).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3): DataFrame = {
    // persisted: the shingle pipeline feeds candidate generation AND
    // both sides of verification — recomputing it 3x dominates runtime
    val sets = rebalance(df).select(
      col(idCol),
      hashedShingleSet(col(textCol), shingleSize).as("hs"))
      .withColumn("set_size", size(col("hs")))
      // prefix length n - ceil(t*n) + 1
      .withColumn("prefix_len",
        (col("set_size") - ceil(col("set_size") * threshold) + 1).cast("int"))
      .persistTracked
    val inv = sets.select(
      col(idCol),
      col("set_size"),
      posexplode(slice(col("hs"), lit(1), col("prefix_len"))).as(Seq("pos", "sh")))
    val a = inv.select(col(idCol).as("id_a"), col("set_size").as("size_a"),
      col("pos").as("pos_a"), col("sh"))
    val b = inv.select(col(idCol).as("id_b"), col("set_size").as("size_b"),
      col("pos").as("pos_b"), col("sh"))
    // J >= t requires overlap >= ceil(t/(1+t)·(na+nb)); tiny epsilon
    // guards against over-pruning on floating-point boundaries
    val minOverlap = ceil((col("size_a") + col("size_b")) * (threshold / (1 + threshold)) - 1e-9)
    val cands = a.join(b, "sh")
      .where(col("id_a") < col("id_b"))
      // length filter: J >= t forces min(na,nb) >= t*max(na,nb), so
      // mismatched-size pairs never reach (array-carrying) verification
      .where(least(col("size_a"), col("size_b")) >=
        greatest(col("size_a"), col("size_b")) * threshold)
      // positional filter (PPJoin): a match at sorted positions
      // (pos_a, pos_b) caps the achievable overlap at
      // 1 + min(remaining_a, remaining_b)
      .where(lit(1) + least(col("size_a") - col("pos_a") - 1,
        col("size_b") - col("pos_b") - 1) >= minOverlap)
      .select("id_a", "id_b")
    val fa = sets.select(col(idCol).as("id_a"), col("hs").as("hs_a"))
    val fb = sets.select(col(idCol).as("id_b"), col("hs").as("hs_b"))
    // Verify-then-distinct (measured, r9 A/B at sf0.1): candidates go
    // straight to verification and the pair set is deduped AFTER the
    // jaccard filter. The old candidate-side .distinct() paid a full
    // extra shuffle + stage barrier on the pair set to save re-verifying
    // duplicates — but the prefix/length/positional filters already
    // bound duplicate multiplicity (a pair appears once per matching
    // PREFIX shingle, ≤ prefix_len ≈ (1−t)·n, typically 1-2 post-
    // filter), verification is idempotent, and the verify join
    // shuffles on id either way. ngram_jaccard 1.21s→0.54s (2.3×,
    // reproduced twice); dedup_multisignal unchanged within noise.
    // The final distinct runs over qualified pairs only — the small
    // end of the funnel.
    cands.join(fa, "id_a").join(fb, "id_b")
      .withColumn("inter",
        graft.functions.VectorExprs.sortedIntersectSize(col("hs_a"), col("hs_b"))
          .cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .distinct()
  }

  /** Duplicate clusters from near-dup pairs: connected components by
    * iterative min-label propagation (each node adopts the smallest
    * label among itself and its neighbors), accelerated by pointer
    * jumping (each node then adopts its label's label). Plain
    * propagation needs ~diameter rounds — a pathological chain-shaped
    * component (mirror farms produce them) would need thousands; the
    * jump halves remaining depth every round, so convergence is
    * O(log diameter) and the default cap genuinely covers web-scale
    * components. Each round localCheckpoints to cut lineage. This is
    * how pair output becomes a "keep one per cluster" dedup decision.
    *
    * @return (id, cluster) where cluster = min id of the component
    */
  def clusters(pairs: DataFrame, ids: DataFrame, idCol: String, maxIters: Int = 10): DataFrame = {
    // both orientations from ONE pass over the pair table: a union of
    // two selects would compute the (expensive — PPJoin, LSH) pair
    // subtree twice before the persist ever materializes
    val edges = pairs.select(explode(array(
      struct(col("id_a").as("src"), col("id_b").as("dst")),
      struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persistTracked
    // propagate over the PAIR SUBGRAPH only: a node in no near-dup pair
    // can never change label, and at corpus scale near-dup pairs touch
    // a sliver of the documents — iterating all ids would put the whole
    // corpus through every round's joins for nothing. Singletons get
    // their own id back in the final left join.
    // Pre-pass = what round 1 against identity labels would compute,
    // minus the join: each node's label = min(self, direct neighbors),
    // straight off the edge list, then one pointer jump. Typical
    // near-dup families (cliques/stars) are already at fixpoint here,
    // so the loop's first iteration OBSERVES convergence instead of
    // still propagating — one fewer round on the common shape.
    val firstPass = edges.groupBy(col("dst"))
      .agg(min(col("src")).as("m"))
      .select(col("dst").as("id"), least(col("m"), col("dst")).cast("long").as("cluster"))
    var labels = firstPass
      .join(firstPass.select(col("id").as("cluster"), col("cluster").as("parent")),
        Seq("cluster"), "left")
      .select(col("id"), coalesce(col("parent"), col("cluster")).as("cluster"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src")
          .withColumnRenamed("cluster", "src_cluster"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_cluster")).as("nbr_cluster"))
      // convergence flag computed in the same pass (labels only ever
      // decrease): no extra join, no overflow-prone label sums, and an
      // early-exit isEmpty probe on the checkpointed round output
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_cluster"), col("cluster"))).as("cluster"),
          (coalesce(col("nbr_cluster"), col("cluster")) < col("cluster")).as("changed"))
        .localCheckpoint(false) // lazy: the probe below materializes it
      converged = next.where(col("changed")).isEmpty
      // pointer jump: follow each label to ITS label. Labels only ever
      // decrease, so this is sound at any point; it is what turns
      // diameter-bound convergence into log-bound (large-component
      // guard). At neighbor-fixpoint labels are constant per component
      // and the jump is a no-op, so the convergence probe stays exact.
      val prev = next.select(col("id"), col("cluster"))
      labels = prev
        .join(prev.select(col("id").as("cluster"), col("cluster").as("parent")),
          Seq("cluster"), "left")
        .select(col("id"), coalesce(col("parent"), col("cluster")).as("cluster"))
      it += 1
    }
    ids.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id").cast("long")).as("cluster"))
  }

  /** Incremental connected components — the daily-clustering shape:
    * YESTERDAY's label table plus TODAY's new pair links, without
    * re-mining or re-propagating the accumulated corpus graph. Each
    * prior label becomes one star edge (member → its cluster
    * representative); stars preserve components and min-labels
    * exactly, so clustering (stars ∪ new links) equals a full
    * recompute over (old pairs ∪ new pairs) — the equivalence the
    * oracle checks by BEING the full recompute. Star components have
    * depth 1, so propagation converges in O(1) extra rounds over the
    * new links' depth.
    *
    * 100 TB path: the label table is the persisted artifact (8-byte
    * id pairs); the expensive pair mining runs only on the increment
    * (batch-internal + batch×corpus, cf. the incremental near-dup
    * operators) — corpus-internal pairs are never recomputed.
    */
  def clustersIncremental(
      prevLabels: DataFrame, // (id, cluster)
      newPairs: DataFrame,   // (id_a, id_b)
      ids: DataFrame,
      idCol: String,
      maxIters: Int = 10): DataFrame = {
    val starEdges = prevLabels.where(col("id") =!= col("cluster"))
      .select(col("id").as("id_a"), col("cluster").as("id_b"))
    clusters(starEdges.unionByName(newPairs.select(col("id_a"), col("id_b"))),
      ids, idCol, maxIters)
  }

  /** Dedup audit report: the near-dup FAMILY-SIZE distribution — for
    * each cluster size, how many families and how many documents, plus
    * the removal each size class contributes (size − 1 per family).
    * This is the one-page number a dedup run ships with: how much of
    * the corpus is duplicate mass, and whether it sits in a few huge
    * families (mirror farms — worth a targeted rule) or a long tail of
    * pairs.
    *
    * Scale shape: two cluster-keyed/size-keyed aggregations over the
    * (id, cluster) label table — fixed-width rows only, output bounded
    * by the number of DISTINCT family sizes (≪ corpus).
    *
    * @return (cluster_size, n_clusters, n_docs, n_removable) ordered
    *         output left to the caller/sink
    */
  def clusterSizeReport(labels: DataFrame): DataFrame =
    labels.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_removable"))

  /** Survivor per near-dup cluster: the member with the highest
    * `scoreCol` (ties to the smallest id — fully deterministic). This
    * is [[clusters]]' downstream decision step: exact dedup keeps
    * min-id, near-dup dedup keeps the BEST copy (longest, highest
    * quality) of each duplicate family.
    *
    * One hash shuffle on the cluster label; the per-cluster argmax is
    * a partial-aggregable max_by over (score, −id) — no window, no
    * per-cluster sort.
    */
  def clusterSurvivors(
      labels: DataFrame,
      docs: DataFrame,
      idCol: String,
      scoreCol: String): DataFrame = {
    val joined = docs.join(labels.withColumnRenamed("id", idCol), Seq(idCol))
    joined.groupBy(col("cluster"))
      .agg(
        max_by(struct(col(idCol), col(scoreCol)),
          struct(col(scoreCol), (-col(idCol)).as("neg_id"))).as("winner"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col(s"winner.$idCol").as(idCol),
        col(s"winner.$scoreCol").as(scoreCol), col("n_members"))
  }

  /** Exact duplicated-SPAN statistics — the window-level view behind
    * "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al. 2021): suffix-array substring dedup re-expressed as
    * positioned fixed-width window hashes, the shape that distributes
    * (a suffix array over 100 TB does not). Per document: how many of
    * its `window`-token windows occur ≥2 times corpus-wide, and the
    * FRACTION OF ITS TOKENS covered by at least one duplicated window
    * — the number that decides between dropping the doc and slicing
    * the span.
    *
    * Coverage is exact interval union in closed form: with window
    * starts sorted, each window past the first adds
    * min(window, pᵢ − pᵢ₋₁) new tokens, so union size =
    * win + Σ min(win, Δp) — pure integer arithmetic over the per-doc
    * sorted position array, no fold state, replayable in any engine.
    *
    * Scale shape: positioned window hashes are (id, pos, 8-byte FNV)
    * rows — text never on the wire; duplicate detection is one
    * hash-keyed count; the position join and the per-doc position
    * collect are id/hash-keyed shuffles. Per-doc position arrays are
    * bounded by doc length (windows ≪ tokens), never corpus-sized.
    *
    * @return (id, n_tokens, n_windows, n_dup_windows, dup_token_frac)
    */
  def substringDupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    val base = rebalance(df).select(
      col(idCol),
      TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), size(col("toks")).cast("long").as("n_tokens"),
        posexplode(TextAnalysis.shingles(col("toks"), window)).as(Seq("pos", "sh")))
      .select(col(idCol), col("n_tokens"), col("pos").cast("long").as("pos"),
        graft.functions.VectorExprs.tokenHash64(col("sh")).as("h"))
      .persistTracked
    val dupHashes = base.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
      .select(col("h"))
    val winEff = least(lit(window.toLong), col("n_tokens"))
    val perDoc = base.join(dupHashes, Seq("h"), "left_semi")
      .groupBy(col(idCol), col("n_tokens"))
      .agg(count(lit(1)).as("n_dup_windows"),
        sort_array(collect_list(col("pos"))).as("ps"))
      // Spark's sequence(2, 1) DESCENDS instead of being empty, so the
      // single-window doc must bypass the Δp sum explicitly
      .withColumn("covered",
        winEff + when(size(col("ps")) >= 2, aggregate(
          transform(sequence(lit(2), size(col("ps"))),
            i => least(winEff,
              element_at(col("ps"), i) - element_at(col("ps"), i - 1))),
          lit(0L), (acc, x) => acc + x)).otherwise(lit(0L)))
    base.groupBy(col(idCol), col("n_tokens"))
      .agg(count(lit(1)).as("n_windows"))
      .join(perDoc.select(col(idCol), col("n_dup_windows"), col("covered")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        (floor(coalesce(col("covered"), lit(0L)).cast("double")
          / greatest(col("n_tokens"), lit(1L))
          * 10000 + lit(0.5)) / 10000).as("dup_token_frac"))
  }

  /** The ACTION step of Lee-et-al substring dedup: emit each doc with
    * every duplicated span REMOVED except its globally-first
    * occurrence — [[substringDupStats]] measures the duplicated mass,
    * this returns the cleaned corpus (drop-the-span instead of
    * drop-the-doc, the policy that keeps the unique remainder of a
    * boilerplate-framed page).
    *
    * First-occurrence policy: every `window`-token hash elects one
    * winner occurrence — the minimum (doc, pos) in lexicographic
    * order, encoded as one long (id·2²⁰ + pos; positions are bounded
    * by doc length ≪ 2²⁰, ids by 2⁴³ — widen the encoding before ids
    * cross that). Every OTHER occurrence marks its `window` positions
    * for removal, so a run duplicated across docs survives only in
    * the lowest-id doc, and a within-doc repeat survives only at its
    * first position. Deterministic on any cluster: the winner is a
    * pure min, the keep test pure row-local arithmetic.
    *
    * Scale shape: the corpus shuffles as (8-byte hash, 8-byte key)
    * rows — text never on the wire; the winner election is one
    * map-side-partial min; removal positions come back as one
    * doc-keyed agg; token filtering is row-local (per-token exists()
    * over the doc's own removal list — bounded by the doc's dup
    * windows, not the corpus).
    */
  def substringDedupApply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    val base = rebalance(df).select(
      col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .persistTracked
    val win = base
      .select(col(idCol),
        posexplode(TextAnalysis.shingles(col("toks"), window)).as(Seq("pos", "sh")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        graft.functions.VectorExprs.tokenHash64(col("sh")).as("h"))
      .withColumn("okey", col(idCol) * lit(1048576L) + col("pos"))
    val winners = win.groupBy(col("h")).agg(min(col("okey")).as("wkey"))
    val removed = win.join(winners, Seq("h"))
      .where(col("okey") =!= col("wkey"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("rp"))
    val winEff = least(lit(window.toLong), size(col("toks")).cast("long"))
    base.join(removed, Seq(idCol), "left")
      .withColumn("rp", coalesce(col("rp"), array().cast("array<bigint>")))
      .withColumn("kept", filter(col("toks"), (tok, k) =>
        !exists(col("rp"), p => p <= k.cast("long") && k.cast("long") < p + winEff)))
      .select(col(idCol), size(col("toks")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("cleaned_text"))
  }

  /** C4-style exact LINE dedup (Raffel et al. 2020 §2.2 discipline):
    * the corpus is re-chunked into fixed-width token "lines"
    * (`lineTokens` per line — the deterministic stand-in for newline
    * splits on this corpus, whose documents are single-line), every
    * line occurrence elects the globally-first (doc, line) winner, and
    * each document is reassembled from ONLY its winning lines, original
    * line order preserved. Complements [[substringDedupApply]]: that
    * removes overlapping windows, this removes whole lines — the
    * boilerplate policy (nav bars, cookie banners) every C4-style
    * cleanup runs.
    *
    * First-occurrence policy identical to substring dedup: winner =
    * min (id·2²⁰ + line_no) per line; deterministic on any cluster.
    *
    * Scale shape: the dedup shuffle carries (8-byte FNV line hash,
    * 8-byte okey) rows — line TEXT never goes on the wire; surviving
    * line NUMBERS come back as one doc-keyed agg (bounded by the
    * doc's own line count), and reassembly re-slices the doc's own
    * token array row-locally. Two hash-keyed shuffles total, both
    * fixed-width.
    */
  def lineDedupApply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lineTokens: Int = 8): DataFrame = {
    val L = lineTokens
    val base = rebalance(df).select(
      col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n_lines", ceil(size(col("toks")) / lit(L.toDouble)).cast("long"))
      .persistTracked
    // n_lines = 0 (zero-token doc) must yield ZERO lines: Spark's
    // sequence(1, 0) DESCENDS to [1, 0] instead of being empty (the
    // same pitfall shingles()/substringDupStats guard), which would
    // manufacture two phantom empty lines per empty doc and diverge
    // from the oracle's generate_series(1, 0) = []
    val lineNos = when(col("n_lines") > 0,
      sequence(lit(1), col("n_lines").cast("int")))
      .otherwise(array().cast("array<int>"))
    val lines = base
      .select(col(idCol),
        posexplode(transform(lineNos,
          j => concat_ws(" ", slice(col("toks"), (j - 1) * L + 1, lit(L)))))
          .as(Seq("line_no", "line")))
      .select(col(idCol), col("line_no").cast("long").as("line_no"),
        graft.functions.VectorExprs.tokenHash64(col("line")).as("h"))
      .withColumn("okey", col(idCol) * lit(1048576L) + col("line_no"))
    val winners = lines.groupBy(col("h")).agg(min(col("okey")).as("wkey"))
    val keepNos = lines.join(winners, Seq("h"))
      .where(col("okey") === col("wkey"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("line_no"))).as("kl"))
    base.join(keepNos, Seq(idCol), "left")
      .withColumn("kl", coalesce(col("kl"), array().cast("array<bigint>")))
      .select(col(idCol), col("n_lines"),
        size(col("kl")).cast("long").as("n_kept"),
        concat_ws("\n", transform(col("kl"), j =>
          concat_ws(" ", slice(col("toks"), (j * L + 1).cast("int"), lit(L)))))
          .as("text_clean"))
  }

  // ---- SimHash ------------------------------------------------------

  /** 64-bit SimHash per doc: each token's hash votes ±1 on 64 bit
    * counters; the sign vector is the fingerprint. Native one-pass
    * expression — per-doc computable in the scan stage, so simhash
    * generation involves NO explode and NO shuffle (the band join for
    * pairing is the only exchange in the dedup).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    rebalance(df)
      // empty docs carry no signal and would all share simhash 0 — at
      // web-crawl scale that one degenerate value becomes a quadratic
      // pair blowup in the band join, so they are excluded (matching
      // the previous explode-based behavior)
      .where(size(TextAnalysis.tokens(col(textCol))) > 0)
      .select(col(idCol),
        graft.functions.VectorExprs.simhash64(
          TextAnalysis.tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Blocking: split the 64-bit hash into 4 bands of 16 bits; any pair
    * within Hamming ≤ 3 must agree exactly on ≥1 band (pigeonhole), so
    * the band equi-join has full recall for maxHamming ≤ 3, and the
    * popcount check verifies. Shuffle key = (band, 16-bit value).
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
    hashNearDups(simHash(df, idCol, textCol), idCol, "simhash", maxHamming)

  /** Hamming-≤k pairs over ANY 64-bit fingerprint column (SimHash,
    * image dHash, …) via 4×16-bit band blocking: a pair within
    * Hamming ≤ 3 must agree exactly on ≥1 band (pigeonhole — the four
    * bands partition the 64 bits, ≤3 errors can touch ≤3 of them), so
    * the band equi-join has full recall for maxHamming ≤ 3 and the
    * popcount check verifies exactly. Shuffle key = (band, 16-bit
    * value) — candidates are O(n·4) rows of longs, never all pairs.
    *
    * Bands are STRIDED (band b = bits {i : i mod 4 = b}), not
    * contiguous: any partition of the bits preserves the pigeonhole
    * recall guarantee, but ADJACENT fingerprint bits anti-correlate
    * for comparison-based hashes (dHash: if cell j+1 is large, bit j
    * is 1 and bit j+1 likely 0), so contiguous bands collapse onto
    * alternation patterns — measured: the two values 0xAA55/0x55AA
    * held ~2% of a 50 k-image corpus each, and candidates grew
    * quadratically. Stride-4 bits are ~independent, so band values
    * fill the 16-bit space and collisions drop to the n/2¹⁶ chance
    * rate at any corpus size.
    */
  def hashNearDups(hashed: DataFrame, idCol: String, hashCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding guarantees recall only for Hamming <= 3")
    val banded = strideBanded(hashed, idCol, hashCol)
    val a = banded.select(col(idCol).as("id_a"), col(hashCol).as("sh_a"), col("band"), col("band_val"))
    val b = banded.select(col(idCol).as("id_b"), col(hashCol).as("sh_b"), col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** The four stride-4 16-bit band values of a 64-bit fingerprint
    * column (see [[hashNearDups]] for why strided, not contiguous).
    * Shared by the batch joins and the stateless streaming twin.
    */
  def strideBandVals(hashCol: Column): Seq[Column] =
    (0 until 4).map(b =>
      (0 until 16).map(i =>
        shiftleft(shiftright(hashCol, 4 * i + b).bitwiseAND(lit(1L)), i))
        .reduce(_ + _))

  private def strideBanded(hashed: DataFrame, idCol: String, hashCol: String): DataFrame =
    hashed.select(
      col(idCol), col(hashCol),
      posexplode(array(strideBandVals(col(hashCol)): _*)).as(Seq("band", "band_val")))

  /** Incremental Hamming-≤k near-dup over ANY 64-bit fingerprint: the
    * daily batch banded against the persisted corpus index (id, hash)
    * — batch×corpus only, NEVER corpus×corpus. The production shape of
    * crawl image dedup: the dHash index is an 8-byte column appended
    * at ingest; each new batch shuffles O(batch·4 + corpus·4) band
    * rows, full recall for maxHamming ≤ 3 by the same 4×16 pigeonhole
    * as [[hashNearDups]], exact popcount verify on collisions.
    *
    * @return (id_new, id_old, hamming) — every near-dup link from the
    *         batch into the corpus (a batch image may hit many).
    */
  def hashNearDupsIncremental(
      newHashed: DataFrame,
      corpusHashed: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding guarantees recall only for Hamming <= 3")
    val a = strideBanded(newHashed, idCol, hashCol)
      .select(col(idCol).as("id_new"), col(hashCol).as("sh_a"), col("band"), col("band_val"))
    val b = strideBanded(corpusHashed, idCol, hashCol)
      .select(col(idCol).as("id_old"), col(hashCol).as("sh_b"), col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .select("id_new", "id_old", "sh_a", "sh_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_new"), col("id_old"), col("hamming"))
  }
}
