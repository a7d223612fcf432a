package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Embedding-vector preparation operators: unit normalization,
  * symmetric int8 quantization, and corpus-level norm statistics —
  * the storage/compute reducers an embedding pipeline applies before
  * ANN indexing or training-data export.
  *
  * Scale design: every kernel is a per-row native expression
  * ([[graft.functions.L2Normalize]], [[graft.functions.QuantizeI8]])
  * that runs inside the scan stage — zero shuffle, whole-stage
  * codegen, no interpreted higher-order-function lambdas. Stats
  * aggregate in exact integer space (norm → ten-thousandths) so the
  * reduction is order-independent and bit-identical on any engine at
  * any parallelism — the property that keeps a 100 TB aggregate
  * reproducible across retries and cluster sizes.
  */
object Embeddings {

  /** max|x| of an array<double> column (0.0 for the zero/empty vector). */
  def maxAbs(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x))), lit(0.0))

  /** The int8 quantization scale paired with [[VectorExprs.quantizeI8]]:
    * 127 / max|x|, 0 for the zero vector. Plain-Column formula so an
    * oracle engine reproduces it bit-exactly.
    */
  def quantScale(vec: Column): Column = {
    val m = maxAbs(vec)
    when(m === 0.0, lit(0.0)).otherwise(lit(127.0) / m)
  }

  /** Adds `unit` (unit-normalized vector) and `norm` (L2 norm) columns.
    * Sequential-order sum → cross-engine bit-exact norms.
    */
  def normalize(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("norm", sqrt(VectorExprs.dotp(v, v)))
      .withColumn("unit", VectorExprs.l2Normalize(v))
  }

  /** Adds `qvec` (int8 codes as array<int>) and `scale` columns. */
  def quantizeI8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("qvec", VectorExprs.quantizeI8(v))
      .withColumn("scale", quantScale(v))
  }

  /** Per-group norm statistics with the sum carried in exact integer
    * ten-thousandths (floor(norm·10⁴+0.5)) — associative + commutative
    * integer addition, so partial aggregation is safe and the result
    * is independent of partitioning.
    */
  def normStats(df: DataFrame, vecCol: String, groupCols: String*): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val norm = sqrt(VectorExprs.dotp(v, v))
    df.withColumn("__norm_e4", floor(norm * 10000 + lit(0.5)).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_vectors"),
        min(col("__norm_e4")).as("min_norm_e4"),
        max(col("__norm_e4")).as("max_norm_e4"),
        sum(col("__norm_e4")).as("sum_norm_e4"))
  }

  /** Per-group centroid components in exact integer millionths:
    * each component is fixed to ⌊x·10⁶+0.5⌋ BEFORE summing, so the
    * per-dimension sums are associative integer adds — identical
    * under any partitioning, retry, or engine — and the caller
    * recovers the mean as sum_e6 / (n·10⁶) to float precision.
    * One shuffle keyed on (group, dim): at d dims the shuffle is
    * n·d fixed-width rows, partial-aggregated map-side.
    */
  def centroids(df: DataFrame, vecCol: String, groupCols: String*): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(groupCols.map(col) :+ posexplode(v): _*)
      .select(groupCols.map(col) :+ col("pos").cast("long").as("dim")
        :+ floor(col("col") * 1000000 + lit(0.5)).cast("long").as("c_e6"): _*)
      .groupBy((groupCols.map(col) :+ col("dim")): _*)
      .agg(count(lit(1)).as("n"), sum(col("c_e6")).as("sum_e6"))
  }

  /** Per-group centroid drift between two corpus snapshots — cosine
    * between the old and new centroid plus the L2 shift, per label:
    * the embedding-space regression test run after a re-crawl or an
    * encoder upgrade, before the new vectors replace the index.
    *
    * Determinism: per-dim centroid components derive from
    * [[centroids]]' EXACT integer sums; the cross-dim reductions
    * (dot, norms, Δ²) fold a dim-sorted per-label array row-locally,
    * so float accumulation order is fixed on any engine at any
    * parallelism. Per-label state is one dims-length array — KBs.
    */
  def centroidDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      vecCol: String,
      groupCol: String): DataFrame = {
    def cents(df: DataFrame, n: String, s: String) =
      centroids(df, vecCol, groupCol)
        .select(col(groupCol), col("dim"), col("n").as(n), col("sum_e6").as(s))
    val j = cents(dfA, "n_a", "s_a").join(cents(dfB, "n_b", "s_b"), Seq(groupCol, "dim"))
      .select(col(groupCol), col("dim"), col("n_a"), col("n_b"),
        (col("s_a").cast("double") / col("n_a") / 1000000).as("m_a"),
        (col("s_b").cast("double") / col("n_b") / 1000000).as("m_b"))
    def fold(body: String) =
      expr(s"aggregate(ds, cast(0.0 as double), (acc, x) -> acc + $body)")
    j.groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sort_array(collect_list(struct(col("dim"), col("m_a"), col("m_b")))).as("ds"))
      .withColumn("dot", fold("x.m_a * x.m_b"))
      .withColumn("na2", fold("x.m_a * x.m_a"))
      .withColumn("nb2", fold("x.m_b * x.m_b"))
      .withColumn("l2", fold("(x.m_a - x.m_b) * (x.m_a - x.m_b)"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        (floor(col("dot") / sqrt(col("na2")) / sqrt(col("nb2")) * 1000000 + lit(0.5))
          / 1000000).as("cosine"),
        (floor(sqrt(col("l2")) * 1000000 + lit(0.5)) / 1000000).as("l2_shift"))
  }

  /** Product-quantization encode: each vector splits into `nSub`
    * contiguous sub-vectors; each sub-vector is coded as its nearest
    * centroid in a per-subspace codebook of `nCodes` entries — dims·4
    * bytes of floats become nSub byte-ish codes (64 dims → 8 codes is
    * 32×), the compression ANN rerank and training-data export lean
    * on. Codebook seeding is deterministic and untrained (the nCodes
    * lowest-id vectors' sub-slices, [[graft.operators.Similarity]]
    * IVF's convention) — production trains per-subspace k-means on a
    * sample and persists; the encode plan is identical either way.
    *
    * 100 TB path: the codebook is nSub·nCodes rows (KBs) and
    * BROADCASTS; the corpus explodes row-locally ×nSub, and the
    * ×nCodes blowup from the broadcast equi-join collapses in the
    * SAME stage via partial min-aggregation (min over a
    * (dist, code) struct — no window, no sort, nothing corpus-sized
    * crosses the wire beyond n·nSub fixed-width rows).
    *
    * @return (id, subspace, code, dist2) — dist2 the squared L2
    *         residual, the per-code quantization error
    */
  def pqEncode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      nSub: Int,
      nCodes: Int): DataFrame = {
    require(dims % nSub == 0, "dims must divide into equal subspaces")
    val subDim = dims / nSub
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
    def subSlices(e: Column) =
      array((0 until nSub).map(s => slice(e, s * subDim + 1, subDim)): _*)
    val sub = v.select(col(idCol),
      posexplode(subSlices(col("e"))).as(Seq("subspace", "sv")))
    val codebook = v.orderBy(col(idCol)).limit(nCodes)
      .select(col(idCol).as("code"),
        posexplode(subSlices(col("e"))).as(Seq("subspace", "cv")))
    // squared L2 in fixed index order: (0 + d₁) + d₂ + … matches the
    // oracle's list_reduce fold bit for bit
    val dist2 = (0 until subDim).map { i =>
      val d = element_at(col("sv"), i + 1) - element_at(col("cv"), i + 1)
      d * d
    }.reduce(_ + _)
    sub.join(broadcast(codebook), Seq("subspace"))
      .groupBy(col(idCol), col("subspace"))
      .agg(min(struct(dist2.as("dist2"), col("code").as("code"))).as("w"))
      .select(col(idCol), col("subspace").cast("long").as("subspace"),
        col("w.code").as("code"), round(col("w.dist2"), 6).as("dist2"))
  }

  /** Upper-triangular feature covariance over the first `dims`
    * embedding dimensions — the d²-bounded statistic behind PCA /
    * whitening / drift monitors. cov(i,j) = E[xᵢxⱼ] − E[xᵢ]E[xⱼ] with
    * both moment sums accumulated as scaled integers (products in
    * 10⁻⁸ units, means in 10⁻⁴ units), so the reduction is
    * order-independent and the reported covariance is bit-identical
    * at any parallelism — a raw double Σxᵢxⱼ over 10⁹ vectors would
    * hash differently run to run.
    *
    * Scale shape: the d(d+1)/2 products per vector are generated
    * row-local (nested transform, no self-join) and partial-aggregate
    * map-side, so the shuffle carries d² rows per partition — never
    * corpus-scale. The mean table (d rows) broadcasts back twice for
    * the centering term. Long-overflow headroom: |x|≲1 ⇒ products
    * ≲10⁸ each, 2⁶³/10⁸ ≈ 9·10¹⁰ vectors before saturation.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    val pairs = df.select(explode(expr(
      s"""flatten(transform(sequence(0, ${dims - 1}), i ->
         |  transform(sequence(i, ${dims - 1}), j ->
         |    struct(i AS i, j AS j,
         |      CAST(floor(CAST($vecCol[i] AS DOUBLE) * CAST($vecCol[j] AS DOUBLE)
         |        * 100000000D + 0.5D) AS BIGINT) AS p))))""".stripMargin)).as("s"))
      .select(col("s.i").as("i"), col("s.j").as("j"), col("s.p").as("p"))
    val mom = pairs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"))
    val means = df.select(explode(expr(
      s"""transform(sequence(0, ${dims - 1}), k ->
         |  struct(k AS i,
         |    CAST(floor(CAST($vecCol[k] AS DOUBLE) * 10000D + 0.5D) AS BIGINT)
         |      AS x))""".stripMargin)).as("s"))
      .groupBy(col("s.i").as("i")).agg(sum(col("s.x")).as("sx"))
    mom
      .join(broadcast(means), Seq("i"))
      .join(broadcast(means.select(col("i").as("j"), col("sx").as("sy"))), Seq("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"), col("n"),
        (floor((col("sp").cast("double") / 100000000L / col("n")
          - (col("sx").cast("double") / 10000 / col("n"))
            * (col("sy").cast("double") / 10000 / col("n"))) * 1000000 + lit(0.5))
          / 1000000).as("cov"))
  }
}
