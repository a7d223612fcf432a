package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for graft's native expressions, so
  * SQL users (spark.sql / thrift) can call them directly:
  *
  *   spark.sql("SELECT dotp(a.embedding, b.embedding) ...")
  *   spark.sql("SELECT minhash_sig(transform(shingles, s -> hash(s)), 128) ...")
  *
  * Wire up either via config
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * or imperatively with `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  private def intArg(e: Expression): Int = {
    require(e.foldable, "graft function: size argument must be a constant")
    val v = e.eval()
    require(v != null, "graft function: size argument must be non-null")
    v.asInstanceOf[Number].intValue()
  }

  private[functions] val definitions
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dotp", info("dotp"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("minhash_sig", info("minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0), intArg(exprs(1)))),
    ("shingle_set", info("shingle_set"),
      (exprs: Seq[Expression]) => ShingleSet(exprs(0), intArg(exprs(1)))),
    ("sorted_intersect_size", info("sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1))),
    ("hyperplane_bucket", info("hyperplane_bucket"),
      (exprs: Seq[Expression]) => HyperplaneBucket(exprs(0), intArg(exprs(1)))),
    ("simhash64", info("simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))),
    ("l2_normalize", info("l2_normalize"),
      (exprs: Seq[Expression]) => L2Normalize(exprs(0))),
    ("quantize_i8", info("quantize_i8"),
      (exprs: Seq[Expression]) => QuantizeI8(exprs(0))),
    ("shingle_stats", info("shingle_stats"),
      (exprs: Seq[Expression]) => ShingleStats(exprs(0), intArg(exprs(1)))),
    ("bpe_count", info("bpe_count"),
      (exprs: Seq[Expression]) => BpeTokenCount(exprs(0))))

  /** Imperative registration into an existing session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
