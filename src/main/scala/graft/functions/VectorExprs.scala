package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity/dedup hot kernels.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * evaluate their lambda per element with no codegen (CodegenFallback),
  * which makes O(pairs·dims) kernels interpreter-bound. These
  * expressions run the same arithmetic in tight JVM loops — same
  * operation order, bit-identical results — and `DotProduct` joins
  * whole-stage codegen so the 100 TB hot path stays compiled.
  */
object VectorExprs {

  /** dot(a, b) over array<double>, sequential left-to-right sum —
    * bit-identical to `aggregate(zip_with(a,b,*), 0.0, +)` and to the
    * DuckDB oracle's list_reduce fold.
    */
  def dotp(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** MinHash signature (array<long> of `numHashes` slots) from an
    * array<int> of shingle hashes.
    */
  def minhashSig(hashes: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), numHashes))
}

/** Sequential-order dot product of two double arrays (codegen'd). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dotp requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** One-pass MinHash signature over pre-hashed shingles.
  *
  * For each of `numHashes` universal-hash permutations
  * (aᵢ·h + bᵢ) mod p (p = 2³¹−1, products stay within 62 bits), keeps
  * the minimum over the input hashes. Permutation constants come from
  * a fixed SplitMix64 walk so signatures are stable across runs,
  * clusters, and releases.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val P: Long = 2147483647L

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0xBF58476D1CE4E5B9L
      var z = x
      z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      math.floorMod(z, P - 1) + 1
    }
    (Array.fill(numHashes)(next()), Array.fill(numHashes)(next()))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(P)
    var i = 0
    while (i < n) {
      val h = math.floorMod(arr.getInt(i).toLong, P)
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * h + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
