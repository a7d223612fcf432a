package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom typed aggregates for the bisecting-tree k-means path.
  *
  * Both exist for STAGE-COUNT, not expressiveness: the same math is
  * expressible with posexplode + two groupBys (per-dim frozen means)
  * and with two min/min_by aggregations plus a join (two-smallest
  * seeds), but each extra aggregation is an extra shuffle stage PER
  * TREE LEVEL — at ⌈log₂ k⌉ + slack levels that fixed cost dominates
  * small-scale wall time and adds a scheduler round-trip per level at
  * any scale. Each aggregate here is partial-aggregable (update +
  * merge), so map-side combine applies and an n-row root node is not
  * a skew hazard — the same property the min/min_by formulation was
  * chosen for.
  *
  * Determinism: [[FrozenVecSum]] accumulates the SAME per-dimension
  * integer units (floor(x·2²⁰ + 0.5) as long) the posexplode
  * formulation summed — integer addition is order-independent, so
  * any partitioning and any engine produces identical sums.
  * [[Min2ByVid]] selects by unique vid — order-independent min.
  */
object VectorAggs {

  /** Per-group frozen vector sum: struct(sx array<long>, nx long)
    * where sx[d] = Σ floor(x_d·2²⁰+0.5). NULL input rows are skipped
    * (empty group → NULL struct), which is what lets one groupBy
    * carry a per-child sum via `when(child = c, cv)`.
    */
  def frozenVecSum(v: Column): Column =
    GraftBridge.column(
      FrozenVecSum(GraftBridge.expression(v)).toAggregateExpression())

  /** Per-group two smallest-vid vectors: struct(c0 array<double>,
    * c1 array<double>) with c1 NULL for single-row groups — the
    * bisecting split's deterministic seed pair in ONE aggregation.
    */
  def min2ByVid(vid: Column, cv: Column): Column =
    GraftBridge.column(
      Min2ByVid(GraftBridge.expression(vid), GraftBridge.expression(cv))
        .toAggregateExpression())
}

/** Mutable buffer for [[FrozenVecSum]]: per-dim long sums + count. */
final class FrozenVecBuf(var n: Long, var sx: Array[Long])

case class FrozenVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FrozenVecBuf] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("sx", ArrayType(LongType, containsNull = false)),
    StructField("nx", LongType)))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): FrozenVecBuf = new FrozenVecBuf(0L, null)

  override def update(b: FrozenVecBuf, input: InternalRow): FrozenVecBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (b.sx == null) b.sx = new Array[Long](d)
      else require(d == b.sx.length,
        s"FrozenVecSum: ragged embedding input (dim $d != ${b.sx.length})")
      var i = 0
      while (i < d) {
        b.sx(i) += math.floor(arr.getDouble(i) * 1048576.0 + 0.5).toLong
        i += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(b: FrozenVecBuf, o: FrozenVecBuf): FrozenVecBuf = {
    if (o.sx != null) {
      if (b.sx == null) { b.sx = o.sx.clone(); b.n = o.n }
      else {
        require(b.sx.length == o.sx.length,
          s"FrozenVecSum: ragged merge (dim ${o.sx.length} != ${b.sx.length})")
        var i = 0
        while (i < b.sx.length) { b.sx(i) += o.sx(i); i += 1 }
        b.n += o.n
      }
    }
    b
  }

  override def eval(b: FrozenVecBuf): Any =
    if (b.n == 0L) null else InternalRow(new GenericArrayData(b.sx), b.n)

  override def serialize(b: FrozenVecBuf): Array[Byte] = {
    val d = if (b.sx == null) 0 else b.sx.length
    val bb = ByteBuffer.allocate(12 + 8 * d)
    bb.putLong(b.n).putInt(d)
    var i = 0
    while (i < d) { bb.putLong(b.sx(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FrozenVecBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val d = bb.getInt()
    if (d == 0) new FrozenVecBuf(n, null)
    else {
      val sx = new Array[Long](d)
      var i = 0
      while (i < d) { sx(i) = bb.getLong(); i += 1 }
      new FrozenVecBuf(n, sx)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): FrozenVecSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrozenVecSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FrozenVecSum =
    copy(child = c)
}

/** Mutable buffer for [[Min2ByVid]]: the two smallest (vid, vec). */
final class Min2Buf(
    var v0: Long, var c0: Array[Double],
    var v1: Long, var c1: Array[Double])

case class Min2ByVid(
    left: Expression,   // vid: long, unique within the corpus
    right: Expression,  // cv: array<double>
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Min2Buf] with BinaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("c0", ArrayType(DoubleType, containsNull = false)),
    StructField("c1", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Min2Buf =
    new Min2Buf(Long.MaxValue, null, Long.MaxValue, null)

  private def offer(b: Min2Buf, vid: Long, cv: Array[Double]): Unit = {
    if (cv == null) return
    if (b.c0 == null || vid < b.v0) {
      b.v1 = b.v0; b.c1 = b.c0; b.v0 = vid; b.c0 = cv
    } else if (vid != b.v0 && (b.c1 == null || vid < b.v1)) {
      b.v1 = vid; b.c1 = cv
    }
  }

  override def update(b: Min2Buf, input: InternalRow): Min2Buf = {
    val vv = left.eval(input)
    val cv = right.eval(input)
    if (vv != null && cv != null)
      offer(b, vv.asInstanceOf[Long], cv.asInstanceOf[ArrayData].toDoubleArray())
    b
  }

  override def merge(b: Min2Buf, o: Min2Buf): Min2Buf = {
    if (o.c0 != null) offer(b, o.v0, o.c0)
    if (o.c1 != null) offer(b, o.v1, o.c1)
    b
  }

  override def eval(b: Min2Buf): Any =
    if (b.c0 == null) null
    else InternalRow(
      new GenericArrayData(b.c0),
      if (b.c1 == null) null else new GenericArrayData(b.c1))

  override def serialize(b: Min2Buf): Array[Byte] = {
    val d0 = if (b.c0 == null) -1 else b.c0.length
    val d1 = if (b.c1 == null) -1 else b.c1.length
    val bb = ByteBuffer.allocate(24 + 8 * math.max(d0, 0) + 8 * math.max(d1, 0))
    bb.putLong(b.v0).putLong(b.v1).putInt(d0).putInt(d1)
    if (d0 > 0) b.c0.foreach(bb.putDouble)
    if (d1 > 0) b.c1.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Min2Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val v0 = bb.getLong(); val v1 = bb.getLong()
    val d0 = bb.getInt(); val d1 = bb.getInt()
    def arr(d: Int): Array[Double] =
      if (d < 0) null
      else { val a = new Array[Double](d); var i = 0; while (i < d) { a(i) = bb.getDouble(); i += 1 }; a }
    new Min2Buf(v0, arr(d0), v1, arr(d1))
  }

  override def withNewMutableAggBufferOffset(o: Int): Min2ByVid =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Min2ByVid =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Min2ByVid =
    copy(left = l, right = r)
}
