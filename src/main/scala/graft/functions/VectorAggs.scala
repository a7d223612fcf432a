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

  /** Per-group exact top-k by (score desc, id asc):
    * array<struct<neighbor_id, cosine>> in rank order. Partial-
    * aggregable (each map task keeps at most k candidates per group),
    * so the brute-force kNN truth shuffles k rows per (group,
    * partition) instead of the full |queries|×|corpus| scored pair
    * table through a window sort — the §2.3 "aggregate before you
    * shuffle" shape. Comparator is java.lang.Double.compare on the
    * score with the id as tie-break — bit-identical ranking to the
    * row_number window it replaces (same tie order on equal doubles).
    */
  def topKByScore(id: Column, score: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(id), GraftBridge.expression(score), k)
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

/** Mutable buffer for [[TopKByScore]]: parallel arrays of the current
  * top candidates in rank order (score desc, id asc), n ≤ k.
  */
final class TopKBuf(var n: Int, var ids: Array[Long], var scores: Array[Double])

case class TopKByScore(
    left: Expression,   // id: long, unique within the corpus side
    right: Expression,  // score: double (cosine)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k >= 1, "top-k needs k >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuf =
    new TopKBuf(0, new Array[Long](k), new Array[Double](k))

  /** rank order: score desc (java.lang.Double.compare — the same
    * total order Spark's sort applies to DoubleType, NaN greatest),
    * id asc on ties.
    */
  private def beats(s: Double, id: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2)
    c > 0 || (c == 0 && id < id2)
  }

  private def offer(b: TopKBuf, id: Long, s: Double): Unit = {
    if (b.n == k && !beats(s, id, b.scores(k - 1), b.ids(k - 1))) return
    // insertion position by linear scan — k is small (3-5 in every caller)
    var pos = if (b.n == k) k - 1 else b.n
    if (b.n < k) b.n += 1
    while (pos > 0 && beats(s, id, b.scores(pos - 1), b.ids(pos - 1))) {
      b.ids(pos) = b.ids(pos - 1); b.scores(pos) = b.scores(pos - 1); pos -= 1
    }
    b.ids(pos) = id; b.scores(pos) = s
  }

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val iv = left.eval(input)
    val sv = right.eval(input)
    if (iv != null && sv != null)
      offer(b, iv.asInstanceOf[Long], sv.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.n) { offer(b, o.ids(i), o.scores(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuf): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = InternalRow(b.ids(i), b.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putDouble(b.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new TopKBuf(n, new Array[Long](k), new Array[Double](k))
    var i = 0
    while (i < n) { b.ids(i) = bb.getLong(); b.scores(i) = bb.getDouble(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByScore =
    copy(left = l, right = r)
}
