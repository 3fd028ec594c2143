package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: keeps the `k` smallest DISTINCT values of a hash column
  * per group, in a bounded buffer that merges associatively — so the
  * plan gets genuine map-side partial aggregation with O(k) state per
  * group, the whole point of a sketch at 100 TB (an exact
  * countDistinct shuffles every distinct hash; this shuffles at most
  * k longs per group per map task).
  *
  * The estimator over the result (see [[KmvSketch.estimate]]) is the
  * classic KMV/bottom-k estimate (Bar-Yossef et al. 2002): with h
  * uniform on [0, 2^32) (see [[graft.ops.Hashing.hash32]]), the k-th
  * smallest distinct value h_(k) gives n̂ = (k-1) · 2^32 / h_(k);
  * below k distinct values the sketch IS the distinct set and the
  * count is exact. Deterministic — no RNG, no insertion-order
  * dependence — so the DuckDB oracle replays it exactly
  * (`ORDER BY h LIMIT k` on the distinct hashes).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit =
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last) {
      // only evict when x was genuinely new (TreeSet.add is false on dup)
      if (buf.add(x)) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(v => add(buf, v))
    buf
  }

  /** Ascending array of the kept minima (TreeSet iterates sorted). */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    buf.forEach { v => arr(i) = v; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** Column surface: ascending array<long> of the k min distinct
    * hashes of `h` (fewer if the group has fewer distinct values).
    */
  def mins(h: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvSketch(GraftColumnBridge.expression(h), k).toAggregateExpression())

  /** Distinct-count estimate from a [[mins]] array: exact below k,
    * (k-1)·2^32 / h_(k) at capacity. `hash32` is uniform on
    * [0, 2^32), so h_(k) ≥ k-1 ≥ 1 — the division is safe.
    */
  def estimate(minsCol: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    when(size(minsCol) < k, size(minsCol).cast("double"))
      .otherwise(
        lit((k - 1).toDouble * 4294967296.0) /
          element_at(minsCol, k).cast("double"))
  }
}
