package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM 2002; the theta-sketch family's base estimator): keep the k
  * smallest DISTINCT hash uniforms seen; with the k-th minimum m, the
  * estimate is (k−1)/m. One streaming pass, O(k) state per group,
  * mergeable across partitions — the count-distinct shape for 100 TB,
  * where an exact `COUNT(DISTINCT)` shuffles every distinct value and a
  * per-engine HLL (Spark's approx_count_distinct vs any other engine's)
  * is not reproducible across systems.
  *
  * Cross-engine determinism: the input is the engine-portable
  * [[PortableHash.md5Uniform]] of the value, and the sketch is a pure
  * function of the SET of uniforms (insertion order irrelevant —
  * a bounded sorted set, not a sampling process), so the DuckDB oracle
  * recomputes the identical k minima with `ORDER BY u LIMIT k` and the
  * identical estimate with the same `(k-1)/m` division.
  *
  * The buffer is a TreeSet capped at k: update is O(log k) with an
  * early reject of anything at or above the current k-th min; merge is
  * set-union under the same cap. Serialization across the
  * partial→final exchange is k doubles. */
case class KmvSketch(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(DoubleType)

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("kth", DoubleType, nullable = false),
    StructField("estimate", DoubleType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  override def update(b: java.util.TreeSet[java.lang.Double],
                      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[Double]
      if (b.size < k) b.add(u)
      else if (u < b.last()) { if (b.add(u)) b.pollLast() }
    }
    b
  }

  override def merge(x: java.util.TreeSet[java.lang.Double],
                     y: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    val it = y.iterator()
    var more = true
    while (it.hasNext && more) {
      val u = it.next()
      if (x.size < k) x.add(u)
      else if (u < x.last()) { if (x.add(u)) x.pollLast() }
      // y is sorted ascending: once one element fails the k-th-min test,
      // every later one does too
      else more = false
    }
    x
  }

  override def eval(b: java.util.TreeSet[java.lang.Double]): Any = {
    val n = b.size.toLong
    val kth = if (b.isEmpty) 1.0 else b.last().doubleValue()
    val est = if (n < k) n.toDouble else (k - 1).toDouble / kth
    new GenericInternalRow(Array[Any](n, kth, est))
  }

  override def serialize(b: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.size)
    buf.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) buf.putDouble(it.next().doubleValue())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val s = new java.util.TreeSet[java.lang.Double]()
    var i = 0
    while (i < n) { s.add(buf.getDouble); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvSketch =
    copy(child = c)
}

object KmvSketch {
  /** Aggregate column: KMV sketch over a pre-hashed uniform column —
    * struct(n, kth, estimate). Pass [[PortableHash.md5Uniform]] of the
    * value so the oracle can replay the identical uniforms. */
  def kmv(uniform: Column, k: Int): Column =
    GraftSqlShim.toColumn(
      KmvSketch(GraftSqlShim.toExpression(uniform), k).toAggregateExpression())

  /** Convenience: sketch the distinct count of `value` directly. */
  def kmvDistinct(value: Column, k: Int): Column =
    kmv(PortableHash.md5Uniform(value.cast("string")), k)
}
