package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-m insertion buffer ordered by (dist asc, id asc) — the
  * exact (dist, id) rank every beam/kNN window in the engine uses, as a
  * mergeable O(m) aggregation state. Insertion and merge are pure
  * functions of the input SET (arrival order irrelevant: the ordering
  * is total), so partial aggregation across any partitioning is
  * deterministic. */
final class TopMBuf(val m: Int) {
  val ds: Array[Double] = new Array[Double](m)
  val ids: Array[Long] = new Array[Long](m)
  var n: Int = 0

  @inline private def before(d: Double, id: Long, j: Int): Boolean =
    d < ds(j) || (d == ds(j) && id < ids(j))

  def insert(d: Double, id: Long): Unit = {
    if (n < m || before(d, id, n - 1)) {
      var j = if (n < m) n else m - 1
      while (j > 0 && before(d, id, j - 1)) {
        ds(j) = ds(j - 1); ids(j) = ids(j - 1); j -= 1
      }
      ds(j) = d; ids(j) = id
      if (n < m) n += 1
    }
  }

  def mergeFrom(o: TopMBuf): TopMBuf = {
    var i = 0
    // o is sorted ascending: stop at the first element that no longer
    // beats the current m-th (every later one loses too)
    while (i < o.n && (n < m || before(o.ds(i), o.ids(i), n - 1))) {
      insert(o.ds(i), o.ids(i)); i += 1
    }
    this
  }
}

/** `top_m_by_dist(id, dist, m)` → `array<struct<id, dist>>` of the m
  * input rows with the smallest (dist, id), ascending.
  *
  * This is the partial-aggregatable form of "per group, keep the k
  * nearest": a hash aggregate combines map-side, so a Q×C scored join
  * flows straight into O(groups·m) state WITHOUT the per-partition
  * (qid, dist) sort a window/rank plan needs — the round-15 lesson
  * (the Q·C WindowGroupLimit sort spilled ~33 GB at a 10M-corpus 1%
  * append) turned into an operator. Used by the distributed graph-ANN
  * seed init ([[graft.operators.GraphAnn.graphKnnDistributed]]); the
  * shuffle after partial aggregation carries only groups·m rows. */
case class TopMByDist(left: Expression, right: Expression, m: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopMBuf]
    with BinaryLike[Expression] with ImplicitCastInputTypes {

  require(m >= 1, s"top_m_by_dist needs m >= 1, got $m")

  // left = id, right = dist
  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(LongType, DoubleType)

  override def prettyName: String = "top_m_by_dist"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopMBuf = new TopMBuf(m)

  override def update(b: TopMBuf, input: InternalRow): TopMBuf = {
    val idv = left.eval(input)
    val dv = right.eval(input)
    if (idv != null && dv != null)
      b.insert(dv.asInstanceOf[Double], idv.asInstanceOf[Long])
    b
  }

  override def merge(x: TopMBuf, y: TopMBuf): TopMBuf = x.mergeFrom(y)

  override def eval(b: TopMBuf): Any =
    new GenericArrayData(Array.tabulate[Any](b.n)(i =>
      new GenericInternalRow(Array[Any](b.ids(i), b.ds(i)))))

  override def serialize(b: TopMBuf): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 16 * b.n)
    buf.putInt(b.m); buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.ds(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopMBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopMBuf(buf.getInt)
    val n = buf.getInt
    var i = 0
    // entries were written in ascending (dist, id) order: appends keep
    // the buffer's sorted invariant without re-inserting
    while (i < n) { b.ds(i) = buf.getDouble; b.ids(i) = buf.getLong; i += 1 }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopMByDist =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopMByDist =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression): TopMByDist =
    copy(left = l, right = r)
}

object TopMByDist {
  /** Aggregate column: the m smallest (dist, id) pairs, ascending, as
    * `array<struct<id, dist>>`. */
  def topM(id: Column, dst: Column, m: Int): Column =
    GraftSqlShim.toColumn(
      TopMByDist(GraftSqlShim.toExpression(id),
        GraftSqlShim.toExpression(dst), m).toAggregateExpression())
}
