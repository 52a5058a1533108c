package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Native TypedImperativeAggregate form of VecStatsAgg: identical
  * Welford/Chan math and output struct, but `update` reads the input
  * row's ArrayData IN PLACE — no ExpressionEncoder deserialization, no
  * per-row (Long, Array[Float]) tuple / array copy. The buffer lives as
  * a plain object per group and serializes (manually, one ByteBuffer)
  * only across the partial→final exchange. This removes the
  * SpecificSafeProjection per-row cost that dominated the distributed
  * BFS stats job at 10M × 96. */
case class VecStatsNative(left: Expression, right: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecStatsBuf] with BinaryLike[Expression]
    with ImplicitCastInputTypes {

  /** Declared input types make analysis insert casts (int id → bigint,
    * array<double> → array<float>) — without this, getFloat on a
    * double-backed ArrayData silently read half of each 8-byte slot, and
    * a non-long id threw ClassCastException mid-job. */
  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(LongType, ArrayType(FloatType))

  override def prettyName: String = "vec_stats_native"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sumId", DecimalType(38, 18), nullable = false),
    StructField("mean", ArrayType(DoubleType, containsNull = false)),
    StructField("m2", ArrayType(DoubleType, containsNull = false)),
    StructField("mn", ArrayType(DoubleType, containsNull = false)),
    StructField("mx", ArrayType(DoubleType, containsNull = false))))

  override def createAggregationBuffer(): VecStatsBuf =
    VecStatsBuf(0L, java.math.BigDecimal.ZERO, Array.empty, Array.empty,
      Array.empty, Array.empty)

  override def update(b: VecStatsBuf, input: InternalRow): VecStatsBuf = {
    val idAny = left.eval(input)
    val arr = right.eval(input).asInstanceOf[ArrayData]
    if (idAny == null || arr == null) return b
    val id = idAny.asInstanceOf[Long]
    val d = arr.numElements()
    if (b.cnt == 0L) {
      b.mean = new Array[Double](d)
      b.m2 = new Array[Double](d)
      b.mn = Array.fill(d)(Double.PositiveInfinity)
      b.mx = Array.fill(d)(Double.NegativeInfinity)
    }
    b.cnt += 1
    b.sumId = b.sumId.add(java.math.BigDecimal.valueOf(id))
    val n = b.cnt
    var i = 0
    while (i < d) {
      val v = arr.getFloat(i).toDouble
      val pa = b.mean(i)
      val a = pa + (v - pa) / n
      b.mean(i) = a
      b.m2(i) += (v - pa) * (v - a)
      if (v < b.mn(i)) b.mn(i) = v
      if (v > b.mx(i)) b.mx(i) = v
      i += 1
    }
    b
  }

  /** Chan's pairwise merge — byte-for-byte the VecStatsAgg math. */
  override def merge(x: VecStatsBuf, y: VecStatsBuf): VecStatsBuf = {
    if (x.cnt == 0L) y
    else if (y.cnt == 0L) x
    else {
      val n = x.cnt + y.cnt
      val d = x.mean.length
      var i = 0
      while (i < d) {
        val delta = y.mean(i) - x.mean(i)
        x.m2(i) += y.m2(i) + delta * delta * x.cnt * y.cnt / n
        x.mean(i) += delta * y.cnt / n
        if (y.mn(i) < x.mn(i)) x.mn(i) = y.mn(i)
        if (y.mx(i) > x.mx(i)) x.mx(i) = y.mx(i)
        i += 1
      }
      x.cnt = n
      x.sumId = x.sumId.add(y.sumId)
      x
    }
  }

  override def eval(b: VecStatsBuf): Any =
    new GenericInternalRow(Array[Any](
      b.cnt,
      Decimal(new java.math.BigDecimal(b.sumId.unscaledValue(), b.sumId.scale())
        .setScale(18), 38, 18),
      new GenericArrayData(b.mean.map(x => x: Any)),
      new GenericArrayData(b.m2.map(x => x: Any)),
      new GenericArrayData(b.mn.map(x => x: Any)),
      new GenericArrayData(b.mx.map(x => x: Any))))

  override def serialize(b: VecStatsBuf): Array[Byte] = {
    val idBytes = b.sumId.unscaledValue().toByteArray
    val d = b.mean.length
    val buf = ByteBuffer.allocate(8 + 4 + 4 + idBytes.length + 4 + 4 * 8 * d)
    buf.putLong(b.cnt)
    buf.putInt(b.sumId.scale())
    buf.putInt(idBytes.length)
    buf.put(idBytes)
    buf.putInt(d)
    var i = 0
    while (i < d) { buf.putDouble(b.mean(i)); i += 1 }
    i = 0
    while (i < d) { buf.putDouble(b.m2(i)); i += 1 }
    i = 0
    while (i < d) { buf.putDouble(b.mn(i)); i += 1 }
    i = 0
    while (i < d) { buf.putDouble(b.mx(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecStatsBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val cnt = buf.getLong
    val scale = buf.getInt
    val idBytes = new Array[Byte](buf.getInt)
    buf.get(idBytes)
    val sumId = new java.math.BigDecimal(new java.math.BigInteger(idBytes), scale)
    val d = buf.getInt
    def arr(): Array[Double] = {
      val a = new Array[Double](d)
      var i = 0
      while (i < d) { a(i) = buf.getDouble; i += 1 }
      a
    }
    VecStatsBuf(cnt, sumId, arr(), arr(), arr(), arr())
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecStatsNative =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecStatsNative =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecStatsNative =
    copy(left = l, right = r)
}

object VecStatsNative {
  /** Column form: vecStats(idCol, vecCol) usable in groupBy.agg — same
    * output struct field names as the Aggregator form. */
  def vecStats(id: Column, vec: Column): Column =
    GraftSqlShim.toColumn(
      VecStatsNative(GraftSqlShim.toExpression(id),
        GraftSqlShim.toExpression(vec)).toAggregateExpression())
}
