package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) over
  * the engine-portable 60-bit md5 hash — the mergeable FREQUENCY sketch
  * that completes the sketch family here ([[HllSketch]] = distinct
  * count, [[KmvSketch]] = order statistics, [[MisraGries]] = exact
  * heavy hitters, `Bloom` = membership): point frequency estimates for
  * ANY key from d·w counters of fixed size, with one-sided error —
  * est(x) >= true(x) always, and est(x) <= true(x) + e/w · N with
  * probability 1 − (1/2)^d under pairwise-independent row hashes.
  *
  * Cross-engine determinism: the d row buckets are consecutive b-bit
  * SLICES of one [[PortableHash.md5Long60]] value (w = 2^b; row j's
  * bucket = bits [j·b, (j+1)·b) of the hash; d·b <= 60). A second
  * engine recomputes every counter as a plain GROUP BY over
  * (row, slice) — the same replay-the-registers gating contract as
  * [[HllSketch]] (q37). Slices of one md5 are not formally pairwise
  * independent across rows, but md5's bits carry no exploitable
  * structure, so the error bound holds in practice (the same stance as
  * HLL's bucket/rho split of a single hash — and at 100 TB the
  * alternative, d independent md5 passes per row, would d-uple the
  * hashing cost of every scan).
  *
  * Buffer: d·w longs (d=4, w=512 → 16 KiB) per group REGARDLESS of
  * cardinality or N; update is d slice-and-increment steps, merge is
  * elementwise sum (associative/commutative — partial sketches from
  * any partitioning of the data sum to the sketch of the whole, the
  * property that makes the map-side combine lossless), serialization is
  * the raw counter array. Estimates read min over the key's d counters.
  */
case class CmsSketch(child: Expression, d: Int, b: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(d >= 1 && b >= 1 && d * b <= 60,
    s"CMS needs d >= 1, b >= 1 and d*b <= 60 slice bits, got d=$d b=$b")

  private def w: Int = 1 << b

  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(LongType)

  override def prettyName: String = "cms_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = CmsSketch.resultType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // 60-bit hash contract, same masking stance as HllSketch: a full
      // 64-bit (possibly negative) hash through the SQL surface still
      // sketches its low 60 bits
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      var j = 0
      while (j < d) {
        buf(j * w + ((h >>> (j * b)) & (w - 1)).toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    CmsSketch.sumInto(x, y)

  override def eval(buf: Array[Long]): Any = CmsSketch.evalBuffer(buf, w)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmsSketch.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmsSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmsSketch =
    copy(child = c)
}

object CmsSketch {
  /** struct(n_total, counters) — `counters` is the flat d·w long array
    * (row-major: counter (j, bucket) at index j·w + bucket), the value
    * to PERSIST for sketch cubes (re-aggregate with elementwise sum). */
  val resultType: StructType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("counters", ArrayType(LongType, containsNull = false),
      nullable = false)))

  private[functions] def sumInto(dst: Array[Long],
                                 src: Array[Long]): Array[Long] = {
    require(dst.length == src.length,
      s"cms merge: counter arrays differ in size " +
        s"(${dst.length} vs ${src.length}) — mixed (d, b) sketches")
    var i = 0
    while (i < dst.length) { dst(i) += src(i); i += 1 }
    dst
  }

  // shared by CmsSketch and CmsMerge so the sketch and its
  // re-aggregation can never diverge in result derivation or wire form
  private[functions] def evalBuffer(buf: Array[Long], w: Int): Any = {
    // every row holds the full count once: N = sum of row 0
    var n = 0L
    var i = 0
    while (i < w) { n += buf(i); i += 1 }
    new GenericInternalRow(Array[Any](n, new GenericArrayData(buf.clone())))
  }

  private[functions] def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  private[functions] def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  /** Aggregate column: CMS counters over a pre-hashed 60-bit column —
    * struct(n_total, counters). Pass [[PortableHash.md5Long60]] of the
    * value so an oracle can replay the identical counters. */
  def cms(hash60: Column, d: Int, b: Int): Column =
    GraftSqlShim.toColumn(
      CmsSketch(GraftSqlShim.toExpression(hash60), d, b).toAggregateExpression())

  /** Convenience: sketch the frequencies of `value` directly. */
  def cmsFreq(value: Column, d: Int, b: Int): Column =
    cms(PortableHash.md5Long60(value.cast("string")), d, b)

  /** Point-frequency estimate of `value` from a persisted counter array:
    * min over the value's d row counters — pure Column arithmetic
    * (element_at), usable after the sketch row is broadcast or joined. */
  def cmsEstimate(counters: Column, value: Column, d: Int, b: Int): Column = {
    require(d >= 1 && b >= 1 && d * b <= 60,
      s"CMS needs d >= 1, b >= 1 and d*b <= 60 slice bits, got d=$d b=$b")
    val w = 1 << b
    val h = PortableHash.md5Long60(value.cast("string"))
    (0 until d).map { j =>
      element_at(counters,
        (lit(j * w) + shiftrightunsigned(h, j * b).bitwiseAND(lit(w - 1)))
          .cast("int") + lit(1))
    }.reduce(least(_, _))
  }
}

/** Re-aggregation of PERSISTED CMS counter arrays — the frequency
  * member of the sketch-cube pattern ([[HllMerge]] is the distinct
  * member): keep one d·w counter array per (dimension, day) cell,
  * answer any roll-up's point frequencies by elementwise-SUM-merging
  * the cells. Sum is associative and commutative — partial cells from
  * any slicing add to exactly the sketch of the union — but NOT
  * idempotent: duplicate ingest double-counts (the same exactly-once
  * contract as additive histogram cells, unlike HLL's self-healing
  * max). Input rows are `counters` arrays from [[CmsSketch]] (same
  * d, b); output is the same result struct. */
case class CmsMerge(child: Expression, d: Int, b: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(d >= 1 && b >= 1 && d * b <= 60,
    s"CMS needs d >= 1, b >= 1 and d*b <= 60 slice bits, got d=$d b=$b")

  private def w: Int = 1 << b

  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(ArrayType(LongType))

  override def prettyName: String = "cms_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = CmsSketch.resultType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == d * w,
        s"cms_merge(d=$d, b=$b) expects ${d * w} counters, " +
          s"got ${arr.numElements()} — mixed (d, b) sketches")
      var i = 0
      while (i < d * w) {
        // a null or negative slot is not a CmsSketch counter array —
        // fail loudly rather than merge garbage
        require(!arr.isNullAt(i), s"cms_merge: null counter at $i")
        val c = arr.getLong(i)
        require(c >= 0L, s"cms_merge: negative counter $c at $i")
        buf(i) += c
        i += 1
      }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    CmsSketch.sumInto(x, y)

  override def eval(buf: Array[Long]): Any = CmsSketch.evalBuffer(buf, w)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmsSketch.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmsSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmsMerge =
    copy(child = c)
}

object CmsMerge {
  /** Aggregate column: merge persisted counter arrays —
    * struct(n_total, counters). */
  def cmsMerge(counters: Column, d: Int, b: Int): Column =
    GraftSqlShim.toColumn(
      CmsMerge(GraftSqlShim.toExpression(counters), d, b)
        .toAggregateExpression())
}
