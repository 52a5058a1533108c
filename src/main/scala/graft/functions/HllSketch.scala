package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) over
  * the engine-portable 60-bit md5 hash — the industry-standard mergeable
  * cardinality sketch, here in a form a second engine can replay
  * bit-for-bit. [[KmvSketch]] is the order-statistics estimator of the
  * same family; HLL's register state is O(m) bytes REGARDLESS of
  * cardinality (KMV keeps k doubles), merge is an elementwise byte max,
  * and the standard error is ~1.04/sqrt(m) — the shape every warehouse
  * ships for COUNT(DISTINCT) at 100 TB, where the per-group state must
  * stay constant while groups hold billions of values.
  *
  * Cross-engine determinism (unlike Spark's own approx_count_distinct,
  * whose HLL++ registers are private to its xxhash64 layout): the input
  * is [[PortableHash.md5Long60]] — 60 hash bits h; bucket = h mod m (low
  * p bits), w = h >> p (the remaining 60−p), rho(w) = leading zeros of w
  * in its (60−p)-bit field + 1 (w = 0 → 61−p). Every register is then a
  * pure max over the value SET (duplicates and order irrelevant), so a
  * DuckDB oracle recomputes the identical registers from md5 hex
  * arithmetic, the identical integer Z-sum, and the identical estimate.
  *
  * The raw-estimate float math is engine-stable by construction: the
  * harmonic sum is kept as the INTEGER z_fix = Σ_j 2^(R − r_j) (R =
  * 61−p, so empty registers contribute 2^R and the sum is ≤ 2^61 —
  * never overflows, never rounds), and the estimate alpha·m²·2^R /
  * z_fix multiplies by exact powers of two (m and 2^R), so every
  * remaining float step (the alpha expression, the z_fix long→double
  * conversion when z_fix > 2^53, the final divide) is a single
  * correctly-rounded IEEE operation any engine performs identically —
  * nothing depends on association order or fused ops. The small-range
  * linear-counting branch (raw ≤ 2.5m with empty registers → m·ln(m/V))
  * is the one libm-dependent value; gates round it to 4 decimals.
  *
  * Buffer: m = 2^p bytes (rho ≤ 61−p ≤ 57 fits a byte); update is two
  * shifts + a byte max, merge is elementwise max, serialization is the
  * raw register array — the partial→final exchange cost is m bytes per
  * group at ANY cardinality. */
case class HllSketch(child: Expression, p: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 16, s"HLL needs 4 <= p <= 16, got $p")

  private def m: Int = 1 << p
  private def wBits: Int = 60 - p
  private def maxRho: Int = wBits + 1

  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(LongType)

  override def prettyName: String = "hll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = HllSketch.resultType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // the contract is a 60-bit hash; mask so a caller feeding a full
      // 64-bit (possibly negative) hash through the SQL surface still
      // sketches its low 60 bits instead of silently dropping 15/16 of
      // its rows to an impossible rho
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      val bucket = (h & (m - 1)).toInt
      val w = h >>> p
      val rho =
        if (w == 0L) maxRho
        else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > b(bucket)) b(bucket) = rho.toByte
    }
    b
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
    HllSketch.maxInto(x, y, m)

  override def eval(b: Array[Byte]): Any = HllSketch.evalRegisters(b, p)

  override def serialize(b: Array[Byte]): Array[Byte] = b

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllSketch =
    copy(child = c)
}

object HllSketch {
  /** struct(v_zero, z_fix, raw_est, estimate, regs) — `regs` is the raw
    * 2^p-byte register array, the value to PERSIST for sketch cubes
    * (re-aggregate later with [[HllMerge]]). */
  val resultType: StructType = StructType(Seq(
    StructField("v_zero", LongType, nullable = false),
    StructField("z_fix", LongType, nullable = false),
    StructField("raw_est", DoubleType, nullable = false),
    StructField("estimate", DoubleType, nullable = false),
    StructField("regs", BinaryType, nullable = false)))

  /** Elementwise register max (the HLL merge): dst(i) = max(dst, src). */
  private[functions] def maxInto(dst: Array[Byte], src: Array[Byte],
                                 m: Int): Array[Byte] = {
    var i = 0
    while (i < m) { if (src(i) > dst(i)) dst(i) = src(i); i += 1 }
    dst
  }

  /** Bias-correction constant: the Flajolet et al. values for the small
    * register counts, the closed form above m = 64. Oracles mirror the
    * same literal per p (the gates use p = 8 → the closed form). */
  private[functions] def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  private[functions] def evalRegisters(b: Array[Byte], p: Int): Any = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    var zFix = 0L
    var vZero = 0L
    var i = 0
    while (i < m) {
      val r = b(i).toInt
      zFix += 1L << (maxRho - r)
      if (r == 0) vZero += 1L
      i += 1
    }
    val md = m.toDouble
    // power-of-two factors are exact in IEEE doubles, so every rounded
    // step is a single correctly-rounded operation — the DuckDB
    // oracle's literal-for-literal mirror lands on the identical bits
    val raw = alpha(m) * (md * md) * (1L << maxRho).toDouble / zFix
    val est =
      if (vZero > 0L && raw <= 2.5 * md) md * Math.log(md / vZero)
      else raw
    new GenericInternalRow(Array[Any](vZero, zFix, raw, est, b.clone()))
  }

  /** Aggregate column: HLL registers + estimate over a pre-hashed 60-bit
    * column — struct(v_zero, z_fix, raw_est, estimate, regs). Pass
    * [[PortableHash.md5Long60]] of the value so an oracle can replay the
    * identical registers. */
  def hll(hash60: Column, p: Int): Column =
    GraftSqlShim.toColumn(
      HllSketch(GraftSqlShim.toExpression(hash60), p).toAggregateExpression())

  /** Convenience: sketch the distinct count of `value` directly. */
  def hllDistinct(value: Column, p: Int): Column =
    hll(PortableHash.md5Long60(value.cast("string")), p)
}

/** Re-aggregation of PERSISTED HLL register arrays — the sketch-cube
  * pattern: keep one 2^p-byte `regs` value per (dimension, day) cell,
  * answer any roll-up's distinct count by elementwise-max-merging the
  * cells, never rescanning the raw data. Register max is associative,
  * commutative and idempotent, so merge-of-monthly == direct-over-year
  * EXACTLY (gated as q38): a sketch cube loses nothing over the sketch
  * of the union. Input rows are `regs` arrays from [[HllSketch]] (same
  * p); output is the same result struct. */
case class HllMerge(child: Expression, p: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 16, s"HLL needs 4 <= p <= 16, got $p")

  private def m: Int = 1 << p

  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(BinaryType)

  override def prettyName: String = "hll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = HllSketch.resultType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == m,
        s"hll_merge(p=$p) expects ${m}-byte registers, got ${regs.length}")
      // fail fast on a right-length binary that is NOT an HllSketch(p)
      // register array: an out-of-range byte would otherwise reach the
      // eval shift with a negative count and yield silent garbage
      val maxRho = 60 - p + 1
      var i = 0
      while (i < m) {
        val r = regs(i)
        require(r >= 0 && r <= maxRho,
          s"hll_merge(p=$p): register $i = $r outside [0, $maxRho] — " +
            "not an hll_sketch register array of this p")
        if (r > b(i)) b(i) = r
        i += 1
      }
    }
    b
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
    HllSketch.maxInto(x, y, m)

  override def eval(b: Array[Byte]): Any = HllSketch.evalRegisters(b, p)

  override def serialize(b: Array[Byte]): Array[Byte] = b

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllMerge =
    copy(child = c)
}

object HllMerge {
  /** Aggregate column: merge persisted register arrays —
    * struct(v_zero, z_fix, raw_est, estimate, regs). */
  def hllMerge(regs: Column, p: Int): Column =
    GraftSqlShim.toColumn(
      HllMerge(GraftSqlShim.toExpression(regs), p).toAggregateExpression())
}
