package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) locality clustering — the layout-side lever for
  * multi-dimensional data skipping at 100 TB: interleave the bits of
  * quantized column ranks so that range-partitioning by ONE value keeps
  * rows close in EVERY clustered dimension, shrinking per-file min/max
  * spans so parquet row-group/file skipping prunes scans for filters on
  * any of the dimensions (the technique behind Delta/Iceberg Z-ORDER —
  * public; no reference counterpart).
  *
  * The z-value is a pure, deterministic projection: per-dim
  * quantization against a fixed [lo, hi) extent (floor((v−lo)/(hi−lo)
  * · 2^bits), clamped), then static bit interleaving — every shift
  * amount is a literal, so the whole expression stays inside
  * whole-stage codegen and a DuckDB oracle replays it exactly. */
object Locality {

  /** Morton z-value of `cols` quantized to `bits` each against the
    * given extents ((lo, hi) per column). k·bits must fit a long
    * (≤ 62). Values outside the extent clamp to the edge buckets. */
  def zValue(cols: Seq[Column], extents: Seq[(Double, Double)],
             bits: Int): Column = {
    require(cols.nonEmpty && cols.length == extents.length,
      "one (lo, hi) extent per column")
    val k = cols.length
    require(k * bits <= 62, s"$k cols x $bits bits exceeds a long")
    val quantized = cols.zip(extents).map { case (c, (lo, hi)) =>
      require(hi > lo, s"degenerate extent [$lo, $hi)")
      val q = floor((c.cast("double") - lit(lo)) / lit(hi - lo) *
        lit((1L << bits).toDouble)).cast("long")
      least(greatest(q, lit(0L)), lit((1L << bits) - 1L))
    }
    val parts = for {
      (q, i) <- quantized.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * k + i)
    parts.reduce(_ + _)
  }

  /** Cluster `df` for locality: range-partition by the z-value into
    * `numPartitions` and sort within each — the write-side layout step
    * (follow with `.write.parquet`; each output file then covers a
    * small rectangle of the clustered dimensions instead of a full-span
    * slice). */
  def clusterByZ(df: DataFrame, cols: Seq[Column],
                 extents: Seq[(Double, Double)], bits: Int,
                 numPartitions: Int): DataFrame = {
    val z = zValue(cols, extents, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
