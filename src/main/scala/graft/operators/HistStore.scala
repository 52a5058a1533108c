package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Atomic-ish store replacement shared by the sketch-store compactors:
  * the new layout is fully written to a scratch dir first, then swapped
  * in with two filesystem renames — a reader opened before the swap
  * keeps its listing; one opened after sees only the new layout. Uses
  * the Hadoop FileSystem of the path, so it works on any supported
  * scheme, not just local disk. */
private[operators] object StoreSwap {
  def replace(spark: SparkSession, tmp: String, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val fs = dst.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(dst, old), s"compact: could not retire $dst")
    require(fs.rename(src, dst), s"compact: could not install $src")
    fs.delete(old, true)
  }
}

/** Persistent HISTOGRAM-CELL QUANTILE STORE — the quantile member of
  * the sketch-store family ([[SketchStore]] serves distinct counts from
  * per-day HLL cells; this serves quantiles from per-month fixed-edge
  * histogram cells, the persisted form of the q48 inline roll-up).
  * Edges are pinned at build time (bins equal-width over the build
  * extent, stored in a meta sidecar), so cells from ANY month merge by
  * plain count ADDITION and a range probe answers approximate quantiles
  * with error ≤ one bin width — the raw table is scanned once per
  * ingest batch and never at probe time.
  *
  * Contract difference from the HLL store, stated loudly: counts ADD,
  * they don't max. Appending a batch twice double-counts it — the
  * HLL store's register-max heals duplicate ingest, this one requires
  * exactly-once batches (the usual ledger discipline for additive
  * aggregates). Late batches for old months are still just appends.
  *
  * At 100 TB: ingest is one map-side-combined count aggregation to at
  * most months × bins rows; the store is months × bins rows regardless
  * of fact volume; a range probe prunes to the window's month
  * partitions (spec-asserted) and runs a bins-bounded cumulative
  * window — never a rescan, never a global sort. */
object HistStore {

  /** Cell rows of `df` under frozen edges: (month yyyy-MM, bin, n).
    * Out-of-extent values (possible on append — edges are pinned at
    * build) clamp into the edge bins, preserving total count and rank
    * arithmetic; width 0 (degenerate all-equal build) puts everything
    * in bin 0. */
  private def cellsOf(df: DataFrame, dateCol: String, valueCol: String,
                      lo: Double, width: Double, bins: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    val bin =
      if (width == 0d) lit(0L)
      else greatest(lit(0L),
        least(floor((v - lit(lo)) / lit(width)), lit(bins - 1L)))
        .cast("long")
    // DateType group key (trunc-to-month), string rendered per result
    // row — the count agg is codegen'd so this is less critical than
    // the sketch stores' interpreted path, but formatting a timestamp
    // per row still costs more than int month-truncation
    df.filter(v.isNotNull)
      .select(trunc(col(dateCol), "month").as("m"), bin.as("bin"))
      .groupBy(col("m"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("m"), "yyyy-MM").as("month"), col("bin"),
        col("n"))
  }

  /** Build the store at `path`: month-partitioned cells plus a meta
    * sidecar pinning (lo, hi, bins) — the shared edges every later
    * append and probe must use. */
  def write(df: DataFrame, dateCol: String, valueCol: String, bins: Int,
            path: String): Unit = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val ext = df.agg(min(col(valueCol).cast("double")),
      max(col(valueCol).cast("double")), count(col(valueCol))).head()
    require(ext.getLong(2) > 0L, "histogram store build needs at least one value")
    val (lo, hi) = (ext.getDouble(0), ext.getDouble(1))
    cellsOf(df, dateCol, valueCol, lo, (hi - lo) / bins, bins)
      .repartition(col("month"))
      .write.mode("overwrite").partitionBy("month").parquet(path)
    Seq((lo, hi, bins)).toDF("lo", "hi", "bins").coalesce(1)
      .write.mode("overwrite").parquet(path + ".meta")
  }

  /** Append a batch's cells under the FROZEN build edges: touched month
    * partitions gain files, nothing is rewritten. Exactly-once batches
    * required (see object doc — counts add, duplicates double-count). */
  def append(df: DataFrame, dateCol: String, valueCol: String,
             path: String): Unit = {
    val spark = df.sparkSession
    val (lo, hi, bins) = readMeta(spark, path)
    cellsOf(df, dateCol, valueCol, lo, (hi - lo) / bins, bins)
      .repartition(col("month"))
      .write.mode("append").partitionBy("month").parquet(path)
  }

  private def readMeta(spark: SparkSession, path: String): (Double, Double, Int) = {
    val m = spark.read.parquet(path + ".meta").head()
    (m.getDouble(0), m.getDouble(1), m.getInt(2))
  }

  /** Approximate quantiles of the [from, to] month range (inclusive,
    * yyyy-MM), served from cells only: (p, bucket, cum_n, n_total, est)
    * with est = the chosen bin's upper edge — the discrete "smallest
    * value with ≥ ⌈p·n⌉ values ≤ it" quantile, error ≤ one bin width.
    * The month filter lands in the scan's PartitionFilters; the
    * cumulative window is bounded by the bin count, never the data. */
  def probeRange(spark: SparkSession, path: String, from: String,
                 to: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    val (lo, hi, bins) = readMeta(spark, path)
    val width = (hi - lo) / bins
    import spark.implicits._
    val merged = spark.read.parquet(path)
      .filter(col("month") >= from && col("month") <= to)
      .groupBy(col("bin")).agg(sum(col("n")).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = merged.withColumn("cum", sum(col("n")).over(w))
      .crossJoin(merged.agg(sum(col("n")).as("n_total")))
    ps.toDF("p").crossJoin(cum)
      .filter(col("cum") >= ceil(col("p") * col("n_total")))
      .groupBy(col("p"))
      .agg(min(col("bin")).as("bucket"), max(col("n_total")).as("n_total"))
      .join(cum.select(col("bin").as("bucket"), col("cum").as("cum_n")),
        "bucket")
      .select(col("p"), col("bucket"), col("cum_n"), col("n_total"),
        round(lit(lo) + (col("bucket") + 1) * lit(width), 6).as("est"))
      .orderBy(col("p"))
  }

  /** OPTIMIZE-style maintenance: rewrite each month partition to ONE
    * cell per bin (the count sum of its accumulated append cells).
    * Probe results are unchanged — addition is associative — but a
    * month that took n appends reads back as ≤ bins rows instead of
    * n × bins. Swap-based via [[StoreSwap]]. */
  def compact(spark: SparkSession, path: String): Unit = {
    val tmp = path + ".compacting"
    spark.read.parquet(path)
      .groupBy(col("month"), col("bin"))
      .agg(sum(col("n")).as("n"))
      .repartition(col("month"))
      .write.mode("overwrite").partitionBy("month").parquet(tmp)
    StoreSwap.replace(spark, tmp, path)
  }
}
