package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.ShiftLeft
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Engine-portable Bloom filter for broadcast PRE-FILTERING — the
  * classic 100-TB shuffle-avoidance pattern: build a small bitset from
  * the join keys of the SMALL side, ship it to every task as a literal,
  * and drop most non-matching big-side rows AT THE SCAN, before they
  * ever reach the join's exchange. Spark's runtime bloom pushdown
  * (`spark.sql.optimizer.runtime.bloomFilter`) covers some plans
  * automatically; an explicit, deterministic filter composes with any
  * operator (anti-join decontamination, allow-list probes, incremental
  * maintenance) and — unlike any engine's built-in — is REPRODUCIBLE
  * across engines: positions come from the same md5 uniforms the rest
  * of the library uses, so a DuckDB oracle rebuilds the identical
  * bitset and the identical pass/fail verdict for every row.
  *
  * Words pack 63 bits, not 64: DuckDB's checked BIGINT `<<` rejects
  * `1 << 63` (the sign bit), so the portable construction never
  * touches it — one bit of space for cross-engine exactness.
  *
  * One-sided error: `mightContain` never rejects a true member; false
  * positives are bounded by ≈ (1 − e^(−k·n/m))^k and are themselves
  * deterministic (a fixed SET of values, not a rate). */
object Bloom {

  private val BitsPerWord = 63

  /** The k bit positions of value `v` in [0, mBits): position_i =
    * floor(md5Uniform(v || "_b" || i) · mBits). */
  def bitPositions(v: Column, k: Int, mBits: Int): Seq[Column] =
    (0 until k).map { i =>
      floor(PortableHash.md5Uniform(
        concat(v.cast("string"), lit(s"_b$i"))) * mBits).cast("int")
    }

  /** `1L << (pos % 63)` with a COLUMN shift amount (the functions-API
    * shiftleft only accepts a literal count). */
  private def bitMask(pos: Column): Column =
    GraftSqlShim.toColumn(ShiftLeft(
      GraftSqlShim.toExpression(lit(1L)),
      GraftSqlShim.toExpression(pmod(pos, lit(BitsPerWord)).cast("int"))))

  /** Build the bitset from the distinct values of `valueCol`: one
    * map-side-combined `bit_or` aggregation keyed by word index, then a
    * BOUNDED driver collect of ceil(mBits/63) longs (~2 KiB at 16k
    * bits — the broadcast-literal budget, independent of corpus size). */
  def build(df: DataFrame, valueCol: String, k: Int, mBits: Int): Array[Long] = {
    val words = df.select(col(valueCol)).distinct()
      .select(explode(array(bitPositions(col(valueCol), k, mBits): _*))
        .as("pos"))
      .select((col("pos") / BitsPerWord).cast("int").as("word"),
        bitMask(col("pos")).as("bit"))
      .groupBy(col("word")).agg(bit_or(col("bit")).as("mask"))
      .collect()
    val arr = new Array[Long]((mBits + BitsPerWord - 1) / BitsPerWord)
    words.foreach(r => arr(r.getAs[Int]("word")) = r.getAs[Long]("mask"))
    arr
  }

  /** [[build]] with mBits SIZED FROM THE KEY COUNT — the production
    * default. A fixed mBits silently saturates when the small side
    * grows (the round-13 sf1 run: 16384 bits over 150k keys → every
    * probe passes, a faithful but useless pre-filter); ~10 bits/key at
    * k = 3 holds FPR ≈ 1.7% at any n. Costs one distinct-count of the
    * small side (which build's distinct pays anyway). The bitset is a
    * broadcast literal, so n is require-bounded to keep it ≤ ~32 MiB —
    * past that the "small side" isn't small and a shuffle join beats a
    * Bloom broadcast. Returns (words, mBits) — probes need the exact
    * mBits the build used. */
  def buildSized(df: DataFrame, valueCol: String, k: Int,
                 bitsPerKey: Int = 10): (Array[Long], Int) = {
    val n = df.select(col(valueCol)).distinct().count()
    val raw = math.max(BitsPerWord.toLong, n * bitsPerKey)
    require(raw <= (1L << 28),
      s"bloom small side too large ($n keys x $bitsPerKey bits): " +
        "past ~32 MiB the broadcast-literal pattern loses to a shuffle join")
    // round up to whole words so every word index is reachable
    val mBits = ((raw + BitsPerWord - 1) / BitsPerWord * BitsPerWord).toInt
    (build(df, valueCol, k, mBits), mBits)
  }

  /** Membership test against a built bitset — a pure codegen projection
    * (k md5s + k literal-array word lookups), no join, no shuffle: the
    * shape that runs at scan speed on the 100-TB side. `mBits` must
    * match the build call. */
  def mightContain(v: Column, words: Array[Long], k: Int, mBits: Int): Column = {
    val w = typedLit(words.toSeq)
    bitPositions(v, k, mBits).map { pos =>
      element_at(w, (pos / BitsPerWord).cast("int") + 1)
        .bitwiseAND(bitMask(pos)) =!= 0L
    }.reduce(_ && _)
  }
}
