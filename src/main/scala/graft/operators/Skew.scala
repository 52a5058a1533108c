package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling covers sort-merge
  * shuffles automatically; explicit SALTING is for the cases AQE can't
  * re-plan — e.g. a hot key exploding inside a single join bucket at
  * 100 TB. */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a salt in
    * [0, saltFactor); the small side is replicated saltFactor times with
    * every salt value; the join key becomes (key, salt), splitting each
    * hot key across saltFactor reducers. Result is identical to
    * big.join(small, key).
    *
    * The salt is `pmod(hash(all big-side columns), saltFactor)` — a pure
    * function of the row, NOT `rand`: a task retry after a partition loss
    * re-derives the identical salt, so replays can never route a row to a
    * different reducer mid-job. Rows of one hot key still spread because
    * their non-key columns differ (full-row duplicates co-locating is
    * harmless — they'd collide on any content-hash scheme). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation for a hot grouping key: partial agg
    * on (key, salt) then final agg on key. Only needed for aggregates
    * whose partial form Spark can't already map-side combine (Spark's
    * hash aggregate handles sum/count/min/max natively — this is the
    * pattern for e.g. collect-like or UDAF aggregates over hot keys). */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
                          saltFactor: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("_salt"))
      .agg(count_distinct(col(valueCol)).as("_pc"))
      .groupBy(col(key))
      .agg(sum(col("_pc")).as("n_distinct"))
}
