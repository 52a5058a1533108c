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
    * The default salt is `pmod(hash(key + hashable columns), saltFactor)`
    * — a pure function of the row, NOT `rand`: a task retry after a
    * partition loss re-derives the identical salt, so replays can never
    * route a row to a different reducer mid-job. Map-typed columns are
    * excluded (Spark disallows hash over maps); pass `saltCols` to pick
    * the spreading columns explicitly. When no hashable column besides
    * the key exists, or the hot key's rows are full duplicates
    * (`spreadDuplicates = true`), the salt falls back to the row's
    * partition-local position (`monotonically_increasing_id`): still
    * deterministic under task replay for deterministic lineage — a
    * recomputed partition re-yields rows in the same order — and it
    * spreads even identical rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, saltCols: Seq[String] = Nil,
                 spreadDuplicates: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType   => false
      case a: ArrayType => hashable(a.elementType)
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case _            => true
    }
    val hashCols: Seq[Column] =
      if (saltCols.nonEmpty) (key +: saltCols).distinct.map(col)
      else big.schema.fields.filter(f => hashable(f.dataType))
        .map(f => col(f.name)).toIndexedSeq
    val rowPos = monotonically_increasing_id() // partitionId << 33 | pos
    val saltExpr =
      if (hashCols.size <= 1 || spreadDuplicates) // key-only → no spread
        pmod(hash(rowPos), lit(saltFactor))
      else pmod(hash(hashCols: _*), lit(saltFactor))
    val salted = big.withColumn("_salt", saltExpr)
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
