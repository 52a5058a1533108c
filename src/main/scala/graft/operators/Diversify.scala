package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.{dot, norm}

/** Diversified retrieval: Maximal Marginal Relevance (Carbonell &
  * Goldstein, SIGIR 1998) — iteratively pick the candidate maximizing
  * λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s), trading relevance against
  * redundancy with the already-selected set S. The training-data use is
  * "k exemplars that COVER the neighbourhood", where plain top-k returns
  * k near-copies of the same dominant cluster (the seed-selection /
  * few-shot-pool primitive; same family as SemDeDup's "keep one per
  * blob", but query-directed).
  *
  * Shape at scale: the greedy recurrence is inherently sequential in k,
  * so the plan splits into
  *   1. a DISTRIBUTED relevance scan + top-`pool` cut (the only part
  *      that touches the corpus — one codegen'd cosine per row, one
  *      TakeOrdered; at 100 TB this is where the time goes, and it's
  *      embarrassingly parallel — or swap in any ANN store probe for
  *      the scan),
  *   2. a DISTRIBUTED pool×pool cosine self-join (pool is a bounded
  *      constant, ≤ a few hundred — broadcast both sides, pool² tiny),
  *   3. an O(pool·k) greedy on the COLLECTED pool — bounded driver
  *      work, like the centroid loads every IVF probe does.
  *
  * Determinism contract (the cross-engine gate): relevance and pairwise
  * cosines are snapped to MICRO-UNIT INTEGERS (round(cos·1e6)) inside
  * the plan, and λ is the rational lamNum/lamDen, so the greedy compares
  * pure integers — score = lamNum·rel − (lamDen−lamNum)·maxSim — and no
  * accumulation-order ulp can reorder a pick. Ties break to the lower
  * id. The DuckDB oracle replays the same integers through a recursive
  * CTE. */
object Diversify {

  /** MMR top-`k` from the `pool` most relevant candidates.
    * Returns (rank, id, score) — score in λ-scaled micro-units;
    * rank 1's score carries no diversity term (S is empty). */
  def mmr(emb: DataFrame, idCol: String, vecCol: String,
          query: Seq[Double], k: Int, pool: Int,
          lamNum: Int = 7, lamDen: Int = 10): DataFrame = {
    val spark = emb.sparkSession
    val q = array(query.map(lit): _*)
    val v = col(vecCol).cast("array<double>")
    // 1. distributed: micro-integer cosine relevance, top-pool cut
    val rel = emb.select(col(idCol).as("id"),
        v.as("v"),
        round(lit(1000000) *
          (dot(v, q) / (norm(v) * norm(q)))).cast("long").as("rel"))
      .orderBy(col("rel").desc, col("id"))
      .limit(pool)
    rel.cache()
    // 2. distributed: pool×pool pairwise micro-integer cosines
    val a = rel.select(col("id").as("a"), col("v").as("va"))
    val b = rel.select(col("id").as("b"), col("v").as("vb"))
    val sims = a.join(broadcast(b), col("a") < col("b"))
      .select(col("a"), col("b"),
        round(lit(1000000) *
          (dot(col("va"), col("vb")) /
            (norm(col("va")) * norm(col("vb"))))).cast("long").as("sim"))
    // 3. bounded driver greedy over pure integers
    val cand = rel.select(col("id"), col("rel")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val simMap = sims.collect()
      .flatMap { r =>
        val (x, y, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
        Seq(((x, y), s), ((y, x), s))
      }.toMap
    rel.unpersist()
    val remaining = scala.collection.mutable.LinkedHashMap(
      cand.toIndexedSeq: _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    while (picked.size < k && remaining.nonEmpty) {
      val best = remaining.iterator.map { case (id, r) =>
        val maxSim =
          if (picked.isEmpty) 0L
          else picked.iterator.map(p => simMap.getOrElse((id, p._2), 0L)).max
        val score = lamNum.toLong * r - (lamDen - lamNum).toLong * maxSim
        (id, score)
      }.minBy { case (id, score) => (-score, id) }
      picked += ((picked.size + 1, best._1, best._2))
      remaining.remove(best._1)
    }
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("score", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        picked.map(p => Row(p._1, p._2, p._3)).toSeq, 1),
      schema).orderBy(col("rank"))
  }
}
