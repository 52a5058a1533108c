package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Brute-force (exact, linear-scan) vector search — the reference's own
  * correctness oracle (MempryVectorIndex.Tests/MemoryVectorIndexTests.cs:161-163)
  * and the fallback access path when the search radius covers the whole tree
  * (SURVEY.md §7.4).
  *
  * Scale notes: a linear scan is embarrassingly parallel — one pass over the
  * parquet partitions, no shuffle for the filter form; top-k uses Spark's
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows, no
  * full sort). The batch form broadcasts the (small) query set so the big
  * side never shuffles.
  */
object BruteForce {

  /** All points with euclidean dist(vec, q) <= radius (exact semantics;
    * the predicate runs inside whole-stage codegen — no UDF). */
  def rangeSearch(points: DataFrame, vecCol: String, q: Seq[Double], radius: Double): DataFrame =
    points.filter(dist(col(vecCol), doubleVec(q)) <= radius)

  /** Top-k nearest neighbours of one query vector. Deterministic: ties on
    * distance are broken by the id column. Executes as a per-partition
    * top-k (TakeOrderedAndProject), not a global sort. */
  def knn(points: DataFrame, vecCol: String, idCol: String, q: Seq[Double], k: Int): DataFrame =
    points
      .withColumn("dist", dist(col(vecCol), doubleVec(q)))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** Batch kNN: for every query row, the k nearest points. The query side
    * is broadcast (small dim table pattern) → BroadcastNestedLoopJoin; the
    * points side is never shuffled; ranking happens per queryId partition.
    *
    * queries must have (queryIdCol, queryVecCol). */
  def knnJoin(points: DataFrame, vecCol: String, idCol: String,
              queries: DataFrame, queryIdCol: String, queryVecCol: String,
              k: Int): DataFrame = {
    val joined = points.crossJoin(broadcast(queries))
      .withColumn("dist", dist(col(vecCol), col(queryVecCol)))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop(queryVecCol)
  }

  /** Similarity (distance) join: all pairs (a, b) with dist <= radius.
    * Small right side should be broadcast by the caller or AQE. */
  def distanceJoin(left: DataFrame, leftVec: String,
                   right: DataFrame, rightVec: String,
                   radius: Double): DataFrame =
    left.crossJoin(right)
      .filter(dist(col(leftVec), col(rightVec)) <= radius)
}
