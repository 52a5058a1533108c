package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbour classification over an embedding column — the
  * label-propagation primitive of a training-data pipeline: given a
  * small LABELED seed set (human-rated quality tiers, topic tags,
  * license classes), tag the unlabeled mass by majority vote of each
  * item's k nearest labeled neighbours. The classic semi-supervised
  * "fit-free" classifier; at pipeline scale it's how a 10k-doc rated
  * sample becomes a corpus-wide quality column.
  *
  * Composition, not a new kernel: the neighbour relation is any of the
  * existing kNN JOIN paths — brute ([[BruteForce.knnJoin]], the
  * correctness anchor used here) or the persisted ANN stores' batch
  * probes (IVF/IVFADC/IVF-SQ8/binary) when the labeled corpus is big —
  * followed by one (query, label) vote aggregation and a rank-1 window
  * cut. Votes are integers, so the only cross-engine surface is the
  * neighbour cut itself, which inherits the established (dist, id)
  * deterministic tie-break.
  */
object Classify {

  /** Majority-vote kNN classification. `labeled` must carry
    * (idCol, vecCol, labelCol); every query row gets (qid, pred, votes)
    * where `pred` is the most common label among its k nearest labeled
    * rows (vote ties → smallest label). */
  def knnClassify(labeled: DataFrame, idCol: String, vecCol: String,
                  labelCol: String,
                  queries: DataFrame, queryIdCol: String, queryVecCol: String,
                  k: Int): DataFrame = {
    val neigh = BruteForce.knnJoin(
      labeled, vecCol, idCol, queries, queryIdCol, queryVecCol, k)
    val votes = neigh.groupBy(col(queryIdCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("votes").desc, col(labelCol))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(queryIdCol), col(labelCol).as("pred"), col("votes"))
  }
}
