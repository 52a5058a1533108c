package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index introspection — the reference's hierarchy walk
  * (MemoryVectorIndex.cs:491-574 enumerates (index, parent, center,
  * records); SURVEY.md R6). Set-oriented: depth and parent come from heap
  * arithmetic on rangeId; per-node subtree leaf counts come from ONE
  * explode of each leaf's closed-form ancestor chain — no recursion, no
  * driver loop, O(leaves × depth) rows through a single aggregation. */
object IndexWalk {

  private val ancestorsOfRange = expr(
    "filter(transform(sequence(0, 62), k -> shiftright(rangeId + 1, k) - 1), a -> a >= 0)")

  /** Node metadata: depth, parentId (null for root). Depth = bit length
    * of (rangeId+1) minus 1 — exact integer arithmetic (a double log2
    * misrounds near powers of two past 2^53), matching
    * IndexBuild.depthOf. */
  def nodes(index: DataFrame): DataFrame =
    index
      .withColumn("depth",
        (length(conv(col("rangeId") + 1, 10, 2)) - 1).cast("int"))
      .withColumn("parentId",
        when(col("rangeId") === 0, lit(null).cast("long"))
          .otherwise(expr("(rangeId - 1) div 2")))

  /** Per-node subtree leaf counts (the walk's `records`). */
  def subtreeLeafCounts(index: DataFrame): DataFrame =
    index.filter(col("id").isNotNull)
      .select(explode(ancestorsOfRange).as("rangeId"))
      .groupBy(col("rangeId"))
      .agg(count(lit(1)).as("subtree_leaves"))

  /** Full walk: every node with depth, parent and subtree size. */
  def walk(index: DataFrame): DataFrame =
    nodes(index).join(subtreeLeafCounts(index), Seq("rangeId"), "left")
      .withColumn("subtree_leaves", coalesce(col("subtree_leaves"), lit(0L)))

  /** Tree-shape summary: per depth, node/leaf counts — the index-quality
    * observability the reference prints in its tests. */
  def depthProfile(index: DataFrame): DataFrame =
    nodes(index)
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_nodes"),
        count(col("id")).as("n_leaf_rows"))
      .orderBy(col("depth"))
}
