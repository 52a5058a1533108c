package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Incremental index maintenance — the batch re-expression of the
  * reference's incremental insert/delete (MemoryVectorIndex.cs:86-228 add,
  * :358-489 remove + consolidation; SURVEY.md §2.9 R4/R5).
  *
  * Design: maintenance is set-oriented (a batch of ids/points at a time):
  *  - remove: anti-join the leaf rows, then prune internal nodes whose
  *    subtree lost every leaf. Ancestor sets are computed CLOSED-FORM via
  *    heap arithmetic (ancestor_k(r) = ((r+1) >> k) - 1), so pruning is
  *    one explode + semi-join — no per-level iteration, no driver loop.
  *  - add: route new points down the tree (broadcast tree walk inside
  *    mapPartitions — one job), then rebuild only the touched leaf
  *    subtrees with the exact build rules. Routing ties (value == mid;
  *    the persisted index drops the id pivot, DDL.sql:197) go LOW, which
  *    preserves search correctness: a low-routed point with v == mid is
  *    always reachable (mid >= v - domain), a high-routed point with
  *    v > mid likewise (mid <= v + domain).
  *
  * Scale: both paths touch O(changed subtrees), never the whole point set;
  * the index relation itself is ~2N tiny rows. The broadcast walk needs
  * the tree on one executor — for indexes beyond that, the same routing
  * runs as the per-level frontier join of IndexSearch (documented, not
  * needed at our scales). */
object IndexMaintain {

  /** All ancestors of `rangeId` including itself: ((r+1) >> k) - 1 for
    * k = 0..62 (negative entries filtered) — closed-form heap walk, no
    * iteration. (SQL expr: the Scala `shiftright` helper only takes a
    * literal shift amount.) */
  private val ancestorsExpr = expr(
    "filter(transform(sequence(0, 62), k -> shiftright(rangeId + 1, k) - 1), a -> a >= 0)")

  /** Batch delete: `ids` is a single-column DataFrame of point ids to
    * remove. Returns the consolidated index. */
  def removePoints(index: DataFrame, ids: DataFrame): DataFrame = {
    val idCol = ids.columns.head
    val leaves = index.filter(col("id").isNotNull)
    val internal = index.filter(col("id").isNull)
    val survivors = leaves.join(ids.select(col(idCol).as("id")),
      Seq("id"), "left_anti")
    val alive = survivors
      .select(explode(ancestorsExpr).as("aliveId"))
      .distinct()
    val keptInternal = internal.join(alive,
      internal("rangeId") === alive("aliveId"), "left_semi")
    keptInternal.unionByName(survivors.select(keptInternal.columns.map(col): _*))
  }

  /** Batch insert: route `newPoints` (idCol, vecCol) through the tree to
    * leaf positions, then rebuild each touched subtree from its combined
    * old + new points. `points` must be the current indexed point set
    * (needed to re-split the touched leaves). */
  def addPoints(index: DataFrame, points: DataFrame, newPoints: DataFrame,
                idCol: String, vecCol: String, bucketSize: Int = 1): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._

    // (rangeId, dim|-1, mid, hasLow, hasHigh) for internal nodes
    val tree: Map[Long, (Int, Float, Boolean, Boolean)] = index
      .filter(col("id").isNull)
      .select("rangeId", "dimension", "mid", "lowRangeId", "highRangeId")
      .collect()
      .map { r =>
        r.getLong(0) -> ((if (r.isNullAt(1)) -1 else r.getInt(1)),
          if (r.isNullAt(2)) 0f else r.getFloat(2),
          !r.isNullAt(3), !r.isNullAt(4))
      }.toMap
    val treeB = spark.sparkContext.broadcast(tree)

    // Route every new point to its destination rangeId (a leaf of the
    // current tree, or an empty child slot).
    val routed = newPoints
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .as[(Long, Array[Float])]
      .map { case (id, vec) =>
        val t = treeB.value
        var r = 0L
        while (t.contains(r)) {
          val (dim, mid, _, _) = t(r)
          val goHigh = dim >= 0 && vec(dim) > mid
          r = r * 2 + (if (goHigh) 2 else 1)
        }
        (r, id, vec)
      }.toDF("rangeId", "id", "vector")

    // Touched destinations + the old points already sitting there.
    val touched = routed.select(col("rangeId").as("leafRangeId")).distinct()
    val oldLeaves = index.filter(col("id").isNotNull)
      .join(broadcast(touched), col("rangeId") === col("leafRangeId"), "left_semi")
    val oldMembers = oldLeaves.select(col("rangeId"), col("id"))
      .join(points.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector")), "id")
      .select(col("rangeId"), col("id"), col("vector"))

    val rebuilt = IndexBuild.buildLocalSubtreesAtDepth(
      oldMembers.unionByName(routed), bucketSize)

    // Untouched rows + rebuilt subtrees.
    val untouched = index.join(broadcast(touched),
      index("rangeId") === touched("leafRangeId"), "left_anti")
    untouched.unionByName(rebuilt)
  }
}
