package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Space-partitioning (kd-tree-style) vector index build.
  *
  * Semantics reproduce the reference's two builders, which agree on the
  * core rules (SURVEY.md §2.9 R1/R2, §7.4):
  *  - node split: dimension with MAX stdev at even tree levels, MIN stdev
  *    at odd levels (C# `maxBy(max ? Stdev2N : -Stdev2N)` with flag flipped
  *    per level, VectorIndex/IndexBuilder.cs:75-79,128-129; the T-SQL twin
  *    DDL.sql:151 is the same idea with a level-counter quirk — we follow
  *    the C# true alternation). Ties pick the LOWEST dimension index
  *    (C# MaxBy keeps the first maximum).
  *  - split point: mean of that dimension (float32), pivot id =
  *    floor(sum(id)/count) (integer division, IndexBuilder.cs:87).
  *  - assignment: high child ⇔ value > mid ∨ (value = mid ∧ id > pivotId)
  *    (IndexBuilder.cs:113-124 ≡ DDL.sql:160-167).
  *  - node encoding: implicit heap ids — children of r are 2r+1 / 2r+2
  *    (DDL.sql:195-196, IndexBuilder.cs:99-104); leaf ⇔ count==1 with
  *    null dimension/children and ID set; internal nodes with stdev==0
  *    null out dimension/mid (pure id-split nodes, DDL.sql:190-199).
  *
  * Architecture (NOT the reference's): level-synchronous distributed BFS
  * over DataFrames for the top of the tree (each level: one per-(range,dim)
  * aggregation with map-side partial combine, one broadcast join for
  * reassignment — the big point set never shuffles), switching to
  * per-subtree LOCAL in-memory builds via `mapPartitions` once an active
  * range fits comfortably in an executor (`localBuildThreshold`). That
  * hybrid mirrors the lesson of the reference's own history — its parallel
  * BFS was abandoned for a locality-aware sequential walk at 10M vectors
  * (README.md:93-100) — while keeping the top levels distributed so a
  * 100 TB point set is split across the cluster before any single node
  * must hold a subtree.
  *
  * Determinism: all stats in float64; the only cross-run nondeterminism is
  * double-summation order inside Spark aggregates, which can flip a split
  * only on a sub-ulp stdev near-tie — query results (search + re-check)
  * are tree-shape independent, so oracles are stable.
  */
object IndexBuild {

  val indexSchema: StructType = StructType(Seq(
    StructField("rangeId", LongType, nullable = false),
    StructField("dimension", IntegerType, nullable = true),
    StructField("mid", FloatType, nullable = true),
    StructField("lowRangeId", LongType, nullable = true),
    StructField("highRangeId", LongType, nullable = true),
    StructField("id", LongType, nullable = true)))

  /** Max tree depth: rangeId overflows long at 2^62 (DDL child-id
    * arithmetic, F3); C# guards with checked(). */
  val MaxDepth = 62

  /** Build the index for (id, vector) points.
    *
    * @param bucketSize leaves hold up to this many points (1 = reference
    *   parity with singleton leaves; larger buckets bound tree depth at
    *   scale — MemoryVectorIndex.cs:25 uses 10 for its trie).
    * @param localBuildThreshold once an active range has <= this many
    *   points, its whole subtree is built inside one task. 0 disables the
    *   hybrid (pure BFS, mostly for testing the distributed path).
    */
  def buildIndex(points: DataFrame, idCol: String, vecCol: String,
                 bucketSize: Int = 1,
                 localBuildThreshold: Long = 1L << 19): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    // (rangeId, id, vector) — rangeId mutates level by level.
    val prepared = points
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .withColumn("rangeId", lit(0L))

    // Fast path: the whole point set fits one task's budget — build the
    // entire tree in a single local job (no per-level driver loop). This
    // is also what each leaf-subtree of the BFS phase does at scale.
    if (localBuildThreshold > 0) {
      val probe = math.min(localBuildThreshold + 1, Int.MaxValue.toLong - 1).toInt
      val n = prepared.limit(probe).count()
      if (n <= localBuildThreshold)
        return buildLocalSubtrees(
          prepared.select($"rangeId", $"id", $"vector"), 0, bucketSize)
    }

    var assign = prepared.localCheckpoint()

    var level = 0
    var nodeParts = List.empty[DataFrame]
    val emptyNodes = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], indexSchema)

    while (level < MaxDepth && !assign.isEmpty) {
      val useMax = level % 2 == 0

      // Per-range per-dimension stats in ONE pass over whole vectors: the
      // custom Welford/Chan Aggregator (A2) — no posexplode, no d-fold row
      // blow-up; the exchange carries one (4·d doubles) buffer per
      // (range × map task). Split-dimension selection = argmax/argmin of
      // the M2 array via array_position (first match ⇒ lowest-index
      // tie-break, same as C# MaxBy).
      val vs = graft.functions.VecStatsNative.vecStats _
      val picked = if (useMax) array_max($"vs.m2") else array_min($"vs.m2")
      // localCheckpoint: the stats job runs ONCE per level (four downstream
      // plans consume it), and the lineage break lets the previous level's
      // assignment be unpersisted below.
      val rangeStats = assign.groupBy($"rangeId")
        .agg(vs($"id", $"vector").as("vs"))
        .withColumn("pos", array_position($"vs.m2", picked).cast("int"))
        .select($"rangeId",
          ($"pos" - 1).as("dimension"),
          element_at($"vs.mean", $"pos").cast("float").as("mid"),
          element_at($"vs.m2", $"pos").as("variance"),
          element_at($"vs.mn", $"pos").as("minD"),
          element_at($"vs.mx", $"pos").as("maxD"),
          $"vs.cnt".as("cnt"),
          // integral divide (truncation toward zero) — matches the local
          // builder's sumIdL / n and the C# reference's (long)(IdN/Count)
          // (IndexBuilder.cs:87); floor() would disagree for negative id
          // sums and fork the two build paths' tree shapes
          expr("vs.sumId div vs.cnt").as("pivotId"))
        // Degenerate-split guard (SURVEY §7.4): if the float-rounded mid
        // can't strictly separate values (mid outside (min, max)), a
        // value split may leave one child empty and loop; fall back to a
        // pure id split, which always progresses for >= 2 distinct ids.
        // Constant dims (variance 0) are subsumed (min == mid == max).
        .withColumn("degenerate",
          $"mid".cast("double") >= $"maxD" || $"mid".cast("double") <= $"minD")
        .localCheckpoint()

      val isLeafRange = $"cnt" <= bucketSize
      val atCap = level == MaxDepth - 1

      // Emit nodes for every active range this level.
      val internal = rangeStats.filter(!isLeafRange && !lit(atCap))
        .filter($"cnt" > lit(localBuildThreshold).cast("long") || lit(localBuildThreshold == 0))
        .select($"rangeId",
          when($"degenerate", lit(null)).otherwise($"dimension").cast("integer").as("dimension"),
          when($"degenerate", lit(null)).otherwise($"mid").cast("float").as("mid"),
          ($"rangeId" * 2 + 1).as("lowRangeId"),
          ($"rangeId" * 2 + 2).as("highRangeId"),
          lit(null).cast("long").as("id"))

      // Leaves: one row per point (singleton leaf when bucketSize=1 —
      // exact reference shape; bucket leaves share a rangeId).
      val leafRanges = rangeStats.filter(isLeafRange || lit(atCap))
        .select($"rangeId".as("leafRangeId"))
      val leaves = assign.join(broadcast(leafRanges),
          $"rangeId" === $"leafRangeId")
        .select($"rangeId",
          lit(null).cast("integer").as("dimension"),
          lit(null).cast("float").as("mid"),
          lit(null).cast("long").as("lowRangeId"),
          lit(null).cast("long").as("highRangeId"),
          $"id")

      // Ranges small enough for the local path: build whole subtrees
      // inside tasks, co-locating each range's points via a hash
      // repartition on rangeId.
      val localRanges = rangeStats
        .filter(!isLeafRange && !lit(atCap) &&
          $"cnt" <= lit(localBuildThreshold).cast("long") && lit(localBuildThreshold > 0))
        .select($"rangeId".as("localRangeId"))
      val localNodes: DataFrame =
        if (localBuildThreshold > 0) {
          val localPts = assign.join(broadcast(localRanges),
            $"rangeId" === $"localRangeId")
          buildLocalSubtrees(localPts.select($"rangeId", $"id", $"vector"),
            level, bucketSize)
        } else emptyNodes

      // Materialize this level's node rows now so the previous assignment
      // can be dropped (otherwise every level's 10M-row checkpoint stays
      // pinned in storage memory until the final union).
      val levelNodes = internal.unionAll(leaves).unionAll(localNodes)
        .localCheckpoint()
      nodeParts = levelNodes :: nodeParts

      // Split ranges that stay distributed.
      val splits = rangeStats
        .filter(!isLeafRange && !lit(atCap) &&
          ($"cnt" > lit(localBuildThreshold).cast("long") || lit(localBuildThreshold == 0)))
        .select($"rangeId".as("splitRangeId"), $"dimension".as("splitDim"),
          $"mid".as("splitMid"), $"pivotId", $"degenerate")

      val nextAssign = assign.join(broadcast(splits),
          $"rangeId" === $"splitRangeId")
        .withColumn("v", element_at($"vector", $"splitDim" + 1))
        .withColumn("rangeId",
          $"rangeId" * 2 + when(
            when($"degenerate", $"id" > $"pivotId")
              .otherwise($"v" > $"splitMid" ||
                ($"v" === $"splitMid" && $"id" > $"pivotId")),
            2L).otherwise(1L))
        .select($"rangeId", $"id", $"vector")
        .localCheckpoint()

      // levelNodes + nextAssign are materialized with truncated lineage —
      // the old assignment's blocks are no longer reachable.
      freeCheckpoint(assign)
      freeCheckpoint(rangeStats)
      assign = nextAssign
      level += 1
    }

    nodeParts.reverse.reduceOption(_ unionAll _).getOrElse(emptyNodes)
  }

  /** Per-document index build — the reference's data model is one tree
    * PER document (DDL.sql:209-227 keys the index by (DocID, RangeID);
    * dbo.IndexDocument builds one doc at a time, DDL.sql:352-419).
    *
    * Spark-first formulation: all documents build IN PARALLEL — points
    * hash-partition by document, each task builds its documents' trees
    * with the sequential walker. Scale posture: parallelism across docs
    * (the common case: many medium collections); a single out-sized doc
    * should use `buildIndex` (distributed BFS + hybrid) on its own
    * points. Output: (docId, rangeId, dimension, mid, lowRangeId,
    * highRangeId, id). */
  def buildIndexPerDoc(points: DataFrame, docCol: String, idCol: String,
                       vecCol: String, bucketSize: Int = 1): DataFrame = {
    val spark = points.sparkSession
    val rows = points
      .select(col(docCol).cast("long").as("docId"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .repartition(col("docId"))
      .queryExecution.toRdd.mapPartitions { iter =>
        val groups = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[(Long, Array[Float])]]
        iter.foreach { r =>
          val docId = r.getLong(0)
          groups.getOrElseUpdate(docId, mutable.ArrayBuffer.empty) +=
            ((r.getLong(1), r.getArray(2).toFloatArray()))
        }
        groups.iterator.flatMap { case (docId, pts) =>
          buildSubtree(0L, 0, pts.toArray, bucketSize).map(t => (docId, t))
        }
        // (per-doc groups stay mapped; docs are assumed task-sized —
        // out-sized single docs go through buildIndex instead)
      }
    val schema = StructType(
      StructField("docId", LongType, nullable = false) +: indexSchema.fields.toSeq)
    spark.createDataFrame(rows.map { case (docId, (rangeId, dim, mid, lo, hi, id)) =>
      Row(docId, rangeId,
        if (dim < 0) null else Int.box(dim),
        if (dim < 0) null else Float.box(mid),
        if (lo < 0) null else Long.box(lo),
        if (hi < 0) null else Long.box(hi),
        if (id < 0) null else Long.box(id))
    }, schema)
  }

  // ---------------------------------------------------------------------
  // Local (in-task) sequential subtree build — the reference's DFS walker
  // (IndexBuilder.cs:31-157) re-expressed over in-memory partitions.
  // ---------------------------------------------------------------------

  /** Release the storage blocks behind a localCheckpoint'ed DataFrame —
    * `Dataset.unpersist` only touches CacheManager entries, not the
    * checkpoint's underlying RDD. */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Depth of a rangeId in the implicit heap (root 0 → depth 0):
    * floor(log2(rangeId + 1)) — F5, IndexBuilder.cs:43-45. */
  private[graft] def depthOf(rangeId: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(rangeId + 1)

  /** points: (rangeId, id, vector) co-located by rangeId; every rangeId
    * group becomes an independently-built subtree whose root is that
    * range, at the max/min alternation parity of its own depth. */
  private[graft] def buildLocalSubtreesAtDepth(points: DataFrame,
                                               bucketSize: Int): DataFrame =
    buildLocalSubtrees(points, -1, bucketSize)

  /** Same, with `level` fixed for all ranges (BFS path: all active ranges
    * share a level); level = -1 derives it per range from the rangeId.
    *
    * Memory: rows arrive SORTED by rangeId within each partition, so only
    * ONE range's points are buffered at a time — co-partitioned ranges
    * (several per task when active ranges > shuffle partitions) don't
    * stack up in the heap together. */
  private[graft] def buildLocalSubtrees(points: DataFrame, level: Int,
                                        bucketSize: Int): DataFrame = {
    val spark = points.sparkSession
    val rows = points
      .repartition(col("rangeId"))
      .sortWithinPartitions(col("rangeId"))
      .queryExecution.toRdd.mapPartitions { iter =>
        // InternalRow → (rangeId, id, Array[Float]); stream one sorted
        // rangeId group at a time.
        new Iterator[(Long, Int, Float, Long, Long, Long)] {
          private var nextRow: Option[(Long, Long, Array[Float])] = fetch()
          private var current: Iterator[(Long, Int, Float, Long, Long, Long)] =
            Iterator.empty

          private def fetch(): Option[(Long, Long, Array[Float])] =
            if (iter.hasNext) {
              val r = iter.next()
              Some((r.getLong(0), r.getLong(1), r.getArray(2).toFloatArray()))
            } else None

          private def advance(): Unit = {
            while (!current.hasNext && nextRow.isDefined) {
              val rangeId = nextRow.get._1
              val idsB = mutable.ArrayBuilder.make[Long]
              val vecsB = mutable.ArrayBuilder.make[Array[Float]]
              while (nextRow.exists(_._1 == rangeId)) {
                idsB += nextRow.get._2
                vecsB += nextRow.get._3
                nextRow = fetch()
              }
              val lvl = if (level >= 0) level else depthOf(rangeId)
              current = IndexBuildLocal.buildSubtree(rangeId, lvl,
                idsB.result(), vecsB.result(), bucketSize)
            }
          }

          override def hasNext: Boolean = { advance(); current.hasNext }
          override def next(): (Long, Int, Float, Long, Long, Long) = {
            advance(); current.next()
          }
        }
      }
    spark.createDataFrame(rows.map { case (rangeId, dim, mid, lo, hi, id) =>
      Row(rangeId,
        if (dim < 0) null else Int.box(dim),
        if (dim < 0) null else Float.box(mid),
        if (lo < 0) null else Long.box(lo),
        if (hi < 0) null else Long.box(hi),
        if (id < 0) null else Long.box(id))
    }, indexSchema)
  }

  /** Sequential build of one subtree; tuple-array adapter over the
    * optimized IndexBuildLocal.buildSubtree (parallel arrays, reused
    * scratch buffers — see that file for the rules + engineering). */
  private[graft] def buildSubtree(rootRangeId: Long, rootLevel: Int,
      pts: Array[(Long, Array[Float])], bucketSize: Int)
      : Iterator[(Long, Int, Float, Long, Long, Long)] = {
    val ids = new Array[Long](pts.length)
    val vecs = new Array[Array[Float]](pts.length)
    var j = 0
    while (j < pts.length) {
      ids(j) = pts(j)._1
      vecs(j) = pts(j)._2
      j += 1
    }
    IndexBuildLocal.buildSubtree(rootRangeId, rootLevel, ids, vecs, bucketSize)
  }
}
