package graft

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Ingest

/** The reference's own test strategy (SURVEY.md §5): every index search
  * must equal a brute-force linear scan exactly — zero false positives,
  * zero false negatives (MemoryVectorIndexTests.cs:161-204) — over the
  * grid fixtures, adversarial sets, and degenerate cases. */
class IndexSpec extends SparkSpec {
  import spark.implicits._

  private def searchIds(index: DataFrame, pts: DataFrame, q: Seq[Double], r: Double): Set[Long] =
    IndexSearch.searchExact(index, pts, "id", "vector", q, r)
      .select("id").as[Long].collect().toSet

  private def bruteIds(pts: DataFrame, q: Seq[Double], r: Double): Set[Long] =
    BruteForce.rangeSearch(pts, "vector", q, r)
      .select("id").as[Long].collect().toSet

  private def checkOracle(pts: DataFrame, queries: Seq[(Seq[Double], Double)],
                          bucketSize: Int = 1): Unit = {
    val index = IndexBuild.buildIndex(pts, "id", "vector", bucketSize = bucketSize)
    val n = pts.count()
    val leaves = index.filter(col("id").isNotNull)
    assert(leaves.count() == n, "every point lands in a leaf")
    assert(leaves.select("id").distinct().count() == n, "exactly one leaf per point")
    queries.foreach { case (q, r) =>
      assert(searchIds(index, pts, q, r) == bruteIds(pts, q, r),
        s"index search == linear scan for q=$q r=$r")
    }
  }

  test("grid 3x3 (reference fixture, query [0.5,0.9] r=0.6)") {
    val g = spark.range(3).selectExpr("id as i").crossJoin(spark.range(3).selectExpr("id as j"))
      .select((col("i") * 3 + col("j")).as("id"),
        array((col("i") - 1).cast("float"), (col("j") - 1).cast("float")).as("vector"))
    checkOracle(g, Seq(Seq(0.5, 0.9) -> 0.6))
  }

  test("grid 10x10 (reference fixture, query [0.3,0.3] r=0.3)") {
    checkOracle(Ingest.grid(spark, 10), Seq(Seq(0.3, 0.3) -> 0.3))
  }

  test("grid 100x100 with several queries") {
    checkOracle(Ingest.grid(spark, 100),
      Seq(Seq(0.3, 0.3) -> 0.1, Seq(-0.7, 0.9) -> 0.25, Seq(0.0, 0.0) -> 0.01))
  }

  test("unnormalized grid (bad distribution path)") {
    val g = spark.range(10).selectExpr("id as i").crossJoin(spark.range(10).selectExpr("id as j"))
      .select((col("i") * 10 + col("j")).as("id"),
        array((col("i") - 1).cast("float"), (col("j") - 1).cast("float")).as("vector"))
    checkOracle(g, Seq(Seq(0.3, 0.3) -> 0.3, Seq(4.0, 4.0) -> 2.0))
  }

  test("one-hot adversarial set (near-zero stdev everywhere)") {
    val oh = Ingest.oneHot(spark, 32)
    checkOracle(oh, Seq(
      (0 until 32).map(i => if (i == 3) 1.0 else 0.0) -> 0.5,
      (0 until 32).map(_ => 0.0) -> 1.1))
  }

  test("random uniform 64-dim (reference bench shape, scaled down)") {
    val r = Ingest.randomUniform(spark, 500, 16, seed = 7L)
    val q = Seq.fill(16)(0.1)
    checkOracle(r, Seq(q -> 1.0, q -> 2.0))
  }

  test("degenerate: all-identical vectors split purely by id") {
    val pts = spark.range(20).select(col("id"),
      array(lit(0.5f), lit(0.5f), lit(0.5f)).as("vector"))
    checkOracle(pts, Seq(Seq(0.5, 0.5, 0.5) -> 0.1, Seq(0.0, 0.0, 0.0) -> 0.1))
  }

  test("degenerate: duplicate vectors with distinct ids get distinct leaves") {
    val pts = spark.range(8).select(col("id"),
      array((col("id") % 2).cast("float"), lit(1f)).as("vector"))
    checkOracle(pts, Seq(Seq(0.0, 1.0) -> 0.5))
  }

  test("degenerate: single point and empty input") {
    val single = spark.range(1).select(col("id"), array(lit(1f), lit(2f)).as("vector"))
    val idx1 = IndexBuild.buildIndex(single, "id", "vector")
    val rows = idx1.collect()
    assert(rows.length == 1 && !rows(0).isNullAt(5) && rows(0).getLong(5) == 0L)

    val empty = spark.range(0).select(col("id"), array(lit(1f)).as("vector"))
    assert(IndexBuild.buildIndex(empty, "id", "vector").count() == 0)
  }

  test("bucketSize > 1 bounds leaves and stays exact") {
    val g = Ingest.grid(spark, 30)
    val index = IndexBuild.buildIndex(g, "id", "vector", bucketSize = 10)
    val leaves = index.filter(col("id").isNotNull)
    assert(leaves.count() == 900)
    val perLeaf = leaves.groupBy("rangeId").count().agg(max("count")).head().getLong(0)
    assert(perLeaf <= 10)
    assert(searchIds(index, g, Seq(0.3, 0.3), 0.2) == bruteIds(g, Seq(0.3, 0.3), 0.2))
  }

  test("pure BFS path (localBuildThreshold=0) matches oracle too") {
    val g = Ingest.grid(spark, 10)
    val index = IndexBuild.buildIndex(g, "id", "vector", localBuildThreshold = 0)
    assert(index.filter(col("id").isNotNull).count() == 100)
    assert(searchIds(index, g, Seq(0.3, 0.3), 0.3) == bruteIds(g, Seq(0.3, 0.3), 0.3))
  }

  test("distributed frontier search equals local walk") {
    val g = Ingest.grid(spark, 30)
    val index = IndexBuild.buildIndex(g, "id", "vector")
    val local = IndexSearch.searchBoxLocal(index, Seq(0.2, -0.4), 0.15)
      .as[Long].collect().toSet
    val dist = IndexSearch.searchBoxDistributed(index, Seq(0.2, -0.4), 0.15)
      .select("id").as[Long].collect().toSet
    assert(local == dist)
  }

  test("maintenance: remove then search equals brute force on survivors") {
    val g = Ingest.grid(spark, 20)
    val index = IndexBuild.buildIndex(g, "id", "vector")
    val removed = IndexMaintain.removePoints(index,
      g.filter(col("id") % 3 === 0).select("id"))
    val kept = g.filter(col("id") % 3 =!= 0)
    assert(searchIds(removed, g, Seq(0.1, 0.1), 0.3) == bruteIds(kept, Seq(0.1, 0.1), 0.3))
    // pruning kept the index minimal: no internal node without leaves below
    val emptyIdx = IndexMaintain.removePoints(index, g.select("id"))
    assert(emptyIdx.count() == 0)
  }

  test("maintenance: add then search equals brute force on the union") {
    val g = Ingest.grid(spark, 20)
    val base = g.filter(col("id") % 4 =!= 0)
    val adds = g.filter(col("id") % 4 === 0)
    val index = IndexBuild.buildIndex(base, "id", "vector")
    val grown = IndexMaintain.addPoints(index, base, adds, "id", "vector")
    assert(grown.filter(col("id").isNotNull).count() == 400)
    assert(searchIds(grown, g, Seq(0.1, 0.1), 0.25) == bruteIds(g, Seq(0.1, 0.1), 0.25))
    assert(searchIds(grown, g, Seq(-0.5, 0.7), 0.4) == bruteIds(g, Seq(-0.5, 0.7), 0.4))
  }

  test("maintenance: add into empty-slot children and fresh index") {
    val pts = spark.range(2).select(col("id"), array(col("id").cast("float")).as("vector"))
    val index = IndexBuild.buildIndex(pts, "id", "vector")
    val adds = spark.range(3, 6).select(col("id"), array(col("id").cast("float")).as("vector"))
    val all = pts.unionByName(adds)
    val grown = IndexMaintain.addPoints(index, pts, adds, "id", "vector")
    assert(searchIds(grown, all, Seq(2.0), 3.0) == bruteIds(all, Seq(2.0), 3.0))
  }
}
