package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators._
import graft.sources.Ingest

/** Property-based replication of the reference's oracle tests
  * (SURVEY.md §5b): for RANDOM query points and radii, index search must
  * equal the brute-force linear scan exactly; structural invariants must
  * hold for random datasets. (Raw ScalaCheck generators sampled with a
  * fixed seed — the scalatestplus bridge isn't in the offline deps.) */
class IndexPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private lazy val pts = Ingest.randomUniform(spark, 400, 8, seed = 123L)
    .localCheckpoint()
  private lazy val index = IndexBuild.buildIndex(pts, "id", "vector")
    .localCheckpoint()

  private val queryGen: Gen[(Seq[Double], Double)] = for {
    q <- Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0))
    r <- Gen.chooseNum(0.05, 2.5)
  } yield (q.toSeq, r)

  test("property: searchExact == brute force for random queries/radii") {
    samples(queryGen, 8, 2024L).foreach { case (q, r) =>
      val got = IndexSearch.searchExact(index, pts, "id", "vector", q, r)
        .select("id").as[Long].collect().toSet
      val want = BruteForce.rangeSearch(pts, "vector", q, r)
        .select("id").as[Long].collect().toSet
      assert(got == want, s"q=$q r=$r")
    }
  }

  test("property: random datasets index with exactly one leaf per point") {
    val sizeGen = Gen.zip(Gen.chooseNum(1, 200), Gen.chooseNum(1, 12))
    samples(sizeGen, 6, 77L).foreach { case (n, d) =>
      val data = Ingest.randomUniform(spark, n, d, seed = n * 31L + d)
      val idx = IndexBuild.buildIndex(data, "id", "vector")
      val leaves = idx.filter(col("id").isNotNull)
      assert(leaves.count() == n, s"n=$n d=$d")
      assert(leaves.select("id").distinct().count() == n, s"n=$n d=$d")
    }
  }

  test("property: children partition the parent (walk invariant)") {
    val walk = IndexWalk.walk(index).cache()
    val bySelf = walk.select("rangeId", "subtree_leaves")
      .as[(Long, Long)].collect().toMap
    val internals = walk.filter(col("id").isNull && col("lowRangeId").isNotNull)
      .select("rangeId").as[Long].collect()
    internals.foreach { r =>
      val kids = bySelf.getOrElse(2 * r + 1, 0L) + bySelf.getOrElse(2 * r + 2, 0L)
      assert(kids == bySelf(r), s"node $r: children sum $kids != ${bySelf(r)}")
    }
  }
}
