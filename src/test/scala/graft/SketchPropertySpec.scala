package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{CmsMerge, CmsSketch, HllMerge, HllSketch}

/** Property-based pins for the mergeable-sketch algebra the persisted
  * stores (q49/q50/q51/q56) rely on: for RANDOM datasets and RANDOM
  * partitionings into cells, merging cell sketches must equal the
  * sketch of the union bit-for-bit (HLL) or counter-for-counter (CMS),
  * HLL re-merge must be idempotent, CMS estimates must stay one-sided,
  * and the histogram-selection rank bound must hold for random value
  * distributions. (Raw ScalaCheck generators with fixed seeds — the
  * scalatestplus bridge isn't in the offline deps.) */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // random multiset of keys (duplicates likely) + a random cell count
  private val dataGen: Gen[(Seq[Long], Int)] = for {
    n <- Gen.chooseNum(1, 2000)
    keys <- Gen.listOfN(n, Gen.chooseNum(0L, 500L))
    cells <- Gen.chooseNum(1, 7)
  } yield (keys.toSeq, cells)

  test("property: HLL merge-of-random-cells == sketch-of-union, and re-merge is idempotent") {
    samples(dataGen, 6, 7101L).foreach { case (keys, cells) =>
      val df = keys.zipWithIndex
        .map { case (k, i) => (k, i % cells) }.toDF("k", "cell")
        .localCheckpoint()
      val direct = df.agg(HllSketch.hllDistinct(col("k"), 8).as("s"))
        .select(col("s.z_fix"), col("s.estimate"), col("s.regs")).head()
      val cellsDf = df.groupBy(col("cell"))
        .agg(HllSketch.hllDistinct(col("k"), 8).as("s"))
        .select(col("s.regs").as("regs")).localCheckpoint()
      val merged = cellsDf.agg(HllMerge.hllMerge(col("regs"), 8).as("s"))
        .select(col("s.z_fix"), col("s.estimate"), col("s.regs")).head()
      assert(merged == direct, s"cells=$cells n=${keys.size}")
      // idempotence: merging the cells twice changes nothing
      val twice = cellsDf.union(cellsDf)
        .agg(HllMerge.hllMerge(col("regs"), 8).as("s"))
        .select(col("s.z_fix"), col("s.estimate"), col("s.regs")).head()
      assert(twice == direct)
    }
  }

  test("property: CMS merge-of-random-cells == sketch-of-union; estimates one-sided") {
    samples(dataGen, 6, 9313L).foreach { case (keys, cells) =>
      val df = keys.zipWithIndex
        .map { case (k, i) => (k, i % cells) }.toDF("k", "cell")
        .localCheckpoint()
      val direct = df.agg(CmsSketch.cmsFreq(col("k"), 4, 9).as("s"))
        .select(col("s.n_total"), col("s.counters")).head()
      val merged = df.groupBy(col("cell"))
        .agg(CmsSketch.cmsFreq(col("k"), 4, 9).as("s"))
        .agg(CmsMerge.cmsMerge(col("s.counters"), 4, 9).as("m"))
        .select(col("m.n_total"), col("m.counters")).head()
      assert(merged == direct, s"cells=$cells n=${keys.size}")
      // one-sided after merging: est >= exact for every present key
      val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size }
      val est = df.select(col("k")).distinct()
        .crossJoin(df.agg(CmsSketch.cmsFreq(col("k"), 4, 9).as("s")))
        .select(col("k"),
          CmsSketch.cmsEstimate(col("s.counters"), col("k"), 4, 9).as("e"))
        .as[(Long, Long)].collect()
      est.foreach { case (k, e) =>
        assert(e >= exact(k), s"key $k: est $e < exact ${exact(k)}")
      }
    }
  }

  // random values with duplicates and outliers + random quantiles
  private val histGen: Gen[(Seq[Double], Double)] = for {
    n <- Gen.chooseNum(2, 1500)
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-100.0, 100.0), Gen.oneOf(0.0, 1.0, 42.0)))
    p <- Gen.chooseNum(0.01, 1.0)
  } yield (vs.toSeq, p)

  test("property: histogram-selection est bounds the exact quantile within one bin width") {
    samples(histGen, 8, 551L).foreach { case (vs, p) =>
      val bins = 64
      val (lo, hi) = (vs.min, vs.max)
      val width = (hi - lo) / bins
      val sorted = vs.sorted
      val r = math.max(1, math.ceil(p * vs.size).toInt)
      val exact = sorted(r - 1)
      // replay the store's selection: bin counts under fixed edges,
      // cumulative, smallest bin with cum >= r, est = upper edge
      val binOf = (v: Double) =>
        if (width == 0d) 0
        else math.min(bins - 1, math.max(0, ((v - lo) / width).toInt))
      val counts = vs.groupBy(binOf).map { case (b, g) => b -> g.size }
      val cum = (0 until bins).scanLeft(0) { (acc, b) =>
        acc + counts.getOrElse(b, 0)
      }
      val bucket = (0 until bins).find(b => cum(b + 1) >= r).get
      val est = if (width == 0d) lo else lo + (bucket + 1) * width
      assert(est >= exact - 1e-9,
        s"p=$p n=${vs.size}: est $est < exact $exact")
      assert(est - exact <= width + 1e-9,
        s"p=$p n=${vs.size}: est $est - exact $exact > width $width")
    }
  }
}
