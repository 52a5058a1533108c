package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  test("euclidean distance matches hand values") {
    val d = one(dist(floatVec(Seq(0f, 3f)), floatVec(Seq(4f, 0f))))
    assert(math.abs(d - 5.0) < 1e-12)
  }

  test("distSq is squared distance") {
    val d = one(distSq(floatVec(Seq(1f, 1f)), floatVec(Seq(2f, 2f))))
    assert(math.abs(d - 2.0) < 1e-12)
  }

  test("cosine of parallel vectors is 1, orthogonal 0, zero-norm 0") {
    assert(math.abs(one(cosine(floatVec(Seq(1f, 2f)), floatVec(Seq(2f, 4f)))) - 1.0) < 1e-12)
    assert(math.abs(one(cosine(floatVec(Seq(1f, 0f)), floatVec(Seq(0f, 1f))))) < 1e-12)
    assert(one(cosine(floatVec(Seq(0f, 0f)), floatVec(Seq(1f, 1f)))) == 0.0)
  }

  test("inBox tests the L-inf window") {
    val in = Seq(1).toDF("x")
      .select(inBox(floatVec(Seq(0.5f, 0.5f)), floatVec(Seq(0.4f, 0.4f)), lit(0.2)).as("b"))
      .head().getBoolean(0)
    val out = Seq(1).toDF("x")
      .select(inBox(floatVec(Seq(0.7f, 0.5f)), floatVec(Seq(0.4f, 0.4f)), lit(0.2)).as("b"))
      .head().getBoolean(0)
    assert(in && !out)
  }

  test("hasDim validates vector length") {
    val df = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f))).toDF("id", "v")
    assert(df.filter(hasDim(col("v"), 2)).count() == 1)
  }

  test("dist/dot raise on mismatched vector lengths") {
    // the reference validates vector size (MemoryVectorIndex.cs:105-108);
    // silent truncation would return a wrong distance
    val df = Seq((1L, Seq(1f, 2f, 3f))).toDF("id", "v")
    val ex = intercept[Exception] {
      df.select(dist(col("v"), floatVec(Seq(1f, 2f))).as("d")).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("length mismatch")))
  }

  test("NearestIdExpr matches a reference argmin on random tables, ties, NaN") {
    // randomized cross-check of the native constant-table argmin against
    // a driver-side reference: sqrt'd compare (the IVF form), ties to the
    // lowest id, NaN rows resolve to the FIRST (lowest-id) entry
    val rnd = new scala.util.Random(42)
    val dim = 6
    val table: Array[(Long, Array[Double])] = Array.tabulate(37) { i =>
      ((i * 3 + 5).toLong, Array.fill(dim)(rnd.nextDouble() * 4 - 2))
    }
    // duplicate one centroid under a HIGHER id: ties must keep the lower
    val dupTable = table :+ (999L, table(7)._2.clone)
    def ref(v: Array[Double], t: Array[(Long, Array[Double])]): Long = {
      var best = Double.PositiveInfinity; var bid = t.head._1
      t.sortBy(_._1).foreach { case (lid, cv) =>
        val d = math.sqrt(cv.indices.foldLeft(0d) { (a, i) =>
          val x = v(i) - cv(i); a + x * x })
        if (d < best) { best = d; bid = lid }
      }
      bid
    }
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 4 - 2))) ++
      // exact centroid hits (distance-0 rows) and one NaN row
      Seq((300L, table(7)._2.toSeq), (301L, table(0)._2.toSeq),
        (302L, Seq.fill(dim)(Double.NaN)))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
        graft.functions.NearestExpr.nearestId(col("v"), dupTable,
          sqrtCompare = true).as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) =>
      if (id == 302L) assert(got(id) == dupTable.map(_._1).min,
        s"NaN row must resolve to the lowest id, got ${got(id)}")
      else assert(got(id) == ref(v.toArray, dupTable), s"row $id")
    }
    // the duplicated centroid keeps the LOWER id on the exact hit
    assert(got(300L) == table(7)._1)
  }

  test("NearestTopIdsExpr: ordered top-n ids match a reference sort, ties keep the lower id") {
    val rnd = new scala.util.Random(21)
    val dim = 6
    val table: Array[(Long, Array[Double])] = Array.tabulate(37) { i =>
      ((i * 3 + 5).toLong, Array.fill(dim)(rnd.nextDouble() * 4 - 2))
    }
    // duplicate one centroid under a HIGHER id: the lower id must sort first
    val dupTable = table :+ (999L, table(7)._2.clone)
    def ref(v: Array[Double], n: Int): Seq[Long] = dupTable
      .map { case (lid, cv) =>
        (math.sqrt(cv.indices.foldLeft(0d) { (a, i) =>
          val x = v(i) - cv(i); a + x * x }), lid)
      }
      .sortBy(identity).take(n).map(_._2).toSeq
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 4 - 2))) :+
      (200L, table(7)._2.toSeq) // exact dup hit: both copies in the top-n
    for (n <- Seq(1, 3, 8)) {
      val got = rows.toDF("id", "v")
        .select(col("id"), graft.functions.NearestExpr.nearestTopIds(
          col("v"), dupTable, n, sqrtCompare = true).as("tops"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      rows.foreach { case (id, v) =>
        assert(got(id) == ref(v.toArray, n), s"row $id n=$n") }
    }
    // n=1 must agree with the single-id kernel everywhere
    val one = rows.toDF("id", "v")
      .select(col("id"),
        graft.functions.NearestExpr.nearestTopIds(col("v"), dupTable, 1,
          sqrtCompare = true).getItem(0).as("t"),
        graft.functions.NearestExpr.nearestId(col("v"), dupTable,
          sqrtCompare = true).as("s"))
      .collect()
    one.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"top-1 diverged from nearestId on row ${r.getLong(0)}"))
    // n past the table size truncates to the table size
    val wide = rows.take(3).toDF("id", "v")
      .select(graft.functions.NearestExpr.nearestTopIds(col("v"), dupTable,
        100, sqrtCompare = true).as("tops"))
      .collect()
    wide.foreach(r => assert(r.getSeq[Long](0).size == dupTable.length))
  }

  test("NearestDistSqExpr matches a reference min-d2 on random tables") {
    val rnd = new scala.util.Random(7)
    val dim = 5
    val cents = Array.fill(23)(Array.fill(dim)(rnd.nextDouble() * 4 - 2))
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 4 - 2))) :+
      (200L, cents(11).toSeq) // exact centroid hit: distance 0
    def ref(v: Seq[Double]): Double = cents.map { cv =>
      cv.indices.foldLeft(0d) { (a, i) => val x = v(i) - cv(i); a + x * x }
    }.min
    val got = rows.toDF("id", "v")
      .select(col("id"), graft.functions.NearestExpr.nearestDistSq(
        col("v"), cents).as("d2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      assert(math.abs(got(id) - ref(v)) < 1e-12, s"row $id") }
    assert(got(200L) == 0.0d)
    // short input raises instead of reading out of bounds
    val ex = intercept[Exception] {
      Seq((1L, Seq(1f))).toDF("id", "v")
        .select(graft.functions.NearestExpr.nearestDistSq(col("v"), cents))
        .collect()
    }
    def causes2(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes2(t.getCause)
    assert(causes2(ex).exists(m => m != null && m.contains("length mismatch")))
  }

  test("NearestRoutedExpr raises on short vectors before the member loop") {
    // the super-routing pass must carry the same numElements guard as the
    // member loop — otherwise a short UnsafeArrayData input silently
    // reads past its buffer during routing
    val table: Array[(Long, Array[Double])] =
      Array.tabulate(9)(i => (i.toLong, Array(i * 1.0, 0.0, 0.0)))
    val df = Seq((1L, Seq(1f))).toDF("id", "v")
    val ex = intercept[Exception] {
      df.select(graft.functions.NearestExpr.nearestIdRouted(col("v"), table,
        sqrtCompare = false).as("l")).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("length mismatch")))
  }

  test("KMV sketch: exact below k, accurate above, order/duplicate invariant") {
    import graft.functions.KmvSketch
    // below k: the sketch IS the distinct set — estimate exact
    val small = spark.range(100).toDF("v")
    val r1 = small.agg(KmvSketch.kmvDistinct(col("v"), 512).as("s"))
      .select("s.n", "s.estimate").head()
    assert(r1.getLong(0) == 100L && r1.getDouble(1) == 100.0)
    // above k: estimate within the ~1/sqrt(k) band (k=512 → ~4.4%; allow 3σ)
    val big = spark.range(20000).toDF("v")
    val est = big.agg(KmvSketch.kmvDistinct(col("v"), 512).as("s"))
      .select("s.estimate").head().getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15, s"est=$est")
    // duplicates and partitioning must not move the sketch at all
    val dup = big.union(big).union(big).repartition(7)
    val est2 = dup.agg(KmvSketch.kmvDistinct(col("v"), 512).as("s"))
      .select("s.estimate").head().getDouble(0)
    assert(est2 == est)
    // empty input: n=0, estimate 0
    val r0 = spark.range(0).toDF("v")
      .agg(KmvSketch.kmvDistinct(col("v"), 512).as("s"))
      .select("s.n", "s.estimate").head()
    assert(r0.getLong(0) == 0L && r0.getDouble(1) == 0.0)
  }

  test("HLL sketch: accurate, linear-counting small range, invariant, composed-register parity") {
    import graft.functions.{HllSketch, PortableHash}
    // accuracy at p=8 (m=256 → σ ≈ 6.5%): 20k distinct within 4σ
    val big = spark.range(20000).toDF("v")
    val est = big.agg(HllSketch.hllDistinct(col("v"), 8).as("s"))
      .select("s.estimate").head().getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.26, s"est=$est")
    // duplicates and partitioning cannot move a register (pure max over
    // the value set) — z_fix, v_zero, estimate all bit-identical
    val dup = big.union(big).union(big).repartition(7)
    val r2 = dup.agg(HllSketch.hllDistinct(col("v"), 8).as("s"))
      .select("s.v_zero", "s.z_fix", "s.estimate").head()
    val r1 = big.agg(HllSketch.hllDistinct(col("v"), 8).as("s"))
      .select("s.v_zero", "s.z_fix", "s.estimate").head()
    assert(r1 == r2)
    // small range: the linear-counting branch fires and equals
    // m·ln(m/V) exactly
    val small = spark.range(100).toDF("v")
    val rs = small.agg(HllSketch.hllDistinct(col("v"), 8).as("s"))
      .select("s.v_zero", "s.raw_est", "s.estimate").head()
    assert(rs.getLong(0) > 0L && rs.getDouble(1) <= 640.0)
    assert(rs.getDouble(2) == 256.0 * math.log(256.0 / rs.getLong(0)))
    // empty input: every register zero → V = m, estimate m·ln(1) = 0
    val r0 = spark.range(0).toDF("v")
      .agg(HllSketch.hllDistinct(col("v"), 8).as("s"))
      .select("s.v_zero", "s.estimate").head()
    assert(r0.getLong(0) == 256L && r0.getDouble(1) == 0.0)
    // composed-register parity (the KernelParitySpec discipline): the
    // sketch's integer state equals the declarative
    // bucket→max(rho)→harmonic-sum pipeline over the same hash
    val hashed = big.select(
      PortableHash.md5Long60(col("v").cast("string")).as("h"))
    val w = shiftrightunsigned(col("h"), 8)
    val regs = hashed
      .select(pmod(col("h"), lit(256L)).as("bucket"),
        when(w === 0L, lit(53)).otherwise(lit(53) - length(bin(w))).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
    val c = regs.agg(
      (lit(256L) - count(lit(1))).as("v_zero"),
      (sum(expr("shiftleft(1L, 53 - r)")) +
        (lit(256L) - count(lit(1))) * lit(9007199254740992L)).as("z_fix"))
      .head()
    assert(c.getLong(0) == r1.getLong(0) && c.getLong(1) == r1.getLong(1))
    // sketch-cube algebra: merging per-half register cells equals the
    // sketch over the whole — register max is associative + idempotent
    val halves = big.withColumn("half", (col("v") % 2).cast("int"))
      .groupBy(col("half"))
      .agg(HllSketch.hllDistinct(col("v"), 8).as("s"))
    val merged = halves
      .agg(graft.functions.HllMerge.hllMerge(col("s.regs"), 8).as("s"))
      .select("s.v_zero", "s.z_fix", "s.estimate").head()
    assert(merged == r1)
    // idempotence: merging a cell with itself changes nothing
    val dupCells = halves.union(halves)
      .agg(graft.functions.HllMerge.hllMerge(col("s.regs"), 8).as("s"))
      .select("s.v_zero", "s.z_fix", "s.estimate").head()
    assert(dupCells == r1)
  }

  test("HLL sketch: accuracy sweep across cardinality regimes") {
    import graft.functions.HllSketch
    // m=256 → σ ≈ 1.04/16 ≈ 6.5%; allow ~4σ at every regime the
    // estimator crosses (linear counting, transition, raw HLL)
    for (n <- Seq(10L, 100L, 1000L, 10000L, 100000L)) {
      val est = spark.range(n).toDF("v")
        .agg(HllSketch.hllDistinct(col("v"), 8).as("s"))
        .select("s.estimate").head().getDouble(0)
      assert(math.abs(est - n) / n < 0.26, s"n=$n est=$est")
    }
  }

  test("CMS sketch: one-sided error, partition invariance, merge algebra, composed-counter parity") {
    import graft.functions.{CmsSketch, PortableHash}
    val (d, b) = (4, 9)
    val w = 1 << b
    // zipf-ish frequencies: key k appears (200 - k) times, k in [0, 200)
    val df = spark.range(200).toDF("k")
      .select(col("k"), explode(sequence(lit(1), lit(200) - col("k"))).as("i"))
      .select(col("k"))
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val sk = df.agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
    // n_total = |rows|
    assert(sk.select("s.n_total").head().getLong(0) == df.count())
    // one-sided error: est >= exact for EVERY key (the CMS guarantee)
    val est = exact.join(broadcast(sk))
      .select(col("k"), col("n"),
        CmsSketch.cmsEstimate(col("s.counters"), col("k"), d, b).as("est"))
    assert(est.filter(col("est") < col("n")).count() == 0L)
    // ...and with 200 keys over 512 buckets most mins are collision-free
    assert(est.filter(col("est") === col("n")).count() >= 150L)
    // duplicates double the counters; partitioning cannot move them
    val c1 = sk.select("s.counters").head().getSeq[Long](0)
    val c2 = df.repartition(7).agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
      .select("s.counters").head().getSeq[Long](0)
    assert(c1 == c2)
    val cDup = df.union(df).agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
      .select("s.counters").head().getSeq[Long](0)
    assert(cDup == c1.map(_ * 2L))
    // merge algebra: per-half partial counters SUM to the whole —
    // the lossless map-side-combine property
    val halves = df.withColumn("half", (col("k") % 2).cast("int"))
      .groupBy(col("half")).agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
      .select(posexplode(col("s.counters")).as(Seq("i", "c")))
      .groupBy(col("i")).agg(sum(col("c")).as("c")).orderBy(col("i"))
      .select(col("c")).collect().map(_.getLong(0)).toSeq
    assert(halves == c1)
    // composed-counter parity (KernelParitySpec discipline): the
    // native buffer equals the declarative slice→GROUP BY replay
    val composed = df
      .select(PortableHash.md5Long60(col("k").cast("string")).as("h"))
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"),
          shiftrightunsigned(col("h"), j * b).bitwiseAND(lit(w - 1))
            .as("bucket"))): _*)).as("s"))
      .groupBy(col("s.j"), col("s.bucket")).agg(count(lit(1)).as("c"))
      .select((col("j") * w + col("bucket")).as("i"), col("c"))
    val compArr = Array.fill(d * w)(0L)
    composed.collect().foreach(r => compArr(r.getLong(0).toInt) = r.getLong(1))
    assert(compArr.toSeq == c1)
    // null inputs don't count; empty input = all-zero counters, n 0
    val withNull = df.union(Seq[Option[Long]](None).toDF("k"))
      .agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
      .select("s.counters").head().getSeq[Long](0)
    assert(withNull == c1)
    val empty = spark.range(0).toDF("k")
      .agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
      .select(col("s.n_total"), col("s.counters")).head()
    assert(empty.getLong(0) == 0L && empty.getSeq[Long](1).forall(_ == 0L))
  }

  test("CmsMerge: merge-of-cells == direct sketch, idempotence violation is real, bad input rejected") {
    import graft.functions.{CmsMerge, CmsSketch}
    val (d, b) = (4, 9)
    val df = spark.range(500).toDF("k")
      .select((col("k") % 100).as("k"), (col("k") % 5).as("cell"))
    val direct = df.agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
      .select(col("s.n_total"), col("s.counters")).head()
    // per-cell cells re-aggregated with cms_merge == direct over all
    val cells = df.groupBy(col("cell"))
      .agg(CmsSketch.cmsFreq(col("k"), d, b).as("s"))
      .select(col("s.counters").as("counters")).localCheckpoint()
    val merged = cells.agg(CmsMerge.cmsMerge(col("counters"), d, b).as("s"))
      .select(col("s.n_total"), col("s.counters")).head()
    assert(merged.getLong(0) == direct.getLong(0))
    assert(merged.getSeq[Long](1) == direct.getSeq[Long](1))
    // NOT idempotent (the documented exactly-once contract): merging
    // the cells twice doubles every counter
    val doubled = cells.union(cells)
      .agg(CmsMerge.cmsMerge(col("counters"), d, b).as("s"))
      .select(col("s.counters")).head().getSeq[Long](0)
    assert(doubled == direct.getSeq[Long](1).map(_ * 2L))
    // null cells are skipped, like hll_merge
    val withNull = cells.union(
        Seq[Option[Seq[Long]]](None).toDF("counters"))
      .agg(CmsMerge.cmsMerge(col("counters"), d, b).as("s"))
      .select(col("s.counters")).head().getSeq[Long](0)
    assert(withNull == direct.getSeq[Long](1))
    // wrong-size and negative-counter inputs fail loudly, not garbage
    intercept[Exception] {
      Seq(Seq(1L, 2L, 3L)).toDF("counters")
        .agg(CmsMerge.cmsMerge(col("counters"), d, b)).collect()
    }
    intercept[Exception] {
      Seq(Seq.fill(d * (1 << b))(-1L)).toDF("counters")
        .agg(CmsMerge.cmsMerge(col("counters"), d, b)).collect()
    }
  }

  test("Misra-Gries candidates: superset of true heavy hitters; exact pass matches brute force") {
    import graft.functions.MisraGries
    import graft.operators.Relational
    // skewed stream: key "hot<i>" appears (1000 - 40*i) times for
    // i < 10 over a sea of unique keys, across many partitions
    val rows = spark.range(20000).select(
      when(col("id") % 2 === 0,
          concat(lit("hot"), ((col("id") % 20) / 2).cast("long")))
        .otherwise(concat(lit("u"), col("id"))).as("key"))
      .repartition(13)
    val n = rows.count()
    def brute(k: Int): Map[String, Long] =
      rows.groupBy("key").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > n)
        .as[(String, Long)].collect().toMap
    for (k <- Seq(5, 25, 100)) {
      val cand = rows.agg(MisraGries.candidates(col("key"), k).as("c"))
        .head().getAs[scala.collection.Seq[String]](0)
      assert(cand.size <= k)
      val truth = brute(k)
      assert(truth.keySet.subsetOf(cand.toSet),
        s"k=$k missing ${truth.keySet -- cand.toSet}")
      val exact = Relational.exactHeavyHitters(rows, "key", k)
        .as[(String, Long)].collect().toMap
      assert(exact == truth, s"k=$k")
    }
    // real corpus tokens
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val nt = toks.count()
    val truthT = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 40 > nt)
      .as[(String, Long)].collect().toMap
    val exactT = Relational.exactHeavyHitters(toks, "token", 40)
      .as[(String, Long)].collect().toMap
    assert(exactT == truthT && truthT.nonEmpty)
    // empty input
    assert(Relational.exactHeavyHitters(
      spark.range(0).select(col("id").cast("string").as("key")),
      "key", 10).count() == 0L)
  }

  test("per-group heavy hitters: exact per group, groups don't leak into each other") {
    import graft.operators.Relational
    // group A: one hot key over uniques; group B: uniform (no hitters);
    // group C: two hot keys — the same key name is hot in A but cold in C
    val rows = spark.range(9000).select(
      when(col("id") % 3 === 0, lit("A"))
        .when(col("id") % 3 === 1, lit("B")).otherwise(lit("C")).as("g"),
      when(col("id") % 3 === 0 && col("id") % 5 =!= 0, lit("hotA"))
        .when(col("id") % 3 === 2 && col("id") % 4 === 0, lit("hotA"))
        .when(col("id") % 3 === 2 && col("id") % 4 === 2, lit("hotC"))
        .otherwise(concat(lit("u"), col("id"))).as("key"))
      .repartition(11)
    val truth = rows.groupBy("g", "key").agg(count(lit(1)).as("cnt"))
      .join(rows.groupBy("g").agg(count(lit(1)).as("n")), "g")
      .filter(col("cnt") * 5 > col("n"))
      .select("g", "key", "cnt")
      .as[(String, String, Long)].collect().toSet
    val got = Relational.exactHeavyHittersByGroup(rows, "g", "key", 5)
      .as[(String, String, Long)].collect().toSet
    assert(got == truth && truth.nonEmpty)
    assert(!got.exists(_._1 == "B"), "uniform group must have no hitters")
    assert(got.exists(r => r._1 == "A" && r._2 == "hotA"))
    assert(got.exists(r => r._1 == "C" && r._2 == "hotA") ==
      truth.exists(r => r._1 == "C" && r._2 == "hotA"))
  }
}
