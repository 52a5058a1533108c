package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, TrieIndex, TrieVectorIndex}
import graft.sources.Ingest

/** The trie-variant index (MemoryVectorIndex twin) — fixtures mirror the
  * reference's own tests (MempryVectorIndex.Tests): grids, add/remove
  * round trips, and search ≡ brute force with the budget pruning. */
class TrieIndexSpec extends SparkSpec {
  import spark.implicits._

  private def gridPoints(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).flatMap { i =>
      (0 until n).map { j =>
        ((i * n + j).toLong,
          Array(((i - (n - 1) / 2.0) / (n / 2.0)).toFloat,
            ((j - (n - 1) / 2.0) / (n / 2.0)).toFloat))
      }
    }

  private def bruteWithin(pts: Seq[(Long, Array[Float])], q: Array[Float],
                          r: Double): Set[Long] =
    pts.filter { case (_, v) =>
      val s = v.indices.foldLeft(0d) { (acc, i) =>
        val d = v(i).toDouble - q(i).toDouble; acc + d * d
      }
      s <= r * r
    }.map(_._1).toSet

  private def exactFind(t: TrieVectorIndex, q: Array[Float], r: Double): Set[Long] =
    t.find(q, r.toFloat).filter { case (_, v) =>
      val s = v.indices.foldLeft(0d) { (acc, i) =>
        val d = v(i).toDouble - q(i).toDouble; acc + d * d
      }
      s <= r * r
    }.map(_._1).toSet

  test("grid searches equal brute force (reference grid fixtures)") {
    val pts = gridPoints(10)
    val trie = TrieIndex.build(pts)
    assert(trie.count == 100)
    Seq((Array(0.3f, 0.3f), 0.3), (Array(0.5f, 0.9f), 0.6),
      (Array(0.0f, 0.0f), 0.15), (Array(-0.9f, -0.9f), 0.5)).foreach {
      case (q, r) =>
        assert(exactFind(trie, q, r) == bruteWithin(pts, q, r), s"q=${q.toSeq} r=$r")
    }
  }

  test("random vectors: search equals brute force, enumerate is complete") {
    val pts = Ingest.randomUniform(spark, 500, 6, seed = 7L)
      .select(col("id"), col("vector"))
      .as[(Long, Array[Float])].collect().toSeq
    val trie = TrieIndex.build(pts, listThreshold = 5)
    assert(trie.iterator.map(_._1).toSet == pts.map(_._1).toSet)
    Seq(0.3, 0.8, 1.5).foreach { r =>
      val q = Array(0.1f, -0.2f, 0.3f, 0f, 0.5f, -0.4f)
      assert(exactFind(trie, q, r) == bruteWithin(pts, q, r), s"r=$r")
    }
  }

  test("duplicate and near-identical vectors stay retrievable (bucket path)") {
    val pts = (0L until 40L).map(i => (i, Array(0.5f, 0.5f))) ++
      Seq((100L, Array(-0.5f, 0.5f)))
    val trie = TrieIndex.build(pts, listThreshold = 3)
    assert(trie.count == 41)
    // 40 identical vectors can never split ("bad distribution" leaf)
    assert(exactFind(trie, Array(0.5f, 0.5f), 0.01) == (0L until 40L).toSet)
    assert(exactFind(trie, Array(-0.5f, 0.5f), 0.01) == Set(100L))
  }

  test("remove unlinks matches and prunes emptied chains") {
    val pts = gridPoints(8)
    val trie = TrieIndex.build(pts, listThreshold = 2)
    val q = Array(0.0f, 0.0f)
    val hit = exactFind(trie, q, 0.4)
    assert(hit.nonEmpty)
    trie.remove(q, 0.4f, (_, v) => {
      val s = v.indices.foldLeft(0d) { (acc, i) =>
        val d = v(i).toDouble - q(i).toDouble; acc + d * d
      }
      s <= 0.4 * 0.4
    })
    assert(trie.count == pts.size - hit.size)
    assert(exactFind(trie, q, 0.4).isEmpty)
    // untouched regions still answer correctly
    val q2 = Array(-0.9f, -0.9f)
    assert(exactFind(trie, q2, 0.3) == bruteWithin(pts.filterNot(p => hit(p._1)), q2, 0.3))
  }

  test("incremental add after build keeps search exact") {
    val pts = gridPoints(6)
    val (init, later) = pts.partition(_._1 % 3L != 0L)
    val trie = TrieIndex.build(init, listThreshold = 4)
    later.foreach { case (id, v) => trie.add(id, v) }
    assert(trie.count == pts.size)
    val q = Array(0.2f, -0.4f)
    assert(exactFind(trie, q, 0.5) == bruteWithin(pts, q, 0.5))
  }

  test("per-partition trie searchJoin equals brute-force distance join") {
    val e = Tables.embeddings(spark, sf0001)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val got = TrieIndex.searchJoin(e.repartition(8), "vec_id", "embedding",
        queries, 1.2)
      .as[(Long, Long)].collect().toSet
    val want = queries.flatMap { case (qid, qv) =>
      BruteForce.rangeSearch(e, "embedding", qv.map(_.toDouble).toSeq, 1.2)
        .select("vec_id").as[Long].collect().map(id => (qid, id))
    }.toSet
    assert(got == want)

    // DataFrame-of-queries overload emits the same pairs
    val gotDf = TrieIndex.searchJoin(e.repartition(8), "vec_id", "embedding",
        e.filter(col("vec_id") < 5), "vec_id", "embedding", 1.2,
        listThreshold = 10)
      .as[(Long, Long)].collect().toSet
    assert(gotDf == want)
  }

  test("prepared tries answer repeated query batches like per-call builds") {
    val e = Tables.embeddings(spark, sf0001).repartition(8)
    val tries = TrieIndex.prepare(e, "vec_id", "embedding")
    try {
      assert(tries.getStorageLevel.useMemory, "tries must be cached")
      // two batches at two radii against the SAME cached tries
      for ((lo, hi, r) <- Seq((0L, 5L, 1.2), (5L, 10L, 0.9))) {
        val queries = e.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .select(col("vec_id"), col("embedding").cast("array<float>"))
          .as[(Long, Array[Float])].collect()
        val got = TrieIndex.searchJoinPrepared(e, "vec_id", tries, queries, r)
          .as[(Long, Long)].collect().toSet
        val want = TrieIndex.searchJoin(e, "vec_id", "embedding", queries, r)
          .as[(Long, Long)].collect().toSet
        assert(got == want, s"batch [$lo,$hi) at r=$r")
      }
    } finally tries.unpersist(blocking = false)
  }

  test("boundary radius: a point at exactly the query distance is found") {
    // ADVICE r2 regression: radius.toFloat could round DOWN, making the
    // float trie budget under-approximate the double ball — a false
    // negative the exact re-check can't recover. Use radii EQUAL to
    // true point distances, where that rounding bites hardest.
    import graft.functions.VectorFunctions.{dist, doubleVec}
    val e = Tables.embeddings(spark, sf0001)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<float>"))
      .as[Array[Float]].head()
    val dists = e.filter(col("vec_id").between(1, 12))
      .select(col("vec_id"),
        dist(col("embedding"), doubleVec(qv.map(_.toDouble).toSeq)).as("d"))
      .as[(Long, Double)].collect()
    dists.foreach { case (pid, r) =>
      val got = TrieIndex.searchJoin(e.repartition(4), "vec_id", "embedding",
          Array((0L, qv)), r)
        .select(col("vec_id")).as[Long].collect().toSet
      assert(got.contains(pid), s"boundary point $pid missing at r=$r")
      // and equals brute force at this radius
      val want = BruteForce.rangeSearch(e, "embedding",
          qv.map(_.toDouble).toSeq, r)
        .select("vec_id").as[Long].collect().toSet
      assert(got == want, s"r=$r")
    }
  }
}
