package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Skew, BruteForce}

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed ANN store: probe is partition-pruned and matches in-memory LSH") {
    val dir = java.nio.file.Files.createTempDirectory("graftlsh").toString
    val e = Tables.embeddings(spark, sf0001)
    val planes = Similarity.hyperplanes(8, 64)
    Similarity.writeBucketed(e, "vec_id", "embedding", planes, dir)

    val probe = Similarity.probeBucketed(spark, dir, "vec_id", "embedding",
      planes, QueryConstants.Q64, 10)
    // partition pruning visible in the scan
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("bucket#"),
      s"expected partition filter in plan")
    val got = probe.select("vec_id").as[Long].collect().toSeq
    val want = Similarity.lshKnn(e, "vec_id", "embedding", planes,
      QueryConstants.Q64, 10).select("vec_id").as[Long].collect().toSeq
    assert(got.sorted == want.sorted)
  }

  test("multi-probe LSH recall >= single-probe, still pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graftlshm").toString
    val e = Tables.embeddings(spark, sf0001)
    val planes = Similarity.hyperplanes(8, 64)
    Similarity.writeBucketed(e, "vec_id", "embedding", planes, dir)
    val single = Similarity.probeBucketed(spark, dir, "vec_id", "embedding",
      planes, QueryConstants.Q64, 10).select("vec_id").as[Long].collect().toSet
    val multi = Similarity.probeBucketedMulti(spark, dir, "vec_id", "embedding",
      planes, QueryConstants.Q64, 10).select("vec_id").as[Long].collect().toSet
    val exact = BruteForce.knn(e, "embedding", "vec_id", QueryConstants.Q64, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(multi.size >= single.size)
    // multi-probe recall vs exact top-10 is at least single-probe recall
    assert((multi & exact).size >= (single & exact).size)
  }

  test("salted join equals plain join (hot-key split)") {
    val big = spark.range(10000)
      .select((col("id") % 3).as("k"), col("id").as("v")) // heavy skew: 3 keys
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "unused")).toDF("k", "tag")
    val got = Skew.saltedJoin(big, small, "k", 8)
      .groupBy("k", "tag").count().orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    val want = big.join(small, Seq("k"))
      .groupBy("k", "tag").count().orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == want)
  }

  test("salted count-distinct equals plain count-distinct") {
    val df = spark.range(5000)
      .select((col("id") % 2).as("k"), (col("id") % 97).as("v"))
    val got = Skew.saltedCountDistinct(df, "k", "v", 8)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val want = df.groupBy("k").agg(count_distinct(col("v")).as("n"))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == want)
  }
}
