package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query with timing; `-e` prints the
  * formatted physical plan instead. Usage:
  *   Tools <queryName> [sfDir] [-e]
  */
object Tools {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("-"))
      .getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("-e")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "buildbench") {
      // index-build scaling probe: n x d synthetic vectors, hybrid vs BFS
      val nums = args.drop(1).filter(_.forall(_.isDigit))
      val n = nums.headOption.map(_.toLong).getOrElse(200000L)
      val d = nums.lift(1).map(_.toInt).getOrElse(64)
      val thrOverride = nums.lift(2).map(_.toLong)
      val pts = graft.sources.Ingest.randomUniform(spark, n, d).localCheckpoint()
      val configs = thrOverride match {
        case Some(t) => Seq((s"hybrid($t-local)", t))
        case None if args.contains("hybrid-only") =>
          Seq(("hybrid(128k-local)", 1L << 17))
        case None => Seq(("hybrid(128k-local)", 1L << 17),
          ("hybrid(8k-local)", 8192L),
          ("pure-BFS", 0L))
      }
      for ((label, thr) <- configs) {
        val t0 = System.nanoTime()
        val idx = operators.IndexBuild.buildIndex(pts, "id", "vector",
          localBuildThreshold = thr)
        val leaves = idx.filter(org.apache.spark.sql.functions.col("id").isNotNull).count()
        println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($leaves leaves)")
      }
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (explain) df.explain("formatted")
    else {
      // warm
      spark.range(10).selectExpr("sum(id)").collect()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
