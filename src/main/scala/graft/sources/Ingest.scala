package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest / export / synthetic-dataset utilities mirroring the reference's
  * sources and sinks (SURVEY.md §2.1):
  *  - S2 JSON vector shred: vectors stored as JSON float-array strings
  *    (README.md:39-48; parsed via openjson DDL.sql:253,371) ↔
  *    `from_json` / `to_json` at the ingest boundary;
  *  - S8/S9 CSV sinks (Program.cs:76-131): id|comma-joined floats;
  *  - S5/S6/S7 synthetic generators (Program.cs:163-181, :54-67;
  *    MemoryVectorIndexTests.cs:13-91) — seeded/deterministic, generated
  *    distributively with spark.range (no driver-side materialization).
  */
object Ingest {

  /** Parse a JSON float-array string column into ARRAY<FLOAT> (S2). */
  def parseJsonVector(json: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    from_json(json, ArrayType(FloatType, containsNull = false))

  /** (id, vector) → (id, jsonString) — the reference's storage form. */
  def toJsonVectors(points: DataFrame, idCol: String, vecCol: String): DataFrame =
    points.select(col(idCol), to_json(col(vecCol)).as("vector_json"))

  /** Round-trip: JSON-string vectors back to (id, idx, value) EAV rows —
    * exactly what `openjson` shredding produces (DDL.sql:370-371). */
  def shredJsonVectors(jsonDf: DataFrame, idCol: String, jsonCol: String): DataFrame =
    jsonDf.select(col(idCol),
      posexplode(parseJsonVector(col(jsonCol))).as(Seq("idx", "value")))

  /** S9 CSV points sink: `id|v0,v1,...` rows. */
  def writePointsCsv(points: DataFrame, idCol: String, vecCol: String,
                     path: String): Unit =
    points.select(col(idCol).cast("string").as("id"),
        concat_ws(",", col(vecCol)).as("vector"))
      .write.mode("overwrite").option("delimiter", "|").csv(path)

  /** S8 CSV index sink: RangeID,Dimension,Mid,ID per node. */
  def writeIndexCsv(index: DataFrame, path: String): Unit =
    index.select(col("rangeId"), col("dimension"), col("mid"), col("id"))
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Read back an S9 CSV: (id, vector ARRAY<FLOAT>). */
  def readPointsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("delimiter", "|")
      .schema("id LONG, vector STRING")
      .csv(path)
      .select(col("id"), split(col("vector"), ",").cast("array<float>").as("vector"))

  /** S5: n seeded uniform vectors in [-1,1]^dim. Deterministic: value
    * derived from xxhash64(id, i, seed) (codegen'd, no driver RNG, safe
    * under ANSI overflow semantics) — generated distributively from
    * spark.range. */
  def randomUniform(spark: SparkSession, n: Long, dim: Int, seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val h = xxhash64(col("id"), i, lit(seed))
        (shiftrightunsigned(h, 11).cast("double") / lit((1L << 53).toDouble) * 2d - 1d)
          .cast("float")
      }).as("vector"))

  /** S5-portable: the same seeded uniform generator expressed over md5 —
    * bit-for-bit reproducible in ANY engine with md5 (the DuckDB oracle
    * recomputes it exactly), value = 2·(60-bit md5 prefix)/2^60 − 1.
    * xxhash64 (`randomUniform`) stays the cheaper in-engine default. */
  def randomUniformPortable(spark: SparkSession, n: Long, dim: Int,
                            seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val key = concat_ws("_", col("id"), i, lit(seed))
        (graft.functions.PortableHash.md5Uniform(key) * 2d - 1d).cast("float")
      }).as("vector"))

  /** Clustered synthetic embeddings: `centers` seeded uniform cluster
    * centers, each point = its (id-hashed) center + `spread`-scaled
    * seeded noise. The realistic ANN-benchmark shape — real embedding
    * corpora are clustered, which is what gives IVF partitions their
    * pruning power (uniform high-d data has NO neighborhood structure:
    * every point's neighbors scatter over ~all lists and recall@k under
    * any pruned probe collapses by construction — the wrong fixture for
    * a recall floor). Same declarative hash-derived generation as
    * [[randomUniform]]: no RNG state, any row reproducible alone. */
  def randomClustered(spark: SparkSession, n: Long, dim: Int, centers: Int,
                      spread: Double = 0.05, seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val cid = pmod(xxhash64(col("id"), lit(seed)), lit(centers.toLong))
        val ch = xxhash64(cid, i, lit(seed + 1))
        val center = shiftrightunsigned(ch, 11).cast("double") /
          lit((1L << 53).toDouble) * 2d - 1d
        val nh = xxhash64(col("id"), i, lit(seed + 2))
        val noise = (shiftrightunsigned(nh, 11).cast("double") /
          lit((1L << 53).toDouble) * 2d - 1d) * lit(spread)
        (center + noise).cast("float")
      }).as("vector"))

  /** S6: d one-hot basis vectors e_i (adversarial: every dim has
    * near-zero stdev). */
  def oneHot(spark: SparkSession, dim: Int): DataFrame =
    spark.range(dim).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => when(i === col("id").cast("int"), lit(1f)).otherwise(lit(0f)))
        .as("vector"))

  /** S4: ARFF scan (MemoryVectorIndexTests.cs:306-339 reads the
    * clustering-benchmark 2d-10c.arff over HTTP; zero-egress here, so the
    * source reads local files with the same format): header `@attribute`
    * lines declare columns, `@data` starts comma-separated rows. Numeric
    * attributes parse to float, the rest stay strings; rows gain a
    * sequential id. Driver-side header sniff + distributed data parse. */
  def readArff(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    // URL parity with the reference's fixture fetch
    // (MemoryVectorIndex.Tests/MemoryVectorIndexTests.cs:8 pulls its
    // .arff over HTTP): accept any URL scheme the JVM can open —
    // http(s)://, file:// — alongside plain local paths. ARFF fixtures
    // are small header-first text files, so a driver-side read is the
    // right shape either way (the distributed parse below is unchanged).
    val isUrl = scala.util.Try(
      new java.net.URI(path).getScheme != null).getOrElse(false)
    val lines = (if (isUrl)
      scala.util.Using.resource(scala.io.Source.fromURL(path))(
        _.getLines().toVector)
    else java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala.toSeq)
    val attrs = lines.filter(_.trim.toLowerCase.startsWith("@attribute"))
      .map { l =>
        val parts = l.trim.split("\\s+", 3)
        val name = parts(1)
        val numeric = parts.lift(2).exists(t =>
          t.equalsIgnoreCase("numeric") || t.equalsIgnoreCase("real") ||
            t.equalsIgnoreCase("integer"))
        (name, numeric)
      }
    val dataStart = lines.indexWhere(_.trim.toLowerCase.startsWith("@data")) + 1
    val rows = lines.drop(dataStart)
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("%"))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.zipWithIndex.map { case (l, i) =>
        org.apache.spark.sql.Row(
          (i.toLong +: l.split(",").map(_.trim).toIndexedSeq): _*)
      }),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false) +:
        attrs.map { case (n, _) => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType, nullable = true) }))
    attrs.foldLeft(raw) { case (df, (n, numeric)) =>
      if (numeric) df.withColumn(n, col(n).cast("float")) else df
    }
  }

  /** Texmex vector-file source (.fvecs/.bvecs — the ANN-benchmark
    * interchange formats of sift1M/deep1B): each record is
    * [int32 dim, little-endian] followed by dim components (float32 in
    * .fvecs, uint8 in .bvecs). Every record in a file shares one dim,
    * so the monolithic binary file SPLITS into record-aligned byte
    * ranges: the driver sniffs dim from the first 4 bytes, then each
    * task seeks into its own range via the Hadoop FileSystem API and
    * parses records — a genuinely distributed read (no whole-file-per-
    * row binaryFile scan, no driver materialization). The reference
    * ingests the same public datasets via HDF5
    * (VectorIndex.MainTest/Program.cs:183-260, the accepted S3
    * exclusion); this is the no-external-library Spark twin for the
    * other standard container. Returns (id, vector ARRAY<FLOAT>) with
    * id = record ordinal. */
  def readVecs(spark: SparkSession, path: String,
               minPartitions: Int = 0): DataFrame = {
    val lower = path.toLowerCase
    require(lower.endsWith(".fvecs") || lower.endsWith(".bvecs"),
      s"readVecs expects a .fvecs or .bvecs path, got $path")
    val bytesPerComp = if (lower.endsWith(".bvecs")) 1 else 4
    import spark.implicits._
    vecRecords(spark, path, bytesPerComp, minPartitions) { (bb, dim) =>
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = if (bytesPerComp == 1) (bb.get() & 0xff).toFloat
                 else bb.getFloat()
        i += 1
      }
      out
    }.toDF("id", "vector")
  }

  /** .ivecs twin of [[readVecs]] (int32 components — the ground-truth
    * neighbour-id files of the same benchmark suites). Returns
    * (id, vector ARRAY<INT>); ints stay exact (no float round-trip). */
  def readIvecs(spark: SparkSession, path: String,
                minPartitions: Int = 0): DataFrame = {
    require(path.toLowerCase.endsWith(".ivecs"),
      s"readIvecs expects a .ivecs path, got $path")
    import spark.implicits._
    vecRecords(spark, path, 4, minPartitions) { (bb, dim) =>
      val out = new Array[Int](dim)
      var i = 0
      while (i < dim) { out(i) = bb.getInt(); i += 1 }
      out
    }.toDF("id", "vector")
  }

  /** Shared splitter: sniff dim, carve record-aligned ranges, seek +
    * parse per task. `parse` reads exactly dim components off a
    * little-endian buffer positioned after the record's dim header. */
  private def vecRecords[T: scala.reflect.ClassTag](
      spark: SparkSession, path: String, bytesPerComp: Int,
      minPartitions: Int)(
      parse: (java.nio.ByteBuffer, Int) => T): org.apache.spark.rdd.RDD[(Long, T)] = {
    val sc = spark.sparkContext
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(sc.hadoopConfiguration)
    val len = fs.getFileStatus(hPath).getLen
    if (len == 0) return sc.emptyRDD[(Long, T)]
    val head = new Array[Byte](4)
    val in0 = fs.open(hPath)
    try in0.readFully(0, head) finally in0.close()
    val dim = java.nio.ByteBuffer.wrap(head)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    require(dim > 0 && dim < (1 << 24), s"implausible dim $dim in $path")
    val recSize = 4L + dim.toLong * bytesPerComp
    require(len % recSize == 0,
      s"$path length $len is not a multiple of the record size $recSize " +
        s"(dim $dim) — truncated or mixed-dim file")
    val nRecs = len / recSize
    val byParallelism = if (minPartitions > 0) minPartitions.toLong
                        else sc.defaultParallelism.toLong
    // ~64 MB ceiling per split, at least one record per split
    val parts = math.max(1L, math.min(nRecs,
      math.max(byParallelism, len / (64L << 20)))).toInt
    val ranges = (0 until parts).map { p =>
      (nRecs * p / parts, nRecs * (p + 1) / parts)
    }.filter { case (lo, hi) => lo < hi }
    // Broadcast the DRIVER's hadoop conf (spark.hadoop.*, credentials,
    // custom defaultFS) to the tasks — a fresh `new Configuration()`
    // in the closure would drop all of it and misroute remote paths.
    val confBc = org.apache.spark.graftshim.GraftCoreShim.broadcastHadoopConf(sc)
    sc.parallelize(ranges, math.max(1, ranges.length)).flatMap {
      case (lo, hi) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val tfs = p.getFileSystem(
          org.apache.spark.graftshim.GraftCoreShim.confOf(confBc))
        val in = tfs.open(p)
        try {
          in.seek(lo * recSize)
          val buf = new Array[Byte](recSize.toInt)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, T)]
          var r = lo
          while (r < hi) {
            in.readFully(buf)
            val bb = java.nio.ByteBuffer.wrap(buf)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val d2 = bb.getInt()
            require(d2 == dim,
              s"record $r of $path declares dim $d2, expected $dim")
            out += ((r, parse(bb, dim)))
            r += 1
          }
          out.iterator
        } finally in.close()
    }
  }

  /** S11: dense sequential ids (the reference's `next value for`
    * sequences, DDL.sql:328-330) — row_number over an explicit order. */
  def withSequentialIds(df: DataFrame, orderCols: Seq[String],
                        idName: String = "seq_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(orderCols.map(col): _*)
    df.withColumn(idName, row_number().over(w).cast("long") - 1)
  }

  /** S7: n x n grid lattice, normalized to [-1,1] like the reference's
    * grid fixtures (MemoryVectorIndexTests.cs:36-49): component =
    * (i - (n-1)/2) / (n/2). id = i*n + j. */
  def grid(spark: SparkSession, n: Int): DataFrame = {
    val half = (n - 1) / 2.0d
    val scale = n / 2.0d
    val a = spark.range(n).select(col("id").as("i"))
    val b = spark.range(n).select(col("id").as("j"))
    a.crossJoin(b).select(
      (col("i") * n + col("j")).as("id"),
      array(((col("i") - half) / scale).cast("float"),
        ((col("j") - half) / scale).cast("float")).as("vector"))
  }
}
