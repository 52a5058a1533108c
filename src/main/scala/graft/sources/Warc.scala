package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) source — the container format of
  * Common Crawl and every crawl-derived LLM corpus, and therefore the
  * FIRST operator of a real 100-TB text pipeline. A WARC file is a
  * sequence of records: an ASCII header block (`WARC/1.0` + named
  * fields, CRLF-delimited, terminated by a blank line) followed by
  * exactly `Content-Length` payload bytes and a blank-line separator.
  *
  * Processing grain: ONE FILE PER TASK (`readWarc` lists the
  * directory and parses each file inside `mapPartitions`). That is the
  * standard Common-Crawl layout — the corpus ships as ~1 GB gzip
  * members, so file-level parallelism over many files saturates a
  * cluster without record-level splitting (which would need sidecar
  * offset indexes; gzip members aren't seekable anyway). The parser
  * itself is plain byte framing — no library, works on any JVM.
  *
  * Reference shape: the splittable `.fvecs` reader (Ingest.readVecs)
  * is the record-aligned twin for fixed-size records; WARC records are
  * variable-size, hence the per-file grain. */
object Warc {

  case class WarcRecord(file: String, record_idx: Long, warc_type: String,
                        target_uri: String, content_length: Long,
                        body: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Encode records as one WARC 1.0 byte stream (response records with
    * the ISO 28500 mandatory fields; `WARC-Record-ID` is derived from
    * the index and `WARC-Date` is a fixed instant so the bytes are
    * deterministic). URIs must be ASCII without CR/LF — anything else
    * would inject header bytes or be mangled by the ASCII encoder, so
    * it fails loudly (percent-encode upstream). */
  def encode(records: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((uri, body), i) =>
      require(uri.forall(c => c >= 0x21 && c <= 0x7e),
        s"WARC-Target-URI must be printable ASCII without whitespace " +
          s"(percent-encode it): '$uri'")
      val header =
        s"WARC/1.0\r\n" +
          s"WARC-Type: response\r\n" +
          s"WARC-Record-ID: <urn:graft:record-$i>\r\n" +
          s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
          s"WARC-Target-URI: $uri\r\n" +
          s"Content-Length: ${body.length}\r\n" +
          "\r\n"
      bos.write(header.getBytes("US-ASCII"))
      bos.write(body)
      bos.write(Crlf); bos.write(Crlf)
    }
    bos.toByteArray
  }

  /** Parse one WARC byte stream. Malformed framing (missing version
    * line, unterminated header, truncated payload) throws — a corrupt
    * crawl file should fail loudly, not truncate silently. */
  def parse(bytes: Array[Byte]): Seq[(String, String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Array[Byte])]
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r'.toByte && bytes(i + 1) == '\n'.toByte)) i += 1
      require(i + 1 < bytes.length, "unterminated WARC header line")
      i
    }
    while (pos < bytes.length) {
      // skip blank separator lines between records
      if (pos + 1 < bytes.length && bytes(pos) == '\r'.toByte &&
        bytes(pos + 1) == '\n'.toByte) { pos += 2 }
      else {
        val ve = lineEnd(pos)
        val version = new String(bytes, pos, ve - pos, "US-ASCII")
        require(version.startsWith("WARC/"),
          s"expected WARC version line at offset $pos, got '$version'")
        pos = ve + 2
        var warcType = ""; var uri = ""; var clen = -1L
        var blank = false
        while (!blank) {
          val e = lineEnd(pos)
          if (e == pos) blank = true
          else {
            val line = new String(bytes, pos, e - pos, "US-ASCII")
            val ci = line.indexOf(':')
            if (ci > 0) {
              // Locale.ROOT: a tr-TR JVM's default lowercase maps I to
              // dotless ı and would silently unmatch WARC-Target-URI
              val (k, v) = (line.substring(0, ci).trim
                .toLowerCase(java.util.Locale.ROOT),
                line.substring(ci + 1).trim)
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "content-length" => clen = v.toLong
                case _ => ()
              }
            }
          }
          pos = e + 2
        }
        require(clen >= 0, "WARC record without Content-Length")
        require(clen <= Int.MaxValue - 16,
          s"WARC payload of $clen bytes exceeds the single-array limit")
        require(pos + clen <= bytes.length,
          s"truncated WARC payload at offset $pos (need $clen bytes)")
        out += ((warcType, uri,
          java.util.Arrays.copyOfRange(bytes, pos, pos + clen.toInt)))
        pos += clen.toInt
      }
    }
    out.toSeq
  }

  /** Distributed read of a directory of WARC files — plain `.warc` and
    * gzip `.warc.gz` members (Common Crawl ships the latter; the member
    * is inflated in-task, still one file per task): rows
    * (file, record_idx, warc_type, target_uri, content_length, body).
    * A directory with no WARC members fails loudly (this module's
    * contract) rather than returning a silently empty frame. Peak task
    * memory is ~2× the inflated file size (the framing buffer plus the
    * payload copies both live until the task's rows are emitted) —
    * size executors for 2× the member size at the CC ~1 GB grain. */
  def readWarc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(sc.hadoopConfiguration)
    val files = fs.listStatus(hPath)
      .filter(s => s.isFile && (s.getPath.getName.endsWith(".warc") ||
        s.getPath.getName.endsWith(".warc.gz")))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty,
      s"no .warc or .warc.gz members under $dir — wrong directory?")
    val confBc = org.apache.spark.graftshim.GraftCoreShim.broadcastHadoopConf(sc)
    sc.parallelize(files.toSeq, math.max(1, files.length))
      .flatMap { file =>
        val p = new org.apache.hadoop.fs.Path(file)
        val tfs = p.getFileSystem(
          org.apache.spark.graftshim.GraftCoreShim.confOf(confBc))
        val len = tfs.getFileStatus(p).getLen
        // one task buffers one file (the CC members are ~1 GB) — fail
        // loudly past the JVM array limit instead of truncating via toInt
        require(len <= Int.MaxValue - 16,
          s"$file is $len bytes — beyond the per-file buffer limit; " +
            "split the archive into standard ~1 GB members")
        val buf =
          if (file.endsWith(".gz")) {
            // GZIPInputStream treats a malformed next-member header as
            // EOF ("ignore any malformed, do not fail" in its trailer
            // reader) — so a corrupt member boundary or trailing
            // garbage in a multi-member .warc.gz silently truncates the
            // record stream. Count the COMPRESSED bytes consumed and
            // require the whole file was read, upholding this module's
            // fail-loudly contract.
            val raw = new java.io.FilterInputStream(tfs.open(p)) {
              var consumed = 0L
              override def read(): Int = {
                val b = super.read(); if (b >= 0) consumed += 1; b
              }
              override def read(b: Array[Byte], off: Int,
                                l: Int): Int = {
                val n = super.read(b, off, l)
                if (n > 0) consumed += n
                n
              }
              override def skip(n: Long): Long = {
                val s = super.skip(n); consumed += s; s
              }
            }
            val in = new java.util.zip.GZIPInputStream(raw)
            try {
              val bos = new java.io.ByteArrayOutputStream()
              val chunk = new Array[Byte](1 << 20)
              var n = in.read(chunk)
              while (n >= 0) {
                // the inflated member must also fit one JVM array
                require(bos.size().toLong + math.max(n, 0) <=
                  Int.MaxValue - 16,
                  s"$file inflates beyond the per-file buffer limit")
                if (n > 0) bos.write(chunk, 0, n)
                n = in.read(chunk)
              }
              require(raw.consumed == len,
                s"$file: gzip stream ended after ${raw.consumed} of $len " +
                  "compressed bytes — corrupt member boundary or trailing " +
                  "garbage would silently truncate the record stream")
              bos.toByteArray
            } finally in.close()
          } else {
            val b = new Array[Byte](len.toInt)
            val in = tfs.open(p)
            try in.readFully(0, b) finally in.close()
            b
          }
        parse(buf).zipWithIndex.map { case ((t, uri, body), i) =>
          WarcRecord(p.getName, i.toLong, t, uri, body.length.toLong, body)
        }
      }
      .toDF()
  }

  /** Write a (uri, body) relation as `files` WARC part files — the
    * generic distributed WARC SINK (the fixture writer below is its
    * closed-form twin): each task encodes its partition through the
    * real ISO 28500 encoder and writes one part file via the Hadoop FS
    * API. Record-to-file assignment follows the repartition, so only
    * the record SET is deterministic — exactly what a crawl layout
    * guarantees, and all a set-keyed pipeline may rely on. */
  def writeWarc(recs: DataFrame, uriCol: String, bodyCol: String,
                dir: String, files: Int): Unit = {
    require(files >= 1, "need at least one part file")
    val sc = recs.sparkSession.sparkContext
    val confBc = org.apache.spark.graftshim.GraftCoreShim.broadcastHadoopConf(sc)
    recs.select(org.apache.spark.sql.functions.col(uriCol).cast("string"),
        org.apache.spark.sql.functions.col(bodyCol).cast("binary"))
      .repartition(files)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val rows = it.map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toSeq
        if (rows.nonEmpty) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val p = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.warc")
          val fs = p.getFileSystem(
            org.apache.spark.graftshim.GraftCoreShim.confOf(confBc))
          // output-commit protocol: write to an attempt-unique temp name
          // and rename into place WITH OVERWRITE in one filesystem op —
          // a speculative or zombie attempt of the same partition then
          // never interleaves bytes with the winning attempt's file, and
          // (unlike delete-then-rename) there is no window where a
          // half-dead attempt has deleted the winner's committed file
          // without putting its own in place (ADVICE r14). Last
          // completed attempt wins whole-file, which is safe because
          // every attempt encodes the identical partition.
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".part-$pid%05d.warc.attempt-${tc.taskAttemptId()}")
          val out = fs.create(tmp, true)
          try out.write(encode(rows)) finally out.close()
          val conf = org.apache.spark.graftshim.GraftCoreShim.confOf(confBc)
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            fs.makeQualified(p).toUri, conf)
          try fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          catch { case e: java.io.IOException =>
            fs.delete(tmp, false)
            // dest existing means a concurrent attempt of this same
            // partition already committed its (identical-content) file
            if (!fs.exists(p))
              sys.error(s"writeWarc: rename $tmp -> $p failed: $e")
          }
        }
      }
  }

  /** Deterministic WARC fixture: `files` part files written
    * DISTRIBUTIVELY (one per task through the Hadoop FS API — the same
    * write grain the reader consumes), record i (global, 0-based) =
    * uri `https://example.com/doc<i>`, body = `"warc body text <i> "`
    * repeated `1 + i mod 5` times (ASCII — closed form for an SQL
    * oracle, real bytes through the real encoder). */
  def warcFixture(spark: SparkSession, dir: String, n: Int,
                  files: Int): Unit = {
    val sc = spark.sparkContext
    val confBc = org.apache.spark.graftshim.GraftCoreShim.broadcastHadoopConf(sc)
    val ranges = (0 until files).map { f =>
      (f, n.toLong * f / files, n.toLong * (f + 1) / files)
    }.filter { case (_, lo, hi) => lo < hi }
    sc.parallelize(ranges, math.max(1, ranges.length)).foreach {
      case (f, lo, hi) =>
        val recs = (lo until hi).map { i =>
          val body = (s"warc body text $i " * (1 + (i % 5)).toInt)
            .getBytes("UTF-8")
          (s"https://example.com/doc$i", body)
        }
        val p = new org.apache.hadoop.fs.Path(dir, f"part-$f%05d.warc")
        val fs = p.getFileSystem(
          org.apache.spark.graftshim.GraftCoreShim.confOf(confBc))
        val out = fs.create(p, true)
        try out.write(encode(recs)) finally out.close()
    }
  }
}
