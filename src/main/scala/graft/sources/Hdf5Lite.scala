package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal, dependency-free HDF5 support for 2-D float vector datasets —
  * the S3 twin of the reference's ann-benchmarks ingest
  * (VectorIndex.MainTest/Program.cs:183-260: open file → read a rank-2
  * float dataset's dims → stream row ranges). Everything here is built
  * from the PUBLIC "HDF5 File Format Specification" (superblock
  * version 0, version-1 object headers, old-style symbol-table groups,
  * class-1 IEEE little-endian floats, version-3 CONTIGUOUS data
  * layout — the layout libhdf5 writes for plain `create_dataset`
  * without chunking/compression).
  *
  * Scope is deliberately minimal and LOUD about its edges (the same
  * discipline as the WARC source): chunked or filtered datasets,
  * v2+ superblocks, and non-float classes fail with a clear message
  * telling the user to re-export (e.g. h5py `f.create_dataset(name,
  * data=x)` with no `chunks=`/`compression=` lands in scope). The
  * reader's DATA path is genuinely distributed: the driver parses only
  * the metadata skeleton (a few hundred bytes of headers), then each
  * task seeks into its own row range of the contiguous block via the
  * Hadoop FileSystem API — the fvecs splitter's shape
  * ([[Ingest.readVecs]]) with an HDF5 header walk in front. */
object Hdf5Lite {

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF — HDF5 "undefined address"
  private val Sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
    0x1a, '\n')

  // ===== writer =====

  /** Write a minimal HDF5 file holding one or more rank-2 float
    * datasets with CONTIGUOUS layout (IEEE little-endian float32 by
    * default; `doubles = true` stores float64 — the values upcast
    * exactly). Driver-side by design: the writer exists for fixtures
    * and bounded exports (the i4 fvecs fixture-writer contract); the
    * distributed path is the READER. Rows must be rectangular and
    * non-empty. */
  def write(path: String, datasets: Seq[(String, Array[Array[Float]])],
            doubles: Boolean = false,
            conf: org.apache.hadoop.conf.Configuration =
              new org.apache.hadoop.conf.Configuration()): Unit = {
    require(datasets.nonEmpty, "need at least one dataset")
    datasets.foreach { case (n, rows) =>
      require(n.nonEmpty && !n.contains("/"),
        s"dataset name must be a non-empty root-level name, got '$n'")
      require(rows.nonEmpty && rows.head.nonEmpty &&
        rows.forall(_.length == rows.head.length),
        s"dataset '$n' must be rectangular and non-empty")
    }
    val sorted = datasets.sortBy(_._1) // SNOD entries are name-ordered
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def le64(v: Long): Unit = {
      le32((v & 0xffffffffL).toInt); le32((v >>> 32).toInt)
    }
    def pad8(): Unit = while (bb.size % 8 != 0) bb.write(0)

    // --- local heap data layout: offset 0 = empty string, names at
    // successive 8-aligned offsets
    val nameOff = new Array[Long](sorted.length)
    var off = 8L
    for (i <- sorted.indices) {
      nameOff(i) = off
      off += ((sorted(i)._1.length + 1 + 7) / 8) * 8
    }
    val heapDataSize = off

    // --- address plan (fixed-size metadata blocks, then data)
    val sbAddr = 0L
    val rootOhAddr = 96L                    // superblock v0 is 96 bytes
    val heapHdrAddr = rootOhAddr + 40L      // root OH: 16 prefix + 24 STAB
    val heapDataAddr = heapHdrAddr + 32L
    val btreeAddr = heapDataAddr + heapDataSize
    val snodAddr = btreeAddr + 48L          // 24 hdr + key,child,key
    val snodSize = 8L + sorted.length * 40L
    var cursor = snodAddr + snodSize
    val ohAddr = new Array[Long](sorted.length)
    val dataAddr = new Array[Long](sorted.length)
    val dataSize = new Array[Long](sorted.length)
    val esz = if (doubles) 8L else 4L
    for (i <- sorted.indices) {
      ohAddr(i) = cursor
      cursor += 112L                        // 16 prefix + 3 × 32 messages
      dataAddr(i) = cursor
      val (_, rows) = sorted(i)
      dataSize(i) = rows.length.toLong * rows.head.length * esz
      cursor += dataSize(i)
    }
    val eof = cursor

    // --- superblock v0
    bb.write(Sig)
    bb.write(0); bb.write(0); bb.write(0); bb.write(0) // sb/fs/rg ver + res
    bb.write(0)                                        // shared msg ver
    bb.write(8); bb.write(8); bb.write(0)              // offsets, lengths, res
    le16(4); le16(16)                                  // group leaf/internal k
    le32(0)                                            // consistency flags
    le64(0L); le64(Undef); le64(eof); le64(Undef)      // base, fs, eof, driver
    // root symbol table entry: name offset 0, OH addr, cache type 1
    // (scratch caches the btree + heap addresses, like libhdf5)
    le64(0L); le64(rootOhAddr); le32(1); le32(0)
    le64(btreeAddr); le64(heapHdrAddr)
    // --- root object header v1: one symbol-table message
    bb.write(1); bb.write(0); le16(1); le32(1); le32(24); le32(0)
    le16(0x0011); le16(16); bb.write(0); bb.write(0); bb.write(0); bb.write(0)
    le64(btreeAddr); le64(heapHdrAddr)
    // --- local heap header + data
    bb.write("HEAP".getBytes("US-ASCII")); bb.write(0)
    bb.write(0); bb.write(0); bb.write(0)
    le64(heapDataSize); le64(1L /* H5HL free-list null */); le64(heapDataAddr)
    val heapStart = bb.size
    bb.write(0); pad8()
    for (i <- sorted.indices) {
      bb.write(sorted(i)._1.getBytes("US-ASCII")); bb.write(0); pad8()
    }
    require(bb.size - heapStart == heapDataSize, "heap layout drifted")
    // --- group B-tree v1, one leaf pointing at one SNOD
    bb.write("TREE".getBytes("US-ASCII")); bb.write(0); bb.write(0)
    le16(1); le64(Undef); le64(Undef)
    le64(0L); le64(snodAddr); le64(nameOff.last)
    // --- SNOD
    bb.write("SNOD".getBytes("US-ASCII")); bb.write(1); bb.write(0)
    le16(sorted.length)
    for (i <- sorted.indices) {
      le64(nameOff(i)); le64(ohAddr(i)); le32(0); le32(0)
      le64(0L); le64(0L) // scratch
    }
    // --- per dataset: object header (dataspace, datatype, layout) + data
    for (i <- sorted.indices) {
      require(bb.size.toLong == ohAddr(i), s"OH address drifted for $i")
      val (_, rows) = sorted(i)
      bb.write(1); bb.write(0); le16(3); le32(1); le32(96); le32(0)
      // dataspace v1: rank 2, no max dims
      le16(0x0001); le16(24); le32(0)
      bb.write(1); bb.write(2); bb.write(0)
      for (_ <- 0 until 5) bb.write(0)
      le64(rows.length.toLong); le64(rows.head.length.toLong)
      // datatype: class 1 float, IEEE f32/f64 LE
      le16(0x0003); le16(24); le32(0)
      bb.write(0x11)              // version 1, class 1
      // bit field: LE, msb-set mantissa norm, sign bit location
      bb.write(0x20); bb.write(if (doubles) 63 else 31); bb.write(0x00)
      le32(esz.toInt)             // size
      le16(0); le16(esz.toInt * 8)             // bit offset, precision
      bb.write(if (doubles) 52 else 23)        // exponent location
      bb.write(if (doubles) 11 else 8)         // exponent size
      bb.write(0)                              // mantissa location
      bb.write(if (doubles) 52 else 23)        // mantissa size
      le32(if (doubles) 1023 else 127)         // exponent bias
      le32(0)                     // pad to 24
      // data layout v3, contiguous
      le16(0x0008); le16(24); le32(0)
      bb.write(3); bb.write(1)
      le64(dataAddr(i)); le64(dataSize(i))
      for (_ <- 0 until 6) bb.write(0) // pad 18 -> 24
      // raw data
      val buf = java.nio.ByteBuffer.allocate(rows.head.length * esz.toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        buf.clear()
        if (doubles) r.foreach(x => buf.putDouble(x.toDouble))
        else r.foreach(buf.putFloat)
        bb.write(buf.array())
      }
    }
    require(bb.size.toLong == eof, "file layout drifted")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(conf)
    val out = fs.create(hPath, true)
    try out.write(bb.toByteArray) finally out.close()
  }

  // ===== reader =====

  /** Parsed skeleton of one contiguous rank-2 float dataset. */
  final case class DatasetMeta(rows: Long, dim: Int, elemSize: Int,
                               dataAddr: Long)

  private final class Cursor(val bytes: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = (u16().toLong | (u16().toLong << 16)) & 0xffffffffL
    def i64(): Long = u32() | (u32() << 32)
    def skip(n: Int): Unit = pos += n
    def ascii(n: Int): String = {
      val s = new String(bytes, pos, n, "US-ASCII"); pos += n; s
    }
  }

  private def readAt(in: org.apache.hadoop.fs.FSDataInputStream,
                     addr: Long, n: Int): Cursor = {
    val buf = new Array[Byte](n)
    in.readFully(addr, buf)
    new Cursor(buf, 0)
  }

  /** Driver-side metadata walk: superblock → root group symbol table →
    * named dataset's object header → (rows, dim, elemSize, dataAddr).
    * Loud on every unsupported feature. */
  def datasetMeta(spark: SparkSession, path: String,
                  dataset: String): DatasetMeta = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    try datasetMetaFrom(in, dataset, path)
    finally in.close()
  }

  private def datasetMetaFrom(in: org.apache.hadoop.fs.FSDataInputStream,
                              dataset: String, path: String): DatasetMeta = {
    val sb = readAt(in, 0L, 96)
    require(sb.bytes.take(8).sameElements(Sig),
      s"$path is not an HDF5 file (bad signature)")
    sb.skip(8)
    val sbVer = sb.u8()
    require(sbVer <= 1,
      s"superblock version $sbVer unsupported (v0/v1 only — re-export " +
        "with libver='earliest')")
    sb.skip(4) // fs ver, rg ver, res, shared ver
    require(sb.u8() == 8 && sb.u8() == 8,
      "only 8-byte offsets/lengths are supported")
    sb.skip(1) // reserved
    sb.skip(4) // group ks
    if (sbVer == 1) sb.skip(4) // indexed-storage k + reserved
    sb.skip(4) // consistency flags
    val base = sb.i64()
    require(base == 0L, s"non-zero base address $base unsupported")
    sb.skip(24) // fs addr, eof, driver
    sb.skip(8)  // root entry: link name offset
    val rootOh = sb.i64()

    // root group: symbol-table message
    val rootMsgs = readV1Messages(in, rootOh)
    val stab = rootMsgs.find(_._1 == 0x0011).getOrElse(
      sys.error(s"$path: root group has no symbol table " +
        "(new-style groups unsupported — re-export with libver='earliest')"))
    val stabC = new Cursor(stab._2, 0)
    val btreeAddr = stabC.i64()
    val heapAddr = stabC.i64()

    // local heap: data segment address
    val hh = readAt(in, heapAddr, 32)
    require(hh.ascii(4) == "HEAP", s"$path: bad local heap signature")
    hh.skip(4)
    val heapSize = hh.i64()
    hh.skip(8)
    val heapData = hh.i64()
    val heap = readAt(in, heapData, heapSize.toInt)

    def heapName(noff: Long): String = {
      var e = noff.toInt
      while (e < heap.bytes.length && heap.bytes(e) != 0) e += 1
      new String(heap.bytes, noff.toInt, e - noff.toInt, "US-ASCII")
    }

    // group btree walk (recursing through internal nodes)
    def findInBtree(addr: Long): Option[Long] = {
      val hdr = readAt(in, addr, 24)
      require(hdr.ascii(4) == "TREE", s"$path: bad B-tree signature")
      val nodeType = hdr.u8()
      require(nodeType == 0, s"$path: unexpected B-tree node type $nodeType")
      val level = hdr.u8()
      val entries = hdr.u16()
      val kv = readAt(in, addr + 24L, (2 * entries + 1) * 8)
      var found: Option[Long] = None
      for (i <- 0 until entries if found.isEmpty) {
        kv.pos = (2 * i + 1) * 8
        val child = kv.i64()
        found =
          if (level > 0) findInBtree(child)
          else { // SNOD leaf
            val sh = readAt(in, child, 8)
            require(sh.ascii(4) == "SNOD", s"$path: bad SNOD signature")
            sh.skip(2)
            val n = sh.u16()
            val ents = readAt(in, child + 8L, n * 40)
            var hit: Option[Long] = None
            for (j <- 0 until n if hit.isEmpty) {
              ents.pos = j * 40
              val noff = ents.i64()
              val oh = ents.i64()
              if (heapName(noff) == dataset) hit = Some(oh)
            }
            hit
          }
      }
      found
    }

    val ohAddr = findInBtree(btreeAddr).getOrElse(
      sys.error(s"$path: dataset '$dataset' not found in the root group"))

    val msgs = readV1Messages(in, ohAddr)
    def msg(t: Int, what: String): Array[Byte] =
      msgs.find(_._1 == t).map(_._2).getOrElse(
        sys.error(s"$path: dataset '$dataset' has no $what message"))

    // dataspace (v1 or v2): rank-2 dims
    val ds = new Cursor(msg(0x0001, "dataspace"), 0)
    val dsVer = ds.u8()
    val rank = ds.u8()
    require(rank == 2,
      s"$path: dataset '$dataset' has rank $rank, need a rank-2 matrix " +
        "(the reference reads 2-D vector tables, Program.cs:196-199)")
    if (dsVer == 1) { ds.skip(1); ds.skip(5) } // flags + reserved
    else if (dsVer == 2) { ds.skip(1); ds.skip(1) } // flags + type
    else sys.error(s"$path: dataspace version $dsVer unsupported")
    val rows = ds.i64()
    val dim = ds.i64()
    require(dim > 0 && dim <= (1 << 24), s"implausible dim $dim")

    // datatype: class 1 float, little-endian, 4 or 8 bytes
    val dt = new Cursor(msg(0x0003, "datatype"), 0)
    val cv = dt.u8()
    val cls = cv & 0x0f
    require(cls == 1,
      s"$path: dataset '$dataset' has datatype class $cls, only class 1 " +
        "(IEEE float) is supported")
    val bits0 = dt.u8()
    require((bits0 & 1) == 0,
      s"$path: big-endian floats unsupported (re-export little-endian)")
    dt.skip(2)
    val esz = dt.u32().toInt
    require(esz == 4 || esz == 8,
      s"$path: float size $esz unsupported (float32/float64 only)")

    // layout: v3/v4 contiguous
    val lo = new Cursor(msg(0x0008, "data layout"), 0)
    val loVer = lo.u8()
    require(loVer == 3 || loVer == 4,
      s"$path: data layout version $loVer unsupported " +
        "(re-export without chunking)")
    val loCls = lo.u8()
    require(loCls == 1,
      s"$path: layout class $loCls unsupported — only CONTIGUOUS " +
        "datasets are in scope (chunked/compressed HDF5: re-export with " +
        "h5py create_dataset(..., chunks=None, compression=None), or " +
        "convert to fvecs)")
    val dataAddr = lo.i64()
    require(dataAddr != Undef,
      s"$path: dataset '$dataset' has no allocated data")
    DatasetMeta(rows, dim.toInt, esz, dataAddr)
  }

  /** v1 object-header message walk (with 0x0010 continuations):
    * returns (type, body) pairs. */
  private def readV1Messages(in: org.apache.hadoop.fs.FSDataInputStream,
                             addr: Long): Seq[(Int, Array[Byte])] = {
    val head = readAt(in, addr, 16)
    val ver = head.u8()
    require(ver == 1,
      s"object header version $ver unsupported (v2 'OHDR' — re-export " +
        "with libver='earliest')")
    head.skip(1)
    var remaining = head.u16()
    head.skip(4)
    val hdrSize = head.u32()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var blocks = List((addr + 16L, hdrSize))
    while (remaining > 0 && blocks.nonEmpty) {
      val (bAddr, bLen) = blocks.head
      blocks = blocks.tail
      val c = readAt(in, bAddr, bLen.toInt)
      var go = true
      while (go && remaining > 0 && c.pos + 8 <= bLen.toInt) {
        val typ = c.u16()
        val sz = c.u16()
        c.skip(4)
        if (c.pos + sz > bLen.toInt) go = false
        else {
          val body = new Array[Byte](sz)
          System.arraycopy(c.bytes, c.pos, body, 0, sz)
          c.skip(sz)
          remaining -= 1
          if (typ == 0x0010) { // continuation: (offset, length)
            val cc = new Cursor(body, 0)
            blocks = blocks :+ ((cc.i64(), cc.i64()))
          } else out += ((typ, body))
        }
      }
    }
    out.toSeq
  }

  /** Distributed read of a contiguous rank-2 float dataset:
    * (id = row ordinal, vector) with the fvecs splitter's task shape —
    * record-aligned byte ranges, one seek per task, ~64 MB split
    * ceiling. float32 datasets land as ARRAY<FLOAT> exactly; float64 as
    * ARRAY<DOUBLE> exactly. */
  def readHdf5(spark: SparkSession, path: String, dataset: String,
               minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val meta = datasetMeta(spark, path, dataset)
    val sc = spark.sparkContext
    val recSize = meta.dim.toLong * meta.elemSize
    val byParallelism = if (minPartitions > 0) minPartitions.toLong
                        else sc.defaultParallelism.toLong
    val parts = math.max(1L, math.min(math.max(meta.rows, 1L),
      math.max(byParallelism,
        meta.rows * recSize / (64L << 20)))).toInt
    val ranges = (0 until parts).map { p =>
      (meta.rows * p / parts, meta.rows * (p + 1) / parts)
    }.filter { case (lo, hi) => lo < hi }
    val confBc = org.apache.spark.graftshim.GraftCoreShim.broadcastHadoopConf(sc)
    def ranged[T: scala.reflect.ClassTag](
        parse: java.nio.ByteBuffer => T): org.apache.spark.rdd.RDD[(Long, T)] =
      sc.parallelize(ranges, math.max(1, ranges.length)).flatMap {
        case (lo, hi) =>
          val p = new org.apache.hadoop.fs.Path(path)
          val tfs = p.getFileSystem(
            org.apache.spark.graftshim.GraftCoreShim.confOf(confBc))
          val in = tfs.open(p)
          try {
            in.seek(meta.dataAddr + lo * recSize)
            val buf = new Array[Byte](recSize.toInt)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, T)]
            var r = lo
            while (r < hi) {
              in.readFully(buf)
              out += ((r, parse(java.nio.ByteBuffer.wrap(buf)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN))))
              r += 1
            }
            out.iterator
          } finally in.close()
      }
    if (meta.elemSize == 4)
      ranged { bb =>
        val v = new Array[Float](meta.dim)
        var i = 0; while (i < meta.dim) { v(i) = bb.getFloat(); i += 1 }; v
      }.toDF("id", "vector")
    else
      ranged { bb =>
        val v = new Array[Double](meta.dim)
        var i = 0; while (i < meta.dim) { v(i) = bb.getDouble(); i += 1 }; v
      }.toDF("id", "vector")
  }

  /** Dataset extent without reading data — the reference's
    * GetHdf5DatasetSize twin (Program.cs:183-219). */
  def datasetSize(spark: SparkSession, path: String,
                  dataset: String): (Long, Int) = {
    val m = datasetMeta(spark, path, dataset)
    (m.rows, m.dim)
  }
}
