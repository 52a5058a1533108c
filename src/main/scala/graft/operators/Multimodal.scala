package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.security.MessageDigest

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque BINARY columns + typed metadata;
  * decode / feature-extraction runs batch-wise inside `mapPartitions`
  * (the JVM analog of pandas-batch UDFs: one codec instance per
  * partition, rows streamed through it).
  *
  * All three modalities decode REAL bytes: `decodeImage` parses
  * PNG/BMP/JPEG with javax.imageio (in every JVM) and extracts
  * dimensions + mean-color / quadrant-luma features; `decodeAudio`
  * parses WAV with javax.sound.sampled and aggregates the PCM stream
  * (`extractAudioFeatures`); `decodeVideo` parses YUV4MPEG2 (y4m) —
  * the standard UNCOMPRESSED container (no compressed-codec library
  * exists in this environment, so y4m is the honest real-video member;
  * a compressed codec would swap into `decodeVideo` without touching
  * anything downstream). `decodeStub` (payload-SHA pseudo-features)
  * remains only as the fallback for undecodable bytes in the MIXED
  * media table (m3). The Spark-side plumbing — schema, partition
  * batching, feature shape, join-back — is identical for all three. */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           sha: String, width: Int, height: Int,
                           n_frames: Int, feature: Array[Float])

  /** Hex digit value (0-15) at 1-based position `i` of a hex string. */
  private def hexAt(s: String, i: Int): Int =
    "0123456789abcdef".indexOf(s.charAt(i - 1))

  private def sha256Hex(payload: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString

  /** STUB decoder: deterministic pseudo-metadata from the payload hash.
    * A real implementation would decode the codec here; everything
    * downstream (schema, batching, consumers) is unchanged. */
  def decodeStub(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
    val sha = sha256Hex(payload)
    val width = 64 + hexAt(sha, 1) * 16 + hexAt(sha, 2)
    val height = 64 + hexAt(sha, 3) * 16 + hexAt(sha, 4)
    val frames = if (kind == "video") 1 + hexAt(sha, 5) else 1
    val feature = (0 until 8).map { j =>
      (hexAt(sha, 2 * j + 1) * 16 + hexAt(sha, 2 * j + 2)) / 255.0f
    }.toArray
    MediaFeatures(id, kind, payload.length.toLong, sha, width, height,
      frames, feature)
  }

  /** REAL image decode: parse the payload with javax.imageio. Feature
    * layout (8 floats): mean R, G, B in [0,1]; mean luma of the 4
    * quadrants (TL, TR, BL, BR) scaled to [0,1]; width/height aspect.
    * Returns None when the bytes aren't a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        val quad = new Array[Long](4)
        val qcnt = new Array[Long](4)
        // bulk row fetch: per-pixel getRGB does a color-model convert +
        // bounds check per call and is ~10x slower on large images
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sr += r; sg += g; sb += b
            val qi = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
            quad(qi) += (r + g + b)
            qcnt(qi) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val feature = Array(
          (sr.toDouble / n / 255d).toFloat,
          (sg.toDouble / n / 255d).toFloat,
          (sb.toDouble / n / 255d).toFloat,
          (quad(0).toDouble / math.max(qcnt(0), 1) / 765d).toFloat,
          (quad(1).toDouble / math.max(qcnt(1), 1) / 765d).toFloat,
          (quad(2).toDouble / math.max(qcnt(2), 1) / 765d).toFloat,
          (quad(3).toDouble / math.max(qcnt(3), 1) / 765d).toFloat,
          w.toFloat / h.toFloat)
        Some((w, h, feature))
      }
    } catch { case _: Exception => None }

  /** Decode one media row: images go through the real imageio decoder,
    * video through the real y4m decoder (each falling back to the stub
    * when the bytes aren't decodable); audio rows in the MIXED media
    * table use the stub here — the typed audio path is
    * [[extractAudioFeatures]] (WAV via javax.sound.sampled). */
  def decode(id: Long, kind: String, payload: Array[Byte]): MediaFeatures =
    if (kind == "image")
      decodeImage(payload) match {
        case Some((w, h, feature)) =>
          MediaFeatures(id, kind, payload.length.toLong, sha256Hex(payload),
            w, h, 1, feature)
        case None => decodeStub(id, kind, payload)
      }
    else if (kind == "video")
      decodeVideo(payload) match {
        case Some((w, h, fn, fd, frames)) if frames.nonEmpty =>
          val sha = sha256Hex(payload)
          val plane = w * h
          var sy = 0L
          frames.foreach { f =>
            var i = 0
            while (i < plane) { sy += f(i) & 0xff; i += 1 }
          }
          val meanY = (sy.toDouble / (frames.length.toLong * plane) / 255d)
            .toFloat
          MediaFeatures(id, kind, payload.length.toLong, sha, w, h,
            frames.length,
            Array(meanY, fn.toFloat / fd, frames.length.toFloat,
              w.toFloat / h, 0f, 0f, 0f, 0f))
        case _ => decodeStub(id, kind, payload)
      }
    else decodeStub(id, kind, payload)

  /** Real image RESIZE (decode → Graphics2D nearest-neighbour scale →
    * PNG re-encode). Nearest-neighbour is the deterministic choice: the
    * output pixels are exact source samples, so closed-form fixtures
    * stay closed-form through the resize (a solid image stays exactly
    * solid) and no interpolation-rounding varies by JVM. Returns None
    * for undecodable payloads — callers fall back like [[decode]]. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    // parameter errors must be loud: the catch below is for undecodable
    // PAYLOADS, and swallowing BufferedImage's IllegalArgumentException
    // for w/h <= 0 would turn the whole batch into a silent no-op
    require(w >= 1 && h >= 1, s"resize target must be >= 1x1, got ${w}x$h")
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }
  }

  /** Batch resize over a media table — the same mapPartitions batch
    * shape as [[extractFeatures]] (one decoder per partition, payloads
    * stream through; the pattern a real codec/model pipeline needs).
    * Undecodable payloads pass through unchanged. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    require(w >= 1 && h >= 1, s"resize target must be >= 1x1, got ${w}x$h")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "image") r
        else resizeImage(r.payload, w, h) match {
          case Some(p) => r.copy(payload = p)
          case None => r
        }
      }
    }
  }

  /** Batch feature extraction over a media table: mapPartitions keeps one
    * decoder per partition; input batches stream through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, model…)
      rows.map(r => decode(r.media_id, r.kind, r.payload))
    }
  }

  /** Deterministic solid-color PNG table (REAL bytes, real decode
    * targets), generated distributively: id → (16 + id mod 32) ×
    * (16 + 3·id mod 32) pixels, RGB = (7·id, 13·id, 29·id) mod 256.
    * The closed-form rule is what an SQL oracle can predict — decoding
    * these through imageio proves the decoder round-trips real PNGs. */
  def imageTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = 16 + (id % 32).toInt
        val h = 16 + ((3 * id) % 32).toInt
        val rgb = (((7 * id) % 256).toInt << 16) |
          (((13 * id) % 256).toInt << 8) | ((29 * id) % 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, "image", bos.toByteArray)
      }
    }
  }

  case class AudioFeatures(media_id: Long, n_bytes: Long, sample_rate: Int,
                           channels: Int, bits: Int, n_samples: Int,
                           mean_amp: Float, rms_amp: Float,
                           max_amp: Int, min_amp: Int)

  /** REAL audio decode: parse WAV bytes with javax.sound.sampled (in
    * every JVM — no external codec library). Returns the format header
    * (sample rate, channels, bit depth) and the decoded 16-bit PCM
    * samples; None when the bytes aren't a decodable 16-bit-LE WAV. */
  def decodeAudio(payload: Array[Byte]): Option[(Float, Int, Int, Array[Int])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
      else {
        val bytes = ais.readAllBytes()
        // a PCM stream truncated mid-sample is corrupt — reject like
        // any other undecodable payload instead of dropping the
        // dangling byte and reporting stats over a shortened stream
        if (bytes.length % 2 != 0) return None
        val n = bytes.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
          i += 1
        }
        Some((fmt.getSampleRate, fmt.getChannels, fmt.getSampleSizeInBits,
          samples))
      }
    } catch { case _: Exception => None }

  /** Batch audio feature extraction (same mapPartitions shape as
    * extractFeatures): decode each WAV payload and aggregate the PCM
    * stream — mean / RMS / extrema amplitudes, all exact-integer sums
    * divided once in double, so an SQL oracle reproduces them bit for
    * bit. Non-decodable payloads are dropped. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // a decodable WAV with an empty data chunk would divide by zero
        // below (NaN mean/rms, Int.MinValue extrema) — such payloads are
        // dropped like non-decodable ones, per the documented contract
        decodeAudio(r.payload).filter(_._4.nonEmpty).map { case (rate, ch, bits, samples) =>
          var sum = 0L; var sumSq = 0L
          var mx = Int.MinValue; var mn = Int.MaxValue
          var i = 0
          while (i < samples.length) {
            val s = samples(i)
            sum += s; sumSq += s.toLong * s
            if (s > mx) mx = s
            if (s < mn) mn = s
            i += 1
          }
          val n = samples.length
          AudioFeatures(r.media_id, r.payload.length.toLong, rate.toInt, ch,
            bits, n, (sum.toDouble / n).toFloat,
            math.sqrt(sumSq.toDouble / n).toFloat, mx, mn)
        }
      }
    }
  }

  case class AudioFrameFeatures(media_id: Long, frame_idx: Int, n: Int,
                                mean_amp: Float, rms_amp: Float,
                                n_zero_cross: Int)

  /** Per-WINDOW audio features — the framing step every audio-training
    * pipeline runs before featurization (spectrograms, VAD, silence
    * trimming): the decoded PCM stream cut into consecutive windows of
    * `frameLen` PCM frames (the last window may be partial), each
    * reporting its sample count, mean, RMS and zero-crossing count.
    * Mean and RMS aggregate ALL interleaved samples of the window
    * (channel-agnostic energy, like [[extractAudioFeatures]]); zero
    * crossings are counted PER channel on consecutive same-channel
    * samples within the window (strict sign product < 0 — a zero
    * sample breaks a run without counting) and summed, so interleaving
    * can't fabricate crossings. Exact-integer sums divided once in
    * double, same as m5, so an SQL oracle reproduces the floats bit
    * for bit. Non-decodable / empty payloads are dropped (the m5
    * contract); per-row flatMap, no shuffle. */
  def audioFrameFeatures(media: Dataset[MediaRow],
                         frameLen: Int): Dataset[AudioFrameFeatures] = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudio(r.payload).filter(_._4.nonEmpty).toSeq.flatMap {
          case (_, ch, _, samples) =>
            val win = frameLen * ch
            (0 until (samples.length + win - 1) / win).map { f =>
              val lo = f * win
              val hi = math.min(lo + win, samples.length)
              var sum = 0L; var sumSq = 0L
              var i = lo
              while (i < hi) {
                val s = samples(i)
                sum += s; sumSq += s.toLong * s
                i += 1
              }
              var zc = 0
              var j = lo + ch
              while (j < hi) {
                if (samples(j - ch).toLong * samples(j) < 0L) zc += 1
                j += 1
              }
              val n = hi - lo
              AudioFrameFeatures(r.media_id, f, n,
                (sum.toDouble / n).toFloat,
                math.sqrt(sumSq.toDouble / n).toFloat, zc)
            }
        }
      }
    }
  }

  /** Deterministic 16-bit PCM WAV table (REAL bytes through the real
    * javax.sound.sampled encoder), generated distributively. Closed form
    * in the id — samples s_k = ((31·id + 17·k) mod 2001) − 1000 for
    * k < 64 + id mod 128, rate 8000 + (id mod 8)·1000 Hz, mono — so an
    * SQL oracle predicts the decoded round trip exactly (the audio twin
    * of imageTable's PNGs). */
  /** Pack interleaved 16-bit samples and re-encode as a WAV byte stream
    * — the one write path shared by [[audioTable]] and
    * [[decimateAudio]]. */
  private def encodeWav(samples: Array[Int], rate: Float,
                        channels: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var k = 0
    while (k < samples.length) {
      pcm(2 * k) = (samples(k) & 0xff).toByte
      pcm(2 * k + 1) = ((samples(k) >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      (samples.length / channels).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def audioTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val nS = 64 + (id % 128).toInt
        val rate = 8000 + (id % 8).toInt * 1000
        val samples = new Array[Int](nS)
        var k = 0
        while (k < nS) {
          samples(k) = (((31 * id + 17 * k) % 2001) - 1000).toInt
          k += 1
        }
        MediaRow(id, "audio", encodeWav(samples, rate.toFloat, 1))
      }
    }
  }

  /** Real audio DOWNSAMPLE by integer decimation (every `factor`-th PCM
    * sample, rate divided accordingly) through a full WAV re-encode —
    * the audio twin of [[resizeImages]]. Plain decimation (no low-pass)
    * is the deterministic choice: output samples are exact source
    * samples, so closed-form fixtures stay closed-form (an anti-alias
    * filter would be the production upgrade; it changes values, not the
    * pipeline shape). Decimation is per FRAME, so multi-channel audio
    * keeps its channels aligned (every factor-th frame of ch interleaved
    * samples survives). Non-DECODABLE payloads pass through unchanged;
    * decodable audio whose integer sample rate `factor` doesn't divide
    * fails loudly — a silently-fractional rate would be truncated into
    * a wrong WAV header. */
  def decimateAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "audio") r
        else decodeAudio(r.payload) match {
          case Some((rate, ch, _, samples)) if ch >= 1 && samples.nonEmpty &&
              samples.length % ch == 0 =>
            require(rate == rate.toInt.toFloat && rate.toInt % factor == 0,
              s"decimateAudio: factor $factor must divide the integer " +
                s"sample rate, got $rate Hz")
            val nFrames = samples.length / ch
            val kept = Array.range(0, nFrames, factor)
            val dec = new Array[Int](kept.length * ch)
            var k = 0
            while (k < kept.length) {
              var c = 0
              while (c < ch) {
                dec(k * ch + c) = samples(kept(k) * ch + c)
                c += 1
              }
              k += 1
            }
            r.copy(payload =
              encodeWav(dec, (rate.toInt / factor).toFloat, ch))
          case _ => r
        }
      }
    }
  }

  // --- video: REAL y4m (YUV4MPEG2) container codec ------------------
  // YUV4MPEG2 is the standard uncompressed video interchange format
  // (ffmpeg/mjpegtools): a one-line ASCII header, then per frame a
  // FRAME marker + raw planar YUV bytes. Fully parseable in pure JVM —
  // the honest "real video" member for an environment with no
  // compressed-codec libraries (decode is real byte-stream parsing; a
  // compressed codec would change decodeVideo only, nothing downstream).

  case class VideoFeatures(media_id: Long, n_bytes: Long, width: Int,
                           height: Int, fps_num: Int, fps_den: Int,
                           n_frames: Int, mean_y: Float, mean_u: Float,
                           mean_v: Float, first_y: Float, last_y: Float)

  /** Encode frames as a YUV4MPEG2 C444 stream. Each frame is the three
    * concatenated planes (Y then U then V, `w*h` bytes each). */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && fpsNum > 0 && fpsDen > 0)
    require(frames.forall(_.length == 3 * w * h),
      s"each C444 frame must be 3*$w*$h bytes")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C444\n"
      .getBytes("US-ASCII"))
    val marker = "FRAME\n".getBytes("US-ASCII")
    frames.foreach { f => bos.write(marker); bos.write(f) }
    bos.toByteArray
  }

  /** REAL video decode: parse a YUV4MPEG2 byte stream — header tags
    * (any order), then FRAME-delimited planar payloads. Accepts the
    * C444 colorspace (the encoder's) and C420 — the format's DEFAULT
    * (untagged streams and the C420/C420jpeg/C420mpeg2/C420paldv
    * variants, which share the plane layout and differ only in chroma
    * siting, irrelevant to plane statistics). C420 chroma is
    * normalized to full resolution by 2×2 replication so every
    * returned frame is C444-layout (3·w·h bytes) — replication is
    * mean-preserving (each chroma sample weighted uniformly), so
    * downstream features are exact either way. Anything else — wrong
    * magic, unknown colorspace, odd dims for 420, truncated frame —
    * returns None, like the image/audio decoders on undecodable
    * bytes. */
  def decodeVideo(payload: Array[Byte])
      : Option[(Int, Int, Int, Int, Seq[Array[Byte]])] =
    try {
      val nl = payload.indexOf('\n'.toByte)
      if (nl < 0) return None
      val header = new String(payload, 0, nl, "US-ASCII")
      val toks = header.split(" ")
      if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
      var w = -1; var h = -1; var fn = -1; var fd = -1
      var cs = "C420" // the y4m default when untagged
      toks.drop(1).foreach { t =>
        if (t.nonEmpty) t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'F' =>
            val p = t.substring(1).split(":")
            fn = p(0).toInt; fd = p(1).toInt
          case 'C' => cs = t
          case _ => () // I (interlace), A (aspect), X (extensions)
        }
      }
      val is444 = cs == "C444"
      val is420 = cs.startsWith("C420")
      if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
      if (!is444 && !is420) return None
      if (is420 && (w % 2 != 0 || h % 2 != 0)) return None
      // cap the frame geometry BEFORE the Int multiply: W65536 H65536
      // would wrap w*h to 0, "decode" zero-byte frames and emit NaN
      // features instead of rejecting the stream
      if (w.toLong * h > Int.MaxValue / 4) return None
      val plane = w * h
      val qw = w / 2
      val frameLen = if (is444) 3 * plane else plane + 2 * qw * (h / 2)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = nl + 1
      while (pos < payload.length) {
        // FRAME marker line (may carry parameters up to its newline)
        var e = pos
        while (e < payload.length && payload(e) != '\n'.toByte) e += 1
        if (e >= payload.length) return None
        val marker = new String(payload, pos, e - pos, "US-ASCII")
        if (!marker.startsWith("FRAME")) return None
        if (e + 1 + frameLen > payload.length) return None // truncated
        val raw = java.util.Arrays.copyOfRange(payload, e + 1,
          e + 1 + frameLen)
        frames += (if (is444) raw else upsample420(raw, w, h))
        pos = e + 1 + frameLen
      }
      Some((w, h, fn, fd, frames.toSeq))
    } catch { case _: Exception => None }

  /** 2×2 nearest-neighbour chroma upsample: C420 planar frame →
    * C444-layout (Y copied, each U/V sample replicated to its 2×2
    * luma block). */
  private def upsample420(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val plane = w * h
    val qw = w / 2
    val out = new Array[Byte](3 * plane)
    System.arraycopy(raw, 0, out, 0, plane)
    var c = 0 // 0 = U, 1 = V
    while (c < 2) {
      val srcOff = plane + c * qw * (h / 2)
      val dstOff = plane * (1 + c)
      var y = 0
      while (y < h) {
        val srcRow = srcOff + (y / 2) * qw
        var x = 0
        while (x < w) {
          out(dstOff + y * w + x) = raw(srcRow + x / 2)
          x += 1
        }
        y += 1
      }
      c += 1
    }
    out
  }

  /** Batch video feature extraction (the mapPartitions batch shape of
    * extractFeatures/extractAudioFeatures): decode each y4m payload and
    * aggregate the pixel stream — mean Y/U/V over all frames plus the
    * first/last frame's mean luma, exact-integer sums divided once in
    * double so the SQL oracle reproduces them bit for bit. Payloads
    * that aren't decodable y4m (C444 or C420 — the [[decodeVideo]]
    * contract) or have zero frames are dropped. */
  def extractVideoFeatures(media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeVideo(r.payload).filter(_._5.nonEmpty).map {
          case (w, h, fn, fd, frames) =>
            val plane = w * h
            var sy = 0L; var su = 0L; var sv = 0L
            frames.foreach { f =>
              var i = 0
              while (i < plane) { sy += f(i) & 0xff; i += 1 }
              while (i < 2 * plane) { su += f(i) & 0xff; i += 1 }
              while (i < 3 * plane) { sv += f(i) & 0xff; i += 1 }
            }
            def frameMeanY(f: Array[Byte]): Float = {
              var s = 0L; var i = 0
              while (i < plane) { s += f(i) & 0xff; i += 1 }
              (s.toDouble / plane).toFloat
            }
            val n = frames.length.toLong * plane
            VideoFeatures(r.media_id, r.payload.length.toLong, w, h, fn, fd,
              frames.length,
              (sy.toDouble / n).toFloat, (su.toDouble / n).toFloat,
              (sv.toDouble / n).toFloat,
              frameMeanY(frames.head), frameMeanY(frames.last))
        }
      }
    }
  }

  /** REAL per-frame sampling: decode the y4m stream and emit every
    * `everyK`-th frame as (media_id, frame_idx, mean_y) — the video
    * twin of resizeImages/decimateAudio (a real transform over decoded
    * content, not metadata arithmetic). Non-decodable payloads drop. */
  def sampleVideoFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeVideo(r.payload).toSeq.flatMap { case (w, h, _, _, frames) =>
          val plane = w * h
          Range(0, frames.length, everyK).map { idx =>
            val f = frames(idx)
            var s = 0L; var i = 0
            while (i < plane) { s += f(i) & 0xff; i += 1 }
            (r.media_id, idx, (s.toDouble / plane).toFloat)
          }
        }
      }
    }.toDF("media_id", "frame_idx", "mean_y")
  }

  /** Deterministic C444 y4m table (REAL bytes through the real y4m
    * encoder), generated distributively — the video twin of imageTable's
    * PNGs. Closed form in the id: (8 + id mod 16) × (8 + 3·id mod 16)
    * pixels, 2 + id mod 7 frames at (10 + id mod 5):1 fps; frame f is
    * solid Y = (11·id + 37·f) mod 256, U = (5·id + 13·f) mod 256,
    * V = (3·id + 29·f) mod 256 — so an SQL oracle predicts the decoded
    * round trip exactly. */
  def videoTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + ((3 * id) % 16).toInt
        val nF = 2 + (id % 7).toInt
        val fps = 10 + (id % 5).toInt
        val plane = w * h
        val frames = (0 until nF).map { f =>
          val bytes = new Array[Byte](3 * plane)
          java.util.Arrays.fill(bytes, 0, plane,
            ((11 * id + 37 * f) % 256).toByte)
          java.util.Arrays.fill(bytes, plane, 2 * plane,
            ((5 * id + 13 * f) % 256).toByte)
          java.util.Arrays.fill(bytes, 2 * plane, 3 * plane,
            ((3 * id + 29 * f) % 256).toByte)
          bytes
        }
        MediaRow(id, "video", encodeY4m(w, h, fps, 1, frames))
      }
    }
  }

  /** Deterministic frame sampling for video stand-ins: every k-th frame
    * index up to n_frames (generator — no shuffle). */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val spark = features.sparkSession
    import spark.implicits._
    features.toDF()
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK)))
          .as("frame_idx"))
  }

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — the
    * environment has no real media files; the plumbing is identical. */
  def mediaFromText(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("media_id"),
        when(col(idCol) % 3 === 0, lit("image"))
          .when(col(idCol) % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("kind"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRow]
  }
}
