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
  * Image decode is REAL: `decodeImage` parses PNG/BMP/JPEG bytes with
  * javax.imageio (in every JVM) and extracts dimensions + mean-color /
  * quadrant-luma features. Audio decode is REAL too: `decodeAudio`
  * parses WAV bytes with javax.sound.sampled and aggregates the PCM
  * stream (`extractAudioFeatures`). Video stays STUBBED (`decodeStub`
  * derives deterministic pseudo-features from the payload's SHA-256 — no
  * video codec in this environment); the Spark-side plumbing — schema,
  * partition batching, feature shape, join-back — is identical for all
  * three, so further codecs drop in without touching the plan. */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           sha: String, width: Int, height: Int,
                           n_frames: Int, feature: Array[Float])

  /** Hex digit value (0-15) at 1-based position `i` of a hex string. */
  private def hexAt(s: String, i: Int): Int =
    "0123456789abcdef".indexOf(s.charAt(i - 1))

  /** STUB decoder: deterministic pseudo-metadata from the payload hash.
    * A real implementation would decode the codec here; everything
    * downstream (schema, batching, consumers) is unchanged. */
  def decodeStub(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
    val md = MessageDigest.getInstance("SHA-256")
    val sha = md.digest(payload).map("%02x".format(_)).mkString
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
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
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

  /** Decode one media row: images go through the real imageio decoder
    * (falling back to the stub if the bytes aren't an image); audio and
    * video use the stub (no codec libraries here). */
  def decode(id: Long, kind: String, payload: Array[Byte]): MediaFeatures =
    if (kind == "image")
      decodeImage(payload) match {
        case Some((w, h, feature)) =>
          val md = MessageDigest.getInstance("SHA-256")
          val sha = md.digest(payload).map("%02x".format(_)).mkString
          MediaFeatures(id, kind, payload.length.toLong, sha, w, h, 1, feature)
        case None => decodeStub(id, kind, payload)
      }
    else decodeStub(id, kind, payload)

  /** Real image RESIZE (decode → Graphics2D nearest-neighbour scale →
    * PNG re-encode). Nearest-neighbour is the deterministic choice: the
    * output pixels are exact source samples, so closed-form fixtures
    * stay closed-form through the resize (a solid image stays exactly
    * solid) and no interpolation-rounding varies by JVM. Returns None
    * for undecodable payloads — callers fall back like [[decode]]. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
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

  /** Batch resize over a media table — the same mapPartitions batch
    * shape as [[extractFeatures]] (one decoder per partition, payloads
    * stream through; the pattern a real codec/model pipeline needs).
    * Undecodable payloads pass through unchanged. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
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

  /** Deterministic 16-bit PCM WAV table (REAL bytes through the real
    * javax.sound.sampled encoder), generated distributively. Closed form
    * in the id — samples s_k = ((31·id + 17·k) mod 2001) − 1000 for
    * k < 64 + id mod 128, rate 8000 + (id mod 8)·1000 Hz, mono — so an
    * SQL oracle predicts the decoded round trip exactly (the audio twin
    * of imageTable's PNGs). */
  def audioTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val nS = 64 + (id % 128).toInt
        val rate = 8000 + (id % 8).toInt * 1000
        val pcm = new Array[Byte](nS * 2)
        var k = 0
        while (k < nS) {
          val s = (((31 * id + 17 * k) % 2001) - 1000).toInt
          pcm(2 * k) = (s & 0xff).toByte
          pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nS.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, "audio", bos.toByteArray)
      }
    }
  }

  /** Real audio DOWNSAMPLE by integer decimation (every `factor`-th PCM
    * sample, rate divided accordingly) through a full WAV re-encode —
    * the audio twin of [[resizeImages]]. Plain decimation (no low-pass)
    * is the deterministic choice: output samples are exact source
    * samples, so closed-form fixtures stay closed-form (an anti-alias
    * filter would be the production upgrade; it changes values, not the
    * pipeline shape). Non-decodable payloads pass through unchanged. */
  def decimateAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "audio") r
        else decodeAudio(r.payload) match {
          case Some((rate, ch, _, samples)) if ch == 1 && samples.nonEmpty =>
            val dec = Array.range(0, samples.length, factor)
              .map(i => samples(i))
            val pcm = new Array[Byte](dec.length * 2)
            var k = 0
            while (k < dec.length) {
              pcm(2 * k) = (dec(k) & 0xff).toByte
              pcm(2 * k + 1) = ((dec(k) >> 8) & 0xff).toByte
              k += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(
              rate / factor, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, dec.length.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            r.copy(payload = bos.toByteArray)
          case _ => r
        }
      }
    }
  }

  /** Deterministic frame sampling for video stand-ins: every k-th frame
    * index up to n_frames (generator — no shuffle). */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame = {
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
