package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch decode / feature-extract /
  * resize / frame-sample over per-partition iterators.
  *
  * Images decode for REAL via `javax.imageio` (PNG/JPEG/GIF/BMP ship with
  * the JDK): width/height plus per-channel and luminance pixel moments.
  * Audio decodes for REAL via `javax.sound.sampled` (WAV/AU/AIFF PCM ship
  * with the JDK): rate/duration/RMS/peak/zero-crossing features. Video
  * (and compressed audio like mp3/ogg) stays a clearly-marked
  * deterministic STUB — the JDK ships no codecs for those; a real cluster
  * swaps the stub body for e.g. ffmpeg bindings and nothing else changes.
  * Payloads that claim to be decodable but aren't fall back to the
  * byte-level stub, so the pipeline never dies on a corrupt file — the
  * failure mode at 100 TB is a feature row flagged by its `decoded`
  * field, not a crashed stage.
  *
  * Rows flow as [[MediaItem]] (kind, bytes, meta) and features come back as
  * fixed-width vectors, so the decode stage is a narrow, shuffle-free
  * mapPartitions over whatever partitioning the caller set — at 100 TB the
  * binary payloads never move through a shuffle.
  */
object Multimodal {

  /** One media payload: `kind` ∈ {image, audio, video}, raw bytes, typed
    * metadata (the reference models opaque cells similarly: N-d array cells
    * with dims/metadata carried in the schema, SURVEY §1.3).
    */
  final case class MediaItem(
      id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sampleRate: Int, nFrames: Int)

  final case class MediaFeatures(
      id: Long, kind: String, byteLen: Long, digest: String,
      features: Array[Double], decoded: Boolean)

  /** Real image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP):
    * features = [width, height, mean R, mean G, mean B, mean luminance,
    * stddev luminance, aspect ratio]. Returns None when the payload is not
    * a decodable image (callers fall back to [[stubDecode]]).
    */
  private[ops] def decodeImage(item: MediaItem): Option[MediaFeatures] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(item.bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var sl = 0d; var sl2 = 0d
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val lum = 0.299 * r + 0.587 * g + 0.114 * b
          sl += lum; sl2 += lum * lum
          x += 1
        }
        y += 1
      }
      val meanL = sl / n
      val varL = math.max(0d, sl2 / n - meanL * meanL)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(item.bytes).map("%02x".format(_)).mkString
      Some(MediaFeatures(item.id, item.kind, item.bytes.length.toLong, digest,
        Array(w.toDouble, h.toDouble, sr.toDouble / n, sg.toDouble / n,
          sb.toDouble / n, meanL, math.sqrt(varL), w.toDouble / h),
        decoded = true))
    }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AU/AIFF
    * PCM): features = [sample rate, channels, n samples, duration s,
    * mean amplitude, RMS, peak, zero-crossing rate] over channel 0,
    * samples normalised to [-1, 1]. Returns None for non-PCM payloads
    * (mp3/ogg need codecs the JDK doesn't ship — those fall back to
    * [[stubDecode]] and are flagged by `decoded = false`).
    */
  private[ops] def decodeAudio(item: MediaItem): Option[MediaFeatures] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(item.bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ok = (enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
        (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
      if (!ok) return None
      val raw = in.readAllBytes()
      val frameSize = fmt.getFrameSize
      val channels = fmt.getChannels
      val nSamples = if (frameSize > 0) raw.length / frameSize else 0
      if (nSamples == 0) return None
      var sum = 0d; var sum2 = 0d; var peak = 0d; var crossings = 0L
      var prev = 0d
      var i = 0
      while (i < nSamples) {
        val off = i * frameSize // channel 0 leads each frame
        val v =
          if (bits == 16) {
            val lo = raw(off) & 0xff
            val hi = raw(off + 1)
            val s = if (fmt.isBigEndian) ((lo << 8) | (raw(off + 1) & 0xff)).toShort
                    else ((hi << 8) | lo).toShort
            s / 32768d
          } else if (enc == AudioFormat.Encoding.PCM_SIGNED) raw(off) / 128d
          else ((raw(off) & 0xff) - 128) / 128d
        sum += v; sum2 += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) crossings += 1
        prev = v
        i += 1
      }
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(item.bytes).map("%02x".format(_)).mkString
      Some(MediaFeatures(item.id, item.kind, item.bytes.length.toLong, digest,
        Array(fmt.getSampleRate.toDouble, channels.toDouble, nSamples.toDouble,
          nSamples / fmt.getSampleRate.toDouble, sum / nSamples,
          math.sqrt(sum2 / nSamples), peak, crossings.toDouble / nSamples),
        decoded = true))
    } catch { case _: Exception => None } finally in.close()
  }

  /** STUB codec for video (the JDK ships no video codecs) and for
    * undecodable image/audio payloads: deterministic features derived from
    * the raw bytes — length, byte histogram moments, and a stride sample —
    * so the pipeline is testable end-to-end and byte-exact across runs.
    */
  private[ops] def stubDecode(item: MediaItem): MediaFeatures = {
    val bs = item.bytes
    val n = bs.length.max(1)
    val mean = bs.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    val varr = bs.foldLeft(0d)((a, b) => a + math.pow((b & 0xff) - mean, 2)) / n
    val stride = math.max(1, n / 8)
    val samples = (0 until 8).map(i => (bs(math.min(i * stride, n - 1)) & 0xff).toDouble)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(bs).map("%02x".format(_)).mkString
    MediaFeatures(item.id, item.kind, bs.length.toLong, digest,
      (Seq(mean, math.sqrt(varr)) ++ samples).toArray, decoded = false)
  }

  /** Batched decode / feature-extract: one iterator pass per partition
    * (the Scala analog of a pandas_udf over mapInPandas batches). Images
    * go through the real javax.imageio decoder; audio/video and
    * undecodable payloads fall back to the byte-level stub.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // keep ImageIO off executor-local disk: decode fully in memory
      javax.imageio.ImageIO.setUseCache(false)
      it.map { item =>
        if (item.kind == "image") decodeImage(item).getOrElse(stubDecode(item))
        else if (item.kind == "audio") decodeAudio(item).getOrElse(stubDecode(item))
        else stubDecode(item)
      }
    }
  }

  /** Resize: REAL bilinear image resize for decodable images (the JDK's
    * `Graphics2D` + PNG re-encode, in-JDK — no external codec), falling
    * back to the byte-stride stub for undecodable payloads and non-image
    * kinds so the (kind, meta) plumbing stays honest either way. Narrow
    * per-partition pass; bytes never cross a shuffle.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    require(w > 0 && h > 0, s"resize target must be positive: ${w}x$h")
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { item =>
        val real: Option[MediaItem] =
          if (item.kind != "image") None
          else try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(item.bytes))
            if (img == null) None
            else {
              val dst = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              Some(item.copy(bytes = bos.toByteArray, width = w, height = h))
            }
          } catch { case _: java.io.IOException | _: RuntimeException => None }
        real.getOrElse {
          val target = math.max(1, w * h)
          val n = item.bytes.length
          val out =
            if (n <= target) item.bytes
            else Array.tabulate(target)(i => item.bytes(i * n / target))
          item.copy(bytes = out, width = w, height = h)
        }
      }
    }
  }

  /** Frame sampling stub for video payloads: slice the payload into
    * `nFrames` equal chunks and keep every `stride`-th chunk.
    */
  def sampleFrames(items: Dataset[MediaItem], stride: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { it =>
      if (it.nFrames <= 1 || it.bytes.isEmpty) it
      else {
        val frameLen = math.max(1, it.bytes.length / it.nFrames)
        val kept = (0 until it.nFrames by stride).flatMap { f =>
          it.bytes.slice(f * frameLen, (f + 1) * frameLen)
        }.toArray
        it.copy(bytes = kept, nFrames = (it.nFrames + stride - 1) / stride)
      }
    })
  }

  /** Build a MediaItem frame from any table with an id + a string payload
    * (the test harness: documents.text encoded as fake image bytes).
    */
  def fromText(spark: SparkSession, df: DataFrame,
               idCol: String, textCol: String): Dataset[MediaItem] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      (length(col(textCol)) % 640).cast("int").as("width"),
      (length(col(textCol)) % 480).cast("int").as("height"),
      lit(0).as("sampleRate"),
      lit(1).as("nFrames")).as[MediaItem]
  }
}
