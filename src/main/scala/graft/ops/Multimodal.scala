package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ------------------------------------------------ perceptual-hash dedup

  /** 64-bit difference hash (dHash — the classic perceptual image
    * fingerprint): decode, area-average the luminance onto a 9-wide ×
    * 8-tall grid, set bit `r*8+c` when cell (r,c) is strictly darker than
    * its right neighbor (r,c+1). Survives re-encoding (PNG↔BMP of the
    * same pixels hash identically — spec-pinned) and small edits move few
    * bits, so Hamming distance ~ visual difference. None for undecodable
    * payloads or images smaller than the 9×8 grid.
    */
  private[graft] def dHash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null || img.getWidth < 9 || img.getHeight < 8) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val sum = Array.ofDim[Double](8, 9)
      val cnt = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val gy = (y.toLong * 8 / h).toInt
        var x = 0
        while (x < w) {
          val gx = (x.toLong * 9 / w).toInt
          val rgb = img.getRGB(x, y)
          sum(gy)(gx) += 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          cnt(gy)(gx) += 1
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (sum(r)(c) / cnt(r)(c) < sum(r)(c + 1) / cnt(r)(c + 1))
            bits |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(bits)
    }
  }

  /** (id, phash) frame over the decodable images of `items` — a narrow
    * per-partition kernel (the [[extractFeatures]] shape); undecodable
    * payloads and non-image kinds drop out rather than polluting the
    * near-dup join with stub hashes.
    */
  def imagePHashes(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap(i =>
        if (i.kind == "image") dHash64(i.bytes).map(h => (i.id, h)) else None)
    }.toDF("id", "phash")
  }

  /** Image near-duplicate pairs: dHash fingerprints joined through the
    * SAME 16-bit-quarter Hamming blocking the text SimHash path uses
    * ([[graft.ops.Dedup.hammingPairs]] — equi-join on quarter values,
    * pigeonhole-complete for maxDist ≤ 3, never all-pairs). Returns
    * (id_a, id_b, hamming) with id_a < id_b. The visual complement of
    * embedding near-dup: catches re-encoded/lightly-edited copies whose
    * bytes (and md5) differ.
    */
  def imageNearDup(items: Dataset[MediaItem], maxDist: Int = 3): DataFrame =
    Dedup.hammingPairs(imagePHashes(items), "id", "phash", maxDist)

  /** 64-bit amplitude-contour fingerprint of a PCM audio payload — the
    * audio analog of [[dHash64]]: decode channel 0, split the samples
    * into 65 equal windows, set bit i when window i's mean-square energy
    * is strictly below window i+1's. Gain-invariant comparisons, so a
    * re-encoded or re-amplified copy keeps its contour; Hamming distance
    * ~ how much the loudness shape changed. None for undecodable /
    * non-PCM / sub-65-sample payloads.
    */
  private[graft] def audioFingerprint64(bytes: Array[Byte]): Option[Long] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = in.getFormat
      if (!(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16)) return None
      val raw = in.readAllBytes()
      val frameSize = fmt.getFrameSize
      val n = if (frameSize > 0) raw.length / frameSize else 0
      if (n < 65) return None
      val big = fmt.isBigEndian
      // window sums in Long: sample^2 <= 2^30, exact far beyond any
      // realistic clip length
      val sumsq = new Array[Long](65)
      val cnt = new Array[Long](65)
      var i = 0
      while (i < n) {
        val o = i * frameSize
        val s =
          if (big) ((raw(o) << 8) | (raw(o + 1) & 0xff)).toShort
          else ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
        val w = (i.toLong * 65 / n).toInt
        sumsq(w) += s.toLong * s; cnt(w) += 1
        i += 1
      }
      var bits = 0L
      var b = 0
      while (b < 64) {
        if (sumsq(b).toDouble / cnt(b) < sumsq(b + 1).toDouble / cnt(b + 1))
          bits |= 1L << b
        b += 1
      }
      Some(bits)
    } finally in.close()
  }

  /** (id, afp) frame over the decodable PCM payloads — [[imagePHashes]]
    * for audio.
    */
  def audioFingerprints(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.flatMap(i =>
      if (i.kind == "audio") audioFingerprint64(i.bytes).map(h => (i.id, h))
      else None)).toDF("id", "afp")
  }

  /** Audio near-duplicate pairs through the shared 16-bit-quarter Hamming
    * blocking — same contract as [[imageNearDup]].
    */
  def audioNearDup(items: Dataset[MediaItem], maxDist: Int = 3): DataFrame =
    Dedup.hammingPairs(audioFingerprints(items), "id", "afp", maxDist)

  /** Deterministic 13 000-sample mono 16-bit WAV whose
    * [[audioFingerprint64]] equals the 65-window amplitude pattern of
    * `key` exactly (each 200-sample window is a constant-amplitude
    * alternating-sign square wave at 6000 or 26000). With `flipBit`,
    * window 0's amplitude is adjusted so exactly ONE fingerprint bit
    * differs — [[syntheticGridImage]]'s controlled near-duplicate, for
    * audio.
    */
  def syntheticToneWav(id: Long, key: Long, flipBit: Boolean): MediaItem = {
    def amp(w: Int): Int =
      if (mix64(key * 131L + w) < 0) 26000 else 6000
    val a1 = amp(1)
    val a0 =
      if (!flipBit) amp(0)
      else if (amp(0) < a1) a1 // bit was 1 -> equal energies -> 0
      else a1 - 1              // bit was 0 -> strictly quieter -> 1
    val n = 13000
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val w = i / 200
      val v = (if (w == 0) a0 else amp(w)) * (if ((i & 1) == 0) 1 else -1)
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    // minimal RIFF/WAVE PCM header (16-bit mono 8 kHz, little-endian)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { bos.write(v); bos.write(v >> 8)
      bos.write(v >> 16); bos.write(v >> 24) }
    def le16(v: Int): Unit = { bos.write(v); bos.write(v >> 8) }
    def tag(s: String): Unit = s.foreach(c => bos.write(c.toInt))
    tag("RIFF"); le32(36 + data.length); tag("WAVE")
    tag("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000)
    le16(2); le16(16)
    tag("data"); le32(data.length)
    bos.write(data)
    MediaItem(id, "audio", bos.toByteArray, 0, 0, 8000, 0)
  }

  /** splitmix64 — the deterministic PRF behind [[syntheticGridImage]]
    * (Steele et al. 2014; fully specified, stable across JVMs).
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic 36×32 PNG whose dHash equals the 72-cell pattern of
    * `key` exactly (each dHash cell is a constant 4×4 pixel block at gray
    * 30 or 230). With `flipBit`, cell (key mod 8, 0) is adjusted so that
    * exactly ONE dHash bit differs from the unflipped image — the
    * controlled near-duplicate of the q_image_dedup oracle.
    */
  def syntheticGridImage(id: Long, key: Long, flipBit: Boolean): MediaItem = {
    def cell(r: Int, c: Int): Int =
      if (mix64(key * 73L + r * 9 + c) < 0) 230 else 30
    val fr = ((key % 8) + 8).toInt % 8
    val img = new java.awt.image.BufferedImage(36, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val v0 = cell(r, c)
        val v =
          if (!(flipBit && r == fr && c == 0)) v0
          else if (v0 < cell(r, 1)) cell(r, 1) // bit was 1 -> equal -> 0
          else cell(r, 1) - 1                  // bit was 0 -> darker -> 1
        val rgb = (v << 16) | (v << 8) | v
        var y = r * 4
        while (y < r * 4 + 4) {
          var x = c * 4
          while (x < c * 4 + 4) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    MediaItem(id, "image", bos.toByteArray, 36, 32, 0, 1)
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

  // ------------------------------------------------------- header sniffing

  /** Container metadata recovered from the first bytes of a payload —
    * see [[sniffMedia]]. Image formats fill width/height; WAV fills
    * sampleRate/channels; `format = "unknown"` leaves everything None.
    */
  final case class MediaInfo(format: String, width: Option[Int],
                             height: Option[Int], sampleRate: Option[Int],
                             channels: Option[Int])

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    (0 until s.length).forall(i => (b(o + i) & 0xff) == s.charAt(i))

  private val Unknown = MediaInfo("unknown", None, None, None, None)

  /** Header-only container sniff: format + dimensions (PNG/GIF/BMP/JPEG)
    * or sample rate + channels (WAV) straight from the leading bytes —
    * no decoder runs. Unknown/truncated/corrupt payloads return
    * `"unknown"` with all-None metadata; this function never throws.
    */
  private[graft] def sniff(b: Array[Byte]): MediaInfo = {
    if (b == null) return Unknown
    try {
      if (b.length >= 24 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
          (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
          (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
          ascii(b, 12, "IHDR")) {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0) MediaInfo("png", Some(w), Some(h), None, None)
        else Unknown
      } else if (b.length >= 10 && ascii(b, 0, "GIF8") &&
          ((b(4) & 0xff) == '7' || (b(4) & 0xff) == '9') &&
          (b(5) & 0xff) == 'a') {
        val w = le16(b, 6); val h = le16(b, 8)
        if (w > 0 && h > 0) MediaInfo("gif", Some(w), Some(h), None, None)
        else Unknown
      } else if (b.length >= 26 && ascii(b, 0, "BM")) {
        val w = le32(b, 18); val h = math.abs(le32(b, 22)) // neg = top-down
        if (w > 0 && h > 0) MediaInfo("bmp", Some(w), Some(h), None, None)
        else Unknown
      } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk marker segments to the first SOFn frame header
        var i = 2
        while (i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xff) return Unknown // lost sync: corrupt
          var m = b(i + 1) & 0xff
          while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff }
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 < b.length) {
              val h = be16(b, i + 5); val w = be16(b, i + 7)
              return if (w > 0 && h > 0)
                MediaInfo("jpeg", Some(w), Some(h), None, None)
              else Unknown
            } else return Unknown
          } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
            i += 2 // bare markers carry no length
          } else if (m == 0xd9 || m == 0xda) {
            return Unknown // hit EOI / entropy data without a frame header
          } else {
            i += 2 + be16(b, i + 2)
          }
        }
        Unknown
      } else if (b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
        // WAV: walk RIFF chunks to "fmt "
        var i = 12
        while (i + 8 <= b.length) {
          val size = le32(b, i + 4)
          if (size < 0) return Unknown
          if (ascii(b, i, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
            val ch = le16(b, i + 10); val rate = le32(b, i + 12)
            return if (ch > 0 && rate > 0)
              MediaInfo("wav", None, None, Some(rate), Some(ch))
            else Unknown
          }
          i += 8 + size + (size & 1) // chunks are word-aligned
        }
        Unknown
      } else Unknown
    } catch { case _: ArrayIndexOutOfBoundsException => Unknown }
  }

  /** [[sniff]] as a scan-side Column over a `binary` payload column: the
    * 100 TB path for media curation — filter/route/bucket by container
    * format and resolution BEFORE paying any decode (a decoder reads
    * every byte; this reads ~32). A deterministic closure UDF returning
    * `struct(format, width, height, sample_rate, channels)`; zero
    * shuffle, payloads never move, and a resolution predicate on top of
    * it prunes the expensive decode stage's input by whole partitions.
    */
  def sniffMedia(bytes: Column): Column = {
    val f = udf { (b: Array[Byte]) => sniff(b) }
    f(bytes)
  }

  /** Deterministic container payloads for the sniff round-trip check: a
    * well-formed header carrying the requested metadata, followed by
    * id-seeded junk (sniffing must never read past the header). `format =
    * "corrupt"` emits a truncated PNG signature the sniffer must reject.
    * Header layouts follow the published container specs (PNG ISO 15948,
    * GIF89a, BMP BITMAPINFOHEADER, JPEG ISO 10918 JFIF, RIFF/WAVE).
    */
  private[graft] def syntheticPayload(id: Long, format: String, w: Int, h: Int,
                                      rate: Int, ch: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def s(str: String): Unit = str.foreach(c => out.write(c.toInt & 0xff))
    def wbe32(v: Int): Unit = b(v >>> 24, v >>> 16, v >>> 8, v)
    def wbe16(v: Int): Unit = b(v >>> 8, v)
    def wle32(v: Int): Unit = b(v, v >>> 8, v >>> 16, v >>> 24)
    def wle16(v: Int): Unit = b(v, v >>> 8)
    format match {
      case "png" =>
        b(0x89); s("PNG"); b(0x0d, 0x0a, 0x1a, 0x0a)
        wbe32(13); s("IHDR"); wbe32(w); wbe32(h); b(8, 6, 0, 0, 0)
      case "gif" =>
        s("GIF89a"); wle16(w); wle16(h); b(0xf7, 0, 0)
      case "bmp" =>
        s("BM"); wle32(0); wle16(0); wle16(0); wle32(54)
        wle32(40); wle32(w); wle32(h); wle16(1); wle16(24)
      case "jpeg" =>
        b(0xff, 0xd8) // SOI
        b(0xff, 0xe0); wbe16(16); s("JFIF"); b(0, 1, 1, 0); wbe16(1); wbe16(1); b(0, 0) // APP0
        b(0xff, 0xc0); wbe16(17); b(8); wbe16(h); wbe16(w) // SOF0 baseline
        b(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      case "wav" =>
        s("RIFF"); wle32(36); s("WAVE")
        s("fmt "); wle32(16); wle16(1); wle16(ch); wle32(rate)
        wle32(rate * ch * 2); wle16(ch * 2); wle16(16)
        s("data"); wle32(0)
      case "corrupt" =>
        b(0x89); s("PN") // truncated signature: must sniff as unknown
      case other => throw new IllegalArgumentException(s"format: $other")
    }
    if (format != "corrupt") { // junk tail the sniffer must ignore
      var x = id * 6364136223846793005L + 1442695040888963407L
      (0 until 32).foreach { _ => out.write((x >>> 33).toInt & 0xff); x = x * 25214903917L + 11L }
    }
    out.toByteArray
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
