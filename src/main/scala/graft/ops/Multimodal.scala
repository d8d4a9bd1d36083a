package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch decode / feature-extract /
  * resize / frame-sample over per-partition iterators.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch shape —
  * while the codec layer is a clearly-marked deterministic STUB (the
  * image/audio libraries are not in this container). On a real cluster the
  * stub body is replaced with e.g. javax.imageio / ffmpeg bindings; nothing
  * else changes.
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
      features: Array[Double])

  /** STUB codec: a real deployment decodes `bytes` with an image/audio
    * library. Here: deterministic features derived from the raw bytes —
    * length, byte histogram moments, and a stride sample — so the pipeline
    * is testable end-to-end and byte-exact across runs.
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
      (Seq(mean, math.sqrt(varr)) ++ samples).toArray)
  }

  /** Batched decode / feature-extract: one iterator pass per partition
    * (the Scala analog of a pandas_udf over mapInPandas batches).
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(stubDecode))
  }

  /** "Resize" stub: re-encodes the payload to a target size by stride
    * sampling bytes — stands in for an image resize kernel; keeps the
    * (kind, meta) plumbing and output schema honest.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { it =>
      val target = math.max(1, w * h)
      val n = it.bytes.length
      val out =
        if (n <= target) it.bytes
        else Array.tabulate(target)(i => it.bytes(i * n / target))
      it.copy(bytes = out, width = w, height = h)
    })
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
