package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException, InputStream, OutputStream}
import java.net.{HttpURLConnection, URI, URL}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Minimal Hadoop FileSystem over the S3 REST API (path-style requests,
  * SigV4-signed) — scheme `s3l://bucket/key`, endpoint via
  * `fs.s3l.endpoint` (e.g. `http://127.0.0.1:5000`); credentials via
  * `fs.s3l.access.key` / `fs.s3l.secret.key` / `fs.s3l.region`.
  *
  * Purpose: the LIVE object-store integration path. The reference
  * project tests its writers against a real minio endpoint
  * (ref: daskms/conftest.py:238-344); this engine's sandbox ships an
  * S3-compatible server (moto) but no hadoop-aws client jar, so this is
  * the smallest honest client that lets the ENGINE'S OWN writers —
  * parquet commits through FileOutputCommitter, fragment keyword
  * sidecars, the committer-bypassing TokenBin/WebDataset sinks — run
  * against a real HTTP endpoint with the server's real list-after-write
  * and copy/delete semantics (`S3LiveSpec` drives all of them).
  *
  * Deliberate scope limits (a DEV-endpoint adapter, not a production S3
  * client — deploy hadoop-aws/S3A for real clusters):
  *  - requests carry REAL SigV4 signatures ([[S3SigV4]], pinned against
  *    botocore-derived reference vectors); the available dev server
  *    does not cryptographically enforce them, so the endpoint-side
  *    REJECTION path is covered by fault injection instead
  *    (`S3SigRejectSpec`: a stub returning 403 SignatureDoesNotMatch
  *    on create/COPY/multipart-complete/stat, each asserted to surface
  *    as a clear IOException — a signing regression fails loudly even
  *    though moto would accept it);
  *  - whole-object buffering on open/create — correct at any size but
  *    memory-bound to the largest single object, fine for the test
  *    corpus scale this adapter exists for;
  *  - rename is the S3 reality: server-side COPY + DELETE per object,
  *    non-atomic — exactly the property the engine's crash-safety
  *    machinery (manifest-last commits, scheme guards) is built around;
  *  - no retries/backoff: a dev endpoint failure should fail the test.
  */
class S3LiteFs extends FileSystem {

  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: URI = _
  private var workDir: Path = _

  override def getScheme: String = "s3l"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"s3l://${name.getAuthority}")
    bucket = name.getAuthority
    val ep = conf.get("fs.s3l.endpoint")
    require(ep != null && ep.nonEmpty, "fs.s3l.endpoint is not set")
    endpoint = URI.create(ep)
    workDir = new Path(fsUri.toString + "/")
  }

  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def mkdirs(f: Path, permission: FsPermission): Boolean = true

  // ------------------------------------------------------------- REST core

  private def keyOf(f: Path): String =
    makeQualified(f).toUri.getPath.stripPrefix("/")

  /** One HTTP round-trip, SigV4-signed. `params` are RAW (unencoded)
    * query pairs: the wire query and the signed canonical query are
    * built from them by the SAME encoder, so keys/tokens containing
    * '&', '+', '=' or unicode can never desync the request from its
    * signature or corrupt server-side parsing. Returns (status, body,
    * headers).
    */
  private def http(method: String, key: String,
                   params: Seq[(String, String)], body: Array[Byte],
                   extraHeaders: Map[String, String] = Map.empty)
      : (Int, Array[Byte], java.util.Map[String, java.util.List[String]]) = {
    val encPath = s"/$bucket/${S3SigV4.uriEncode(key, keepSlash = true)}"
    val encQuery = S3SigV4.canonicalQuery(params)
    val u = new URL(endpoint.toString + encPath +
      (if (encQuery.isEmpty) "" else s"?$encQuery"))
    val c = u.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(10000)
    c.setReadTimeout(60000)
    // real SigV4 over the canonical request (spec-pinned in
    // S3SigV4Spec against botocore-derived vectors); keys from conf
    // with dev-endpoint defaults
    val conf = getConf
    val amzDate = S3SigV4.amzDate()
    val payloadSha = S3SigV4.hexSha256(
      if (body == null) Array.emptyByteArray else body)
    val hostHdr =
      if (endpoint.getPort >= 0) s"${endpoint.getHost}:${endpoint.getPort}"
      else endpoint.getHost
    val auth = S3SigV4.authorization(
      method, s"/$bucket/$key", params, hostHdr, amzDate, payloadSha,
      extraHeaders, conf.get("fs.s3l.access.key", "graft"),
      conf.get("fs.s3l.secret.key", "graft-secret"),
      conf.get("fs.s3l.region", "us-east-1"))
    c.setRequestProperty("x-amz-date", amzDate)
    c.setRequestProperty("x-amz-content-sha256", payloadSha)
    c.setRequestProperty("Authorization", auth)
    extraHeaders.foreach { case (k, v) => c.setRequestProperty(k, v) }
    if (body != null) {
      // octet-stream, or the server's form parser eats the payload
      c.setRequestProperty("Content-Type", "application/octet-stream")
      c.setDoOutput(true)
      val os = c.getOutputStream
      os.write(body); os.close()
    }
    val status = c.getResponseCode
    val is: InputStream =
      if (status >= 400) c.getErrorStream else c.getInputStream
    val out = new ByteArrayOutputStream()
    if (is != null) {
      val buf = new Array[Byte](65536)
      var n = is.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
      is.close()
    }
    val headers = c.getHeaderFields
    c.disconnect()
    (status, out.toByteArray, headers)
  }

  private def xml(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def texts(doc: org.w3c.dom.Document, parent: String,
                    child: String): Seq[(org.w3c.dom.Element, String)] = {
    val nodes = doc.getElementsByTagName(parent)
    (0 until nodes.getLength).map { i =>
      val e = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
      val c = e.getElementsByTagName(child)
      (e, if (c.getLength > 0) c.item(0).getTextContent else "")
    }
  }

  /** list-type=2 with pagination: (keys with sizes+mtimes, commonPrefixes). */
  private def list(prefix: String, delimiter: Boolean)
      : (Seq[(String, Long, Long)], Seq[String]) = {
    val files = Seq.newBuilder[(String, Long, Long)]
    val dirs = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = Seq("list-type" -> "2", "prefix" -> prefix) ++
        (if (delimiter) Seq("delimiter" -> "/") else Nil) ++
        token.map("continuation-token" -> _)
      val (st, body, _) = http("GET", "", q, null)
      if (st != 200) throw new IOException(
        s"s3l list $prefix failed: HTTP $st ${new String(body, StandardCharsets.UTF_8)}")
      val doc = xml(body)
      texts(doc, "Contents", "Key").foreach { case (e, k) =>
        val size = e.getElementsByTagName("Size").item(0)
          .getTextContent.toLong
        val lm = e.getElementsByTagName("LastModified").item(0)
          .getTextContent
        val mtime =
          try java.time.Instant.parse(lm).toEpochMilli
          catch { case _: Exception => 0L }
        if (!k.endsWith("/")) files += ((k, size, mtime))
      }
      texts(doc, "CommonPrefixes", "Prefix").foreach { case (_, p) =>
        dirs += p.stripSuffix("/")
      }
      val trunc = doc.getElementsByTagName("IsTruncated")
      more = trunc.getLength > 0 &&
        trunc.item(0).getTextContent.toBoolean
      if (more) {
        val nt = doc.getElementsByTagName("NextContinuationToken")
        if (nt.getLength > 0) token = Some(nt.item(0).getTextContent)
        else more = false
      }
    }
    (files.result(), dirs.result().distinct)
  }

  // ------------------------------------------------------------- metadata

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatus(f)
    val (st, _, headers) = http("HEAD", key, Nil, null)
    if (st == 200) {
      val len = Option(headers.get("Content-Length"))
        .map(_.get(0).toLong).getOrElse(0L)
      val mtime = Option(headers.get("Last-Modified")).map { h =>
        try java.time.ZonedDateTime.parse(h.get(0),
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
          .toInstant.toEpochMilli
        catch { case _: Exception => 0L }
      }.getOrElse(0L)
      new FileStatus(len, false, 1, defaultBlockSize, mtime,
        makeQualified(f))
    } else if (st == 404) {
      // no object: a "directory" exists iff anything lives under key/
      val (files, dirs) = list(key + "/", delimiter = true)
      if (files.nonEmpty || dirs.nonEmpty) dirStatus(f)
      else throw new FileNotFoundException(s"s3l: $f")
    } else
      // 403/5xx is a SERVER answer, not absence — mapping it to FNF
      // would let callers (exists/rename/committers) treat an outage
      // as missing data and proceed
      throw new IOException(s"s3l stat $f: HTTP $st")
  }

  private def dirStatus(f: Path): FileStatus =
    new FileStatus(0, true, 1, defaultBlockSize, 0L, makeQualified(f))

  private def defaultBlockSize: Long = 33554432L

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (key.nonEmpty) {
      val (st, _, headers) = http("HEAD", key, Nil, null)
      if (st == 200) {
        val len = Option(headers.get("Content-Length"))
          .map(_.get(0).toLong).getOrElse(0L)
        return Array(new FileStatus(len, false, 1, defaultBlockSize, 0L,
          makeQualified(f)))
      }
      if (st != 404) throw new IOException(s"s3l stat $f: HTTP $st")
    }
    val prefix = if (key.isEmpty) "" else key + "/"
    val (files, dirs) = list(prefix, delimiter = true)
    if (files.isEmpty && dirs.isEmpty && key.nonEmpty)
      throw new FileNotFoundException(s"s3l: $f")
    val base = s"s3l://$bucket/"
    (files.map { case (k, size, mtime) =>
      new FileStatus(size, false, 1, defaultBlockSize, mtime,
        new Path(base + k))
    } ++ dirs.map(d => dirStatus(new Path(base + d)))).toArray
  }

  // ------------------------------------------------------------- data plane

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val (st, body, _) = http("GET", key, Nil, null)
    if (st == 404) throw new FileNotFoundException(s"s3l: $f")
    if (st != 200) throw new IOException(s"s3l open $f: HTTP $st")
    new FSDataInputStream(new S3LiteFs.ByteSeekStream(body))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && exists(f))
      throw new IOException(s"s3l: $f already exists")
    // S3's real 5 MiB floor for non-final parts; small objects single-PUT
    val threshold = math.max(5L * 1024 * 1024,
      getConf.getLong("fs.s3l.multipart.threshold", 128L * 1024 * 1024))
    new FSDataOutputStream(new MultipartSink(key, threshold), null)
  }

  /** The real S3 upload shape: objects under `threshold` commit as one
    * PUT; larger streams become a multipart upload — initiate, 5 MiB+
    * parts as they fill, CompleteMultipartUpload at close. The parts
    * are INVISIBLE at the object key until complete and a crash before
    * close leaves NO object (the contract `MultipartFs` models in-JVM;
    * `S3LiveSpec` proves it against the live server).
    */
  private final class MultipartSink(key: String, threshold: Long)
      extends OutputStream {
    private val buf = new ByteArrayOutputStream()
    private var uploadId: String = _
    private var partN = 0
    private var closed = false
    private val etags = Seq.newBuilder[(Int, String)]

    private def initiate(): Unit = {
      val (st, body, _) = http("POST", key, Seq("uploads" -> ""), Array.emptyByteArray)
      if (st != 200) throw new IOException(
        s"s3l initiate multipart $key: HTTP $st " +
          new String(body, StandardCharsets.UTF_8))
      val doc = xml(body)
      val ids = doc.getElementsByTagName("UploadId")
      if (ids.getLength == 0)
        throw new IOException(s"s3l initiate multipart $key: no UploadId")
      uploadId = ids.item(0).getTextContent
    }

    private def flushPart(): Unit = {
      if (uploadId == null) initiate()
      partN += 1
      val (st, body, headers) = http("PUT", key,
        Seq("partNumber" -> partN.toString, "uploadId" -> uploadId),
        buf.toByteArray)
      if (st != 200) throw new IOException(
        s"s3l part $partN of $key: HTTP $st " +
          new String(body, StandardCharsets.UTF_8))
      // case-INSENSITIVE header lookup (RFC 7230 §3.2): HTTP/2 and
      // several proxies re-case header names ("etag"/"Etag"), and a
      // case-exact miss here would fail every multipart upload
      val etag = {
        import scala.jdk.CollectionConverters._
        headers.asScala.collectFirst {
          case (k, v) if k != null && k.equalsIgnoreCase("ETag") &&
            !v.isEmpty => v.get(0)
        }.getOrElse(
          throw new IOException(s"s3l part $partN of $key: no ETag"))
      }
      etags += ((partN, etag))
      buf.reset()
    }

    override def write(b: Int): Unit = {
      buf.write(b)
      if (buf.size >= threshold) flushPart()
    }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      buf.write(b, off, len)
      if (buf.size >= threshold) flushPart()
    }

    // idempotent per the OutputStream contract: Hadoop/Parquet cleanup
    // paths double-close routinely (explicit close + finally
    // closeStream), and a second CompleteMultipartUpload would 404
    override def close(): Unit =
      if (closed) ()
      else if ({ closed = true; uploadId == null }) {
        val (st, body, _) = http("PUT", key, Nil, buf.toByteArray)
        if (st != 200) throw new IOException(
          s"s3l put $key: HTTP $st " +
            new String(body, StandardCharsets.UTF_8))
      } else {
        if (buf.size > 0) flushPart()
        val parts = etags.result().map { case (n, e) =>
          s"<Part><PartNumber>$n</PartNumber><ETag>$e</ETag></Part>"
        }.mkString
        val xmlBody = ("<CompleteMultipartUpload>" + parts +
          "</CompleteMultipartUpload>").getBytes(StandardCharsets.UTF_8)
        val (st, body, _) = http("POST", key,
          Seq("uploadId" -> uploadId), xmlBody)
        if (st != 200) throw new IOException(
          s"s3l complete multipart $key: HTTP $st " +
            new String(body, StandardCharsets.UTF_8))
      }
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("s3l: append")

  private def copyObject(srcKey: String, dstKey: String): Unit = {
    val (st, body, _) = http("PUT", dstKey, Nil, null,
      Map("x-amz-copy-source" -> s"/$bucket/$srcKey"))
    if (st != 200) throw new IOException(
      s"s3l copy $srcKey -> $dstKey: HTTP $st " +
        new String(body, StandardCharsets.UTF_8))
  }

  private def deleteObject(key: String): Unit = {
    val (st, _, _) = http("DELETE", key, Nil, null)
    if (st != 204 && st != 200 && st != 404)
      throw new IOException(s"s3l delete $key: HTTP $st")
  }

  /** The S3 reality: per-object server-side COPY + DELETE (non-atomic —
    * the property the engine's manifest-last/scheme-guard machinery is
    * designed around). HDFS contract honored: renaming ONTO an existing
    * directory moves the source INTO it.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcStatus =
      try getFileStatus(src)
      catch { case _: FileNotFoundException => return false }
    val target =
      try {
        val d = getFileStatus(dst)
        if (d.isDirectory) new Path(dst, src.getName) else return false
      } catch { case _: FileNotFoundException => dst }
    if (srcStatus.isFile) {
      copyObject(keyOf(src), keyOf(target))
      deleteObject(keyOf(src))
    } else {
      val (files, _) = list(keyOf(src) + "/", delimiter = false)
      val from = keyOf(src) + "/"
      val to = keyOf(target) + "/"
      files.foreach { case (k, _, _) =>
        copyObject(k, to + k.stripPrefix(from))
      }
      files.foreach { case (k, _, _) => deleteObject(k) }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val status =
      try getFileStatus(f)
      catch { case _: FileNotFoundException => return false }
    if (status.isFile) { deleteObject(keyOf(f)); true }
    else {
      val (files, _) = list(keyOf(f) + "/", delimiter = false)
      if (files.nonEmpty && !recursive)
        throw new IOException(s"s3l: $f is a non-empty directory")
      files.foreach { case (k, _, _) => deleteObject(k) }
      true
    }
  }
}

/** AWS Signature Version 4 (the published signing process: AWS General
  * Reference, "Signature Version 4 signing process") as pure functions,
  * so `S3SigV4Spec` can pin every stage — canonical request, string to
  * sign, final signature — against reference vectors generated from
  * botocore's `SigV4Auth` (the de-facto reference signer, available in
  * this environment; the derivation script is quoted in the spec).
  */
object S3SigV4 {

  private def unreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** RFC 3986 percent-encoding with UPPERCASE hex — the SigV4 rule;
    * `keepSlash` leaves path separators intact (canonical-URI mode).
    */
  def uriEncode(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (unreserved(c) || (keepSlash && c == '/')) sb += c
      else sb ++= f"%%${b & 0xff}%02X"
    }
    sb.toString
  }

  /** Canonical query string from RAW (unencoded) param pairs: params
    * sort by encoded name then encoded value; empty stays empty.
    * Structured pairs, never a pre-joined string — a raw value
    * containing '&' or '=' (legal in S3 keys, produced by Spark's
    * partition-path encoding which escapes neither) would make a
    * string form ambiguous before encoding could see it.
    */
  def canonicalQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) =>
      (uriEncode(k, keepSlash = false), uriEncode(v, keepSlash = false))
    }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  def hexSha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** `yyyyMMdd'T'HHmmss'Z'` in UTC — the x-amz-date format. */
  def amzDate(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  /** The canonical request (stage 1 of the published process). Signed
    * headers = host, x-amz-content-sha256, x-amz-date, plus any extra
    * `x-amz-*` request headers (e.g. x-amz-copy-source), lowercase and
    * sorted.
    */
  def canonicalRequest(method: String, path: String,
                       params: Seq[(String, String)],
                       host: String, amzDate: String, payloadSha: String,
                       extraHeaders: Map[String, String]): (String, String) = {
    val headers = (Map("host" -> host, "x-amz-date" -> amzDate,
      "x-amz-content-sha256" -> payloadSha) ++
      extraHeaders.map { case (k, v) =>
        k.toLowerCase(java.util.Locale.ROOT) -> v.trim
      }.filter(_._1.startsWith("x-amz-"))).toSeq.sortBy(_._1)
    val signedHeaders = headers.map(_._1).mkString(";")
    val canonical = Seq(
      method,
      uriEncode(path, keepSlash = true),
      canonicalQuery(params),
      headers.map { case (k, v) => s"$k:$v\n" }.mkString,
      signedHeaders,
      payloadSha).mkString("\n")
    (canonical, signedHeaders)
  }

  /** Stages 2–4: string to sign, the dated HMAC key chain, and the
    * final Authorization header value.
    */
  def authorization(method: String, path: String,
                    params: Seq[(String, String)],
                    host: String, amzDate: String, payloadSha: String,
                    extraHeaders: Map[String, String], accessKey: String,
                    secretKey: String, region: String): String = {
    val (canonical, signedHeaders) = canonicalRequest(method, path,
      params, host, amzDate, payloadSha, extraHeaders)
    val date = amzDate.take(8)
    val scope = s"$date/$region/s3/aws4_request"
    val toSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      hexSha256(canonical.getBytes(StandardCharsets.UTF_8))).mkString("\n")
    val kDate = hmac(s"AWS4$secretKey".getBytes(StandardCharsets.UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, "s3")
    val kSigning = hmac(kService, "aws4_request")
    val sig = hmac(kSigning, toSign).map(b => f"${b & 0xff}%02x").mkString
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$sig"
  }
}

object S3LiteFs {
  /** Whole-object seekable stream for parquet footer reads. */
  private final class ByteSeekStream(bytes: Array[Byte])
      extends FSInputStream {
    private var pos = 0
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length)
        throw new java.io.EOFException(s"seek $p of ${bytes.length}")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0 // contract: zero-length reads return 0, never EOF
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n)
      pos += n
      n
    }
    override def available(): Int = bytes.length - pos
  }
}
