package graft.sources

import java.io.IOException
import java.net.{InetSocketAddress, URI}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Fault-injection for endpoint-side SigV4 REJECTION — the narrow
  * residue the r17 verdict flagged: moto does not cryptographically
  * enforce signatures, so a signing regression would sail through
  * `S3LiveSpec` silently. This stub endpoint answers the write paths
  * with the real S3 `403 SignatureDoesNotMatch` error document and
  * asserts the adapter surfaces each as a CLEAR IOException (status +
  * server error body), never as absence/false-success:
  *
  *  - simple PUT (the create path's single-object commit),
  *  - COPY (the rename path — half of every committer's
  *    task-to-final promotion),
  *  - CompleteMultipartUpload (the initiate and parts SUCCEED — the
  *    rejection hits only the final commit, the worst-case shape:
  *    megabytes uploaded, object must still NOT appear as written),
  *  - HEAD/stat (a 403 is a SERVER answer, not absence — `exists`
  *    must throw, not report "missing" and let a committer proceed).
  *
  * The reference project gets this from its minio fixture's real auth
  * (ref: daskms/conftest.py:238-344); this spec is the engine-side
  * equivalent with a deterministic in-JVM endpoint (JDK HttpServer —
  * no extra deps, no sockets beyond loopback).
  */
class S3SigRejectSpec extends AnyFunSuite {

  private val Err403 =
    ("""<?xml version="1.0" encoding="UTF-8"?><Error>""" +
      "<Code>SignatureDoesNotMatch</Code><Message>The request " +
      "signature we calculated does not match the signature you " +
      "provided.</Message></Error>").getBytes(StandardCharsets.UTF_8)

  private val EmptyList =
    ("""<?xml version="1.0"?><ListBucketResult>""" +
      "<IsTruncated>false</IsTruncated></ListBucketResult>")
      .getBytes(StandardCharsets.UTF_8)

  private def send(x: HttpExchange, status: Int, body: Array[Byte],
                   headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
    if (x.getRequestMethod == "HEAD") x.sendResponseHeaders(status, -1)
    else {
      x.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) x.getResponseBody.write(body)
    }
    x.close()
  }

  /** One FS wired to a fresh stub server; the handler decides per
    * request which op to reject. */
  private def withFs(test: (S3LiteFs, HttpServer) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => handle(x))
    server.start()
    val fs = new S3LiteFs
    val conf = new Configuration(false)
    conf.set("fs.s3l.endpoint",
      s"http://127.0.0.1:${server.getAddress.getPort}")
    conf.setLong("fs.s3l.multipart.threshold", 1L) // floors to 5 MiB
    fs.initialize(new URI("s3l://bkt"), conf)
    try test(fs, server)
    finally { fs.close(); server.stop(0) }
  }

  /** The stub's protocol: reads succeed/404 so each WRITE op is
    * reached, then the write op itself is rejected with the real S3
    * error document. Multipart initiate and parts succeed so the
    * rejection lands on the COMPLETE — the final commit step.
    */
  private def handle(x: HttpExchange): Unit = {
    val q = Option(x.getRequestURI.getQuery).getOrElse("")
    val path = x.getRequestURI.getPath
    (x.getRequestMethod, path) match {
      case ("HEAD", p) if p.endsWith("/src.bin") =>
        send(x, 200, Array.emptyByteArray)
      case ("HEAD", p) if p.endsWith("/denied.bin") =>
        send(x, 403, Array.emptyByteArray)
      case ("HEAD", _) => send(x, 404, Array.emptyByteArray)
      case ("GET", _) if q.contains("prefix=") => send(x, 200, EmptyList)
      case ("GET", _) => send(x, 404, Array.emptyByteArray)
      case ("POST", _) if q.contains("uploads") =>
        send(x, 200, ("<InitiateMultipartUploadResult><UploadId>u1" +
          "</UploadId></InitiateMultipartUploadResult>")
          .getBytes(StandardCharsets.UTF_8))
      case ("PUT", _) if q.contains("partNumber") =>
        // drain the part body, accept it
        val buf = new Array[Byte](65536)
        val is = x.getRequestBody
        while (is.read(buf) >= 0) ()
        send(x, 200, Array.emptyByteArray, Map("ETag" -> "\"e1\""))
      case ("POST", _) if q.contains("uploadId") => send(x, 403, Err403)
      case ("PUT", _) =>
        val buf = new Array[Byte](65536)
        val is = x.getRequestBody
        while (is.read(buf) >= 0) ()
        send(x, 403, Err403)
      case _ => send(x, 403, Err403)
    }
  }

  private def assertSigError(e: IOException, op: String): Unit = {
    assert(e.getMessage.contains("403"), s"$op: ${e.getMessage}")
    assert(e.getMessage.contains("SignatureDoesNotMatch"),
      s"$op must carry the server's error document: ${e.getMessage}")
  }

  test("create: a 403 on the single-object PUT fails the close loudly with the server's error") {
    withFs { (fs, _) =>
      val out = fs.create(new Path("s3l://bkt/new.bin"), true)
      out.write("hello".getBytes(StandardCharsets.UTF_8))
      val e = intercept[IOException](out.close())
      assertSigError(e, "put")
      assert(e.getMessage.contains("put"), e.getMessage)
    }
  }

  test("rename: a 403 on the server-side COPY fails the promotion loudly") {
    withFs { (fs, _) =>
      val e = intercept[IOException](fs.rename(
        new Path("s3l://bkt/src.bin"), new Path("s3l://bkt/dst.bin")))
      assertSigError(e, "copy")
      assert(e.getMessage.contains("copy"), e.getMessage)
    }
  }

  test("multipart: initiate and parts succeed, the 403 on COMPLETE still fails the close") {
    withFs { (fs, _) =>
      val out = fs.create(new Path("s3l://bkt/big.bin"), true)
      // past the 5 MiB part floor so a real part uploads before the
      // complete — the worst case: data staged, commit refused
      val chunk = new Array[Byte](1 << 16)
      (0 until 96).foreach(_ => out.write(chunk)) // 6 MiB
      val e = intercept[IOException](out.close())
      assertSigError(e, "complete")
      assert(e.getMessage.contains("complete multipart"), e.getMessage)
    }
  }

  test("stat: a 403 is a server answer, not absence — exists/getFileStatus throw") {
    withFs { (fs, _) =>
      val e = intercept[IOException](
        fs.getFileStatus(new Path("s3l://bkt/denied.bin")))
      assert(e.getMessage.contains("403"), e.getMessage)
      // and exists() must NOT swallow it into false
      intercept[IOException](fs.exists(new Path("s3l://bkt/denied.bin")))
    }
  }
}
