package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[S3SigV4]] against reference vectors generated from botocore's
  * `SigV4Auth` — the de-facto reference SigV4 implementation, available
  * in this environment. Derivation (run once; clock frozen by
  * monkeypatching `botocore.auth.datetime` to 2026-01-01T00:00:00Z):
  *
  * {{{
  * creds = Credentials("AKIDEXAMPLE",
  *   "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
  * req = AWSRequest(method=..., url="http://127.0.0.1:5000" + path?query,
  *   data=body)
  * req.headers["x-amz-content-sha256"] = sha256(body).hexdigest()
  * SigV4Auth(creds, "s3", "us-east-1").add_auth(req)
  * req.headers["Authorization"]  # -> the pinned signature
  * }}}
  *
  * A drift in any stage — canonical URI/query encoding, header
  * canonicalization, the HMAC key chain — flips the final signature,
  * so pinning the Authorization value pins the whole pipeline.
  */
class S3SigV4Spec extends AnyFunSuite {

  private val access = "AKIDEXAMPLE"
  private val secret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val region = "us-east-1"
  private val host = "127.0.0.1:5000"
  private val date = "20260101T000000Z"
  private val emptySha =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  private def sigOf(auth: String): String =
    auth.split("Signature=").last

  private def auth(method: String, path: String,
                   query: Seq[(String, String)], payloadSha: String,
                   extra: Map[String, String] = Map.empty): String =
    S3SigV4.authorization(method, path, query, host, date, payloadSha,
      extra, access, secret, region)

  test("GET object matches the botocore reference signature") {
    val a = auth("GET", "/bucket/key.txt", Nil, emptySha)
    assert(a.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/" +
      "20260101/us-east-1/s3/aws4_request, " +
      "SignedHeaders=host;x-amz-content-sha256;x-amz-date, "))
    assert(sigOf(a) ===
      "956cea372a8a201727a319cb86831a0449ed87fbbd501bfd067ca28457b2724b")
  }

  test("PUT with a body (payload hash in the signature) matches") {
    val bodySha = S3SigV4.hexSha256(
      "hello world".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(bodySha ===
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    val a = auth("PUT", "/bucket/dir/part-00000.parquet", Nil, bodySha)
    assert(sigOf(a) ===
      "e75b59bf9bad5d68325b23d7158484c49a50f62ff8f3efa5f979f91ac8a60503")
  }

  test("list query canonicalizes RAW params (sorted, %-encoded uppercase)") {
    // raw prefix a/b/ and delimiter / must canonicalize to
    // delimiter=%2F&list-type=2&prefix=a%2Fb%2F — sorted by name,
    // slashes encoded — to match the botocore vector
    assert(S3SigV4.canonicalQuery(Seq("list-type" -> "2",
      "prefix" -> "a/b/", "delimiter" -> "/"))
      === "delimiter=%2F&list-type=2&prefix=a%2Fb%2F")
    val a = auth("GET", "/bucket/",
      Seq("list-type" -> "2", "prefix" -> "a/b/", "delimiter" -> "/"),
      emptySha)
    assert(sigOf(a) ===
      "31da85a277f46e5296fafda24c4a6d01379b8510e7d8d6d89ef899ef88d8f728")
  }

  test("DELETE matches") {
    val a = auth("DELETE", "/bucket/a/b", Nil, emptySha)
    assert(sigOf(a) ===
      "5a986d256672c427a1e0d661bcba963a3dde980654a1515ab1b9253a983a912a")
  }

  test("extra x-amz-copy-source header joins the signed set in sorted order") {
    val a = auth("PUT", "/bucket/copy.bin", Nil, emptySha,
      Map("x-amz-copy-source" -> "/bucket/src.bin"))
    assert(a.contains("SignedHeaders=host;x-amz-content-sha256;" +
      "x-amz-copy-source;x-amz-date"))
    assert(sigOf(a) ===
      "e29ee864631bf2a4e0177d2f1fb6eced69c947ff2024a52baf6583a6cc0d37a5")
  }

  test("uriEncode: unreserved kept, slash mode, uppercase hex, UTF-8") {
    assert(S3SigV4.uriEncode("a/b c=d~e_f-g.h", keepSlash = true) ===
      "a/b%20c%3Dd~e_f-g.h")
    assert(S3SigV4.uriEncode("a/b", keepSlash = false) === "a%2Fb")
    // multi-byte UTF-8 percent-encodes every byte
    assert(S3SigV4.uriEncode("é", keepSlash = false) === "%C3%A9")
  }
}
