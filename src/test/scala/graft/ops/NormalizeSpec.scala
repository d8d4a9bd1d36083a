package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the CCNet/C4-style text normalization step
  * ([[graft.expr.VectorExprs.NfcNormalize]], [[TextAnalysis.normalizeText]])
  * and C4 line-level cleaning ([[TextAnalysis.cleanLines]]).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("nfc_normalize composes decomposed sequences") {
    // e + U+0301 -> é (U+00E9); A + U+030A -> Å (U+00C5)
    val df = Seq((1L, "Café Å")).toDF("id", "s")
    val r = df.select(TextAnalysis.nfc(col("s")).as("n"),
      length(col("s")).as("raw_len"), length(TextAnalysis.nfc(col("s"))).as("n_len")).head()
    assert(r.getString(0) === "Café Å")
    assert(r.getInt(1) === 8 && r.getInt(2) === 6)
  }

  test("nfc_normalize: ASCII and already-NFC inputs are identity; null passes") {
    val df = Seq(Some("plain ascii"), Some("déjà vu"), None)
      .toDF("s")
    val out = df.select(TextAnalysis.nfc(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) === "plain ascii")
    assert(out(1) === "déjà vu") // precomposed stays put
    assert(out(2) == null)
  }

  test("nfc_normalize is SQL-callable once registered") {
    // the shared test session predates GraftExtensions; register the same
    // builder the extension injects (pattern of MSSchemaSpec's rolling_hash_t)
    org.apache.spark.sql.graft.ColumnShim.registerFunction(spark,
      "nfc_normalize_t", exprs => graft.expr.VectorExprs.NfcNormalize(exprs.head))
    val r = spark.sql("SELECT nfc_normalize_t('Café') AS n").head()
    assert(r.getString(0) === "Café")
  }

  test("r12 curation ops are SQL-callable via the extension builders") {
    import org.apache.spark.sql.graft.ColumnShim.{registerFunction, toCatalyst, toColumn}
    registerFunction(spark, "strip_html_t",
      exprs => toCatalyst(TextAnalysis.stripHtml(toColumn(exprs(0)))))
    registerFunction(spark, "canonical_url_t",
      exprs => toCatalyst(TextAnalysis.canonicalUrl(toColumn(exprs(0)))))
    registerFunction(spark, "compression_ratio_t",
      exprs => toCatalyst(TextAnalysis.compressionRatio(toColumn(exprs(0)))))
    registerFunction(spark, "script_fracs_t", exprs => {
      val fracs = TextAnalysis.scriptFracs(toColumn(exprs(0)))
      toCatalyst(struct(fracs.map { case (n, c) => c.as(n) }: _*))
    })
    registerFunction(spark, "sniff_media_t",
      exprs => toCatalyst(Multimodal.sniffMedia(toColumn(exprs(0)))))
    val r = spark.sql(
      """SELECT s, u, c, f.latin AS lf, f.cyrillic AS cf,
        |  m.format AS fmt, m.width AS w FROM (
        |  SELECT strip_html_t('<p>Tom &amp; Jerry</p>') AS s,
        |    canonical_url_t('HTTP://A.com:80/x?utm_source=1&q=2#f') AS u,
        |    compression_ratio_t('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS c,
        |    script_fracs_t('abcd Привет') AS f,
        |    sniff_media_t(unhex('474946383961200010000000')) AS m
        |)""".stripMargin).head()
    assert(r.getString(0) === "Tom & Jerry")
    assert(r.getString(1) === "http://a.com/x?q=2")
    assert(r.getDouble(2) < 0.5)
    assert(math.abs(r.getDouble(3) - 4.0 / 10) < 1e-9)
    assert(math.abs(r.getDouble(4) - 6.0 / 10) < 1e-9)
    assert(r.getString(5) === "gif")
    assert(r.getInt(6) === 0x20) // GIF89a, width le16 = 0x0020
  }

  test("dup_segment_fracs is SQL-callable via the extension builder") {
    import org.apache.spark.sql.graft.ColumnShim.{registerFunction, toCatalyst, toColumn}
    registerFunction(spark, "dup_segment_fracs_t", exprs => {
      val t = toColumn(exprs(0))
      val (lf, lcf) =
        TextAnalysis.dupSegmentFracs(TextAnalysis.segmentsCol(t, "\n"))
      val (pf, pcf) =
        TextAnalysis.dupSegmentFracs(TextAnalysis.segmentsCol(t, "\n{2,}"))
      toCatalyst(struct(lf.as("dup_line_frac"), lcf.as("dup_line_char_frac"),
        pf.as("dup_para_frac"), pcf.as("dup_para_char_frac")))
    })
    val r = spark.sql(
      "SELECT dup_segment_fracs_t('x\ny\n\nx\nz') AS f").head()
      .getStruct(0)
    assert(r.getAs[Double]("dup_line_frac") === 0.25)
    assert(r.getAs[Double]("dup_para_frac") === 0.0)
  }

  test("dhash64 and audio_fp64 are SQL-callable over binary columns") {
    import org.apache.spark.sql.graft.ColumnShim.{registerFunction, toCatalyst, toColumn}
    registerFunction(spark, "dhash64_t", exprs => {
      val f = org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
        if (b == null) None else Multimodal.dHash64(b))
      toCatalyst(f(toColumn(exprs(0))))
    })
    registerFunction(spark, "audio_fp64_t", exprs => {
      val f = org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
        if (b == null) None else Multimodal.audioFingerprint64(b))
      toCatalyst(f(toColumn(exprs(0))))
    })
    val img = Multimodal.syntheticGridImage(0L, 3L, flipBit = false)
    val wav = Multimodal.syntheticToneWav(0L, 3L, flipBit = false)
    val df = Seq((img.bytes, wav.bytes)).toDF("ib", "ab")
    df.createOrReplaceTempView("fp_in")
    val r = spark.sql(
      "SELECT dhash64_t(ib) AS ih, audio_fp64_t(ab) AS ah FROM fp_in").head()
    assert(r.getLong(0) === Multimodal.dHash64(img.bytes).get)
    assert(r.getLong(1) === Multimodal.audioFingerprint64(wav.bytes).get)
    // undecodable bytes -> null, not an exception
    val n = spark.sql("SELECT dhash64_t(CAST('junk' AS BINARY)) AS h").head()
    assert(n.isNullAt(0))
  }

  test("normalizeText: controls to spaces, runs collapsed, ends trimmed") {
    val df = Seq((1L, " ab\tc  d\ne ")).toDF("id", "s")
    val r = df.select(TextAnalysis.normalizeText(col("s")).as("n")).head()
    assert(r.getString(0) === "a b c d e")
  }

  test("cleanLines applies the three C4 line rules independently") {
    val text = Seq(
      "this line has five words.",   // kept
      "too short.",                  // < 3 words
      "no terminal punctuation here",// no punct
      "a SLOW line is banned here.", // banned (case-insensitive)
      "ends with a question mark?"   // kept
    ).mkString("\n")
    val out = TextAnalysis.cleanLines(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id",
      minWords = 3, banned = Seq("slow")).head()
    assert(out.getAs[String]("clean_text") ===
      "this line has five words.\nends with a question mark?")
    assert(out.getAs[Long]("n_lines") === 5L)
    assert(out.getAs[Long]("n_kept") === 2L)
  }

  test("cleanLines: requireTerminalPunct=false keeps unpunctuated lines") {
    val text = "no terminal punctuation here\ntoo short"
    val out = TextAnalysis.cleanLines(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id",
      minWords = 3, requireTerminalPunct = false).head()
    assert(out.getAs[String]("clean_text") === "no terminal punctuation here")
    assert(out.getAs[Long]("n_kept") === 1L)
  }

  test("cleanLines on the real corpus is scan-side (no exchange)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = TextAnalysis.cleanLines(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("stripHtml: blocks dropped, structure kept, entities decoded once") {
    def strip(h: String): String =
      Seq((1L, h)).toDF("id", "h")
        .select(TextAnalysis.stripHtml(col("h"))).head().getString(0)
    val page = "<html><head><title>T</title>" +
      "<script>if (a < b && c > d) { alert('x') }</script>" +
      "<STYLE media=\"all\">body { margin: 0 }</STYLE></head>" +
      "<body><h1>Head</h1><p>First para.</p>\n<p>Second para.</p>" +
      "<ul><li>Tom &amp; Jerry</li><li>1 &lt; 2</li></ul>" +
      "<!-- secret comment --><div>tail&nbsp;note</div></body></html>"
    val out = strip(page)
    // script/style/comment payloads are GONE, not just de-tagged
    assert(!out.contains("alert") && !out.contains("margin") &&
      !out.contains("secret"))
    // block closers became line structure (the source newline after the
    // first </p> keeps a paragraph blank line); inline tags became spaces
    assert(out.linesIterator.toSeq === Seq("T", "Head", "First para.", "",
      "Second para.", "Tom & Jerry", "1 < 2", "tail note"))
    // entities decode exactly once: double-escaped &amp;lt; ends as &lt;
    assert(strip("<p>&amp;lt; stays</p>") === "&lt; stays")
    assert(strip("<p>a&#39;b &quot;c&quot;</p>") === "a'b \"c\"")
    // br is a line break even unclosed/self-closed; case-insensitive tags
    assert(strip("one<BR>two<br/>three") === "one\ntwo\nthree")
    // blank-line runs cap at one empty line
    assert(strip("<p>a</p><p></p><p></p><p>b</p>") === "a\n\nb")
    // pure Column algebra: no UDF, no shuffle on the real corpus
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = docs.select(TextAnalysis.stripHtml(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"),
      s"must ride the scan:\n$plan")
  }
}
