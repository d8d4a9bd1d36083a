package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expr.VectorExprs._

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions SQL-callable, so `spark.sql("SELECT vec_cosine(a, b) ...")`
  * works on sessions built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => VecCosine(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName, "hashed_shingles"),
      (exprs: Seq[Expression]) =>
        HashedShingles(exprs(0), intLit(exprs(1), "shingle width n"))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs(0), intLit(exprs(1), "signature size k"))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs(0))))
    e.injectFunction((FunctionIdentifier("band_hashes"),
      new ExpressionInfo(classOf[BandHashes].getName, "band_hashes"),
      (exprs: Seq[Expression]) =>
        BandHashes(exprs(0), intLit(exprs(1), "band count"))))
    e.injectFunction((FunctionIdentifier("ngram_profile"),
      new ExpressionInfo(classOf[NgramProfile].getName, "ngram_profile"),
      (exprs: Seq[Expression]) =>
        NgramProfile(exprs(0), intLit(exprs(1), "n-gram width n"))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    e.injectFunction((FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      (exprs: Seq[Expression]) => DamerauLevenshtein(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    // Column-algebra curation ops: the builder expands the same composed
    // expression tree the Scala API builds, so SQL users get byte-
    // identical semantics (ColumnShim bridges Column <-> Expression)
    import org.apache.spark.sql.graft.ColumnShim.{toCatalyst, toColumn}
    import graft.ops.TextAnalysis
    e.injectFunction((FunctionIdentifier("strip_html"),
      new ExpressionInfo(TextAnalysis.getClass.getName, "strip_html"),
      (exprs: Seq[Expression]) =>
        toCatalyst(TextAnalysis.stripHtml(toColumn(exprs(0))))))
    e.injectFunction((FunctionIdentifier("canonical_url"),
      new ExpressionInfo(TextAnalysis.getClass.getName, "canonical_url"),
      (exprs: Seq[Expression]) =>
        toCatalyst(TextAnalysis.canonicalUrl(toColumn(exprs(0))))))
    e.injectFunction((FunctionIdentifier("compression_ratio"),
      new ExpressionInfo(TextAnalysis.getClass.getName, "compression_ratio"),
      (exprs: Seq[Expression]) =>
        toCatalyst(TextAnalysis.compressionRatio(toColumn(exprs(0))))))
    e.injectFunction((FunctionIdentifier("script_fracs"),
      new ExpressionInfo(TextAnalysis.getClass.getName, "script_fracs"),
      (exprs: Seq[Expression]) => {
        val fracs = TextAnalysis.scriptFracs(toColumn(exprs(0)))
        toCatalyst(org.apache.spark.sql.functions.struct(
          fracs.map { case (n, c) => c.as(n) }: _*))
      }))
    e.injectFunction((FunctionIdentifier("sniff_media"),
      new ExpressionInfo(graft.ops.Multimodal.getClass.getName, "sniff_media"),
      (exprs: Seq[Expression]) =>
        toCatalyst(graft.ops.Multimodal.sniffMedia(toColumn(exprs(0))))))
    // KMV bottom-k distinct sketch (r12) as a SQL AGGREGATE:
    // `SELECT kmv_sketch(xxhash64(v), 256) FROM t [GROUP BY g]`
    e.injectFunction((FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[graft.functions.KmvAgg].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) =>
        graft.functions.KmvAgg(exprs(0),
          intLit(exprs(1), "sketch size k")).toAggregateExpression()))
    // perceptual fingerprints (r12): the same decode kernels the near-dup
    // operators run, as scalar closure UDFs over binary payloads — null
    // for undecodable bytes
    e.injectFunction((FunctionIdentifier("dhash64"),
      new ExpressionInfo(graft.ops.Multimodal.getClass.getName, "dhash64"),
      (exprs: Seq[Expression]) => {
        val f = org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
          if (b == null) None else graft.ops.Multimodal.dHash64(b))
        toCatalyst(f(toColumn(exprs(0))))
      }))
    e.injectFunction((FunctionIdentifier("audio_fp64"),
      new ExpressionInfo(graft.ops.Multimodal.getClass.getName, "audio_fp64"),
      (exprs: Seq[Expression]) => {
        val f = org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
          if (b == null) None else graft.ops.Multimodal.audioFingerprint64(b))
        toCatalyst(f(toColumn(exprs(0))))
      }))
    // Gopher duplicate-segment fractions (r12): struct of the four
    // signals, composed from the SAME Column algebra as the Scala API
    e.injectFunction((FunctionIdentifier("dup_segment_fracs"),
      new ExpressionInfo(TextAnalysis.getClass.getName, "dup_segment_fracs"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.functions.struct
        val t = toColumn(exprs(0))
        // NB the SQL form inlines the split subtrees (no column aliasing
        // inside one expression) — fine for this 2-reference shape; heavy
        // pipelines should use dupSegmentMetrics, which aliases
        val (lf, lcf) =
          TextAnalysis.dupSegmentFracs(TextAnalysis.segmentsCol(t, "\n"))
        val (pf, pcf) =
          TextAnalysis.dupSegmentFracs(TextAnalysis.segmentsCol(t, "\n{2,}"))
        toCatalyst(struct(lf.as("dup_line_frac"), lcf.as("dup_line_char_frac"),
          pf.as("dup_para_frac"), pcf.as("dup_para_char_frac")))
      }))
  }
}
