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
  }
}
