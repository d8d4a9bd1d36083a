package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateUnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def refHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  test("RollingHash is a real codegen expression, not a CodegenFallback") {
    val e = VectorExprs.RollingHash(BoundReference(0, StringType, nullable = true))
    assert(!e.isInstanceOf[CodegenFallback])
    // generate() fails loudly if doGenCode emits uncompilable Java
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    val out = proj(InternalRow(UTF8String.fromString("hello world")))
    assert(out.getLong(0) === refHash("hello world"))
  }

  test("RollingHash codegen and interpreted eval agree (incl. non-ASCII)") {
    val e = VectorExprs.RollingHash(BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    for (s <- Seq("", "a", "héllo wörld", "日本語テキスト", "mixed 日本 ascii",
                  "😀 emoji surrogate pair", "x" * 10000)) {
      val u = UTF8String.fromString(s)
      assert(proj(InternalRow(u)).getLong(0) === refHash(s), s"codegen: $s")
      assert(e.nullSafeEval(u) === refHash(s), s"interpreted: $s")
    }
  }

  test("rolling_hash column matches the portable list-reduce HOF spelling") {
    val df = Seq("the quick brown fox", "", "abc123!@#").toDF("text")
    val viaExpr = df.select(VectorExprs.rolling_hash(col("text"))).as[Long].collect()
    val viaHof = df.select(expr(
      """aggregate(
        |  transform(sequence(1, length(text)),
        |            i -> ascii(substring(text, i, 1))),
        |  0L,
        |  (acc, c) -> (acc * 31 + c) % 1000000007L)""".stripMargin)).as[Long].collect()
    assert(viaExpr.toSeq === viaHof.toSeq)
  }

  test("VecCosine and SimHash64 generate working code (kernel call, no fallback)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val cos = VectorExprs.VecCosine(
      BoundReference(0, ArrayType(DoubleType, containsNull = false), nullable = true),
      BoundReference(1, ArrayType(DoubleType, containsNull = false), nullable = true))
    assert(!cos.isInstanceOf[CodegenFallback])
    val cproj = GenerateUnsafeProjection.generate(Seq(cos))
    val a = new GenericArrayData(Array(1.0, 0.0))
    val b = new GenericArrayData(Array(1.0, 0.0))
    assert(math.abs(cproj(InternalRow(a, b)).getDouble(0) - 1.0) < 1e-12)

    val sh = VectorExprs.SimHash64(
      BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true))
    assert(!sh.isInstanceOf[CodegenFallback])
    val sproj = GenerateUnsafeProjection.generate(Seq(sh))
    val hashes = new GenericArrayData(Array(0x5aL, 0x5aL, 0xa5L))
    // majority vote: bits set in 2 of 3 inputs win → 0x5a
    assert(sproj(InternalRow(hashes)).getLong(0) ===
      sh.nullSafeEval(hashes).asInstanceOf[Long])
  }

  test("rolling_hash is null-safe") {
    val df = Seq(Some("abc"), None).toDF("text")
    val out = df.select(VectorExprs.rolling_hash(col("text"))).collect()
    assert(out(0).getLong(0) === refHash("abc"))
    assert(out(1).isNullAt(0))
  }

  test("jaro_winkler: published cases, boost threshold, empty semantics") {
    // expected values verified against DuckDB's jaro_winkler_similarity
    val cases = Seq(
      ("martha", "marhta", 0.961111111),  // Winkler's own example
      ("DWAYNE", "DUANE", 0.84),
      ("abcdefgh", "abzzzzzz", 0.5),      // jaro = 0.5 <= 0.7: NO boost
      ("prefixaaaa", "prefixbbbb", 0.84), // prefix boost capped at 4
      ("ab", "ba", 0.0),                  // window 0: no matches
      ("CRATE", "TRACE", 0.733333333),
      ("same", "same", 1.0),
      ("a", "", 0.0), ("", "", 0.0))      // either-empty => 0, both-empty too
    val df = cases.toDF("a", "b", "want")
    val got = df.select(col("want"),
      round(VectorExprs.jaro_winkler(col("a"), col("b")), 9).as("got"))
      .collect()
    got.foreach(r => assert(r.getDouble(1) === r.getDouble(0)))
  }

  test("damerau_levenshtein: published cases, unrestricted transposition, nulls") {
    val cases = Seq(
      ("ca", "abc", 2),      // THE unrestricted-vs-OSA discriminator (OSA: 3)
      ("abcd", "acbd", 1),   // adjacent transposition
      ("kitten", "sitting", 3),
      ("", "abc", 3), ("abc", "", 3), ("", "", 0),
      ("same", "same", 0),
      ("ab", "ba", 1), ("abc", "cab", 2))
    val df = cases.toDF("a", "b", "want")
    val got = df.select(col("want"),
      VectorExprs.damerau_levenshtein(col("a"), col("b")).as("got")).collect()
    got.foreach(r => assert(r.getInt(1) === r.getInt(0), cases))
    val nulls = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(VectorExprs.damerau_levenshtein(col("a"), col("b"))).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("fuzzy kernels measure code points, not UTF-16 units or UTF-8 bytes") {
    // an astral emoji is 2 UTF-16 units / 4 UTF-8 bytes but ONE code
    // point; a unit- or byte-counting kernel would inflate these
    // distances (2 and 4 resp.) and silently drop genuinely-near pairs
    // generated by the code-point-based deletion neighborhood
    val cases = Seq(
      ("a🙂b", "ab", 1),                    // delete one emoji = 1
      ("🙂🙃", "🙃🙂", 1), // transpose
      ("café", "cafe", 1))                       // BMP accent: still 1
    val df = cases.toDF("a", "b", "want")
    df.select(col("want"),
        VectorExprs.damerau_levenshtein(col("a"), col("b")).as("got"))
      .collect().foreach(r => assert(r.getInt(1) === r.getInt(0)))
    // Jaro-Winkler: '🙂martha' vs '🙂marhta' over 7 code points =
    // jaro (1 + 1 + 6/7)/3 with a length-4 prefix boost
    val jw = Seq(("🙂martha", "🙂marhta")).toDF("a", "b")
      .select(round(VectorExprs.jaro_winkler(col("a"), col("b")), 9))
      .head().getDouble(0)
    assert(jw === 0.971428571)
  }
}
