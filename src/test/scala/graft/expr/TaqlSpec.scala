package graft.expr

import org.scalatest.funsuite.AnyFunSuite

class TaqlSpec extends AnyFunSuite {

  test("boolean operators rewrite") {
    assert(Taql.toSql("A == 1 && B != 2 || !(C > 3)")
      === "A  =  1  AND  B != 2  OR   NOT (C > 3)")
  }

  test("IN-list brackets become parens; subscripts survive") {
    assert(Taql.toSql("X IN [1,2,3]") === "X IN (1,2,3)")
    assert(Taql.toSql("FLAG[0] == 1") === "FLAG[0]  =  1")
    assert(Taql.toSql("A IN [1,2] && FLAG[3] > 0")
      === "A IN (1,2)  AND  FLAG[3] > 0")
  }

  test("case-insensitive IN and no-space IN[") {
    assert(Taql.toSql("x in[1,2]") === "x in(1,2)")
  }

  test("string literals are untouched, incl. escaped quotes") {
    assert(Taql.toSql("name == 'a && b'") === "name  =  'a && b'")
    assert(Taql.toSql("""name == 'it\'s && fine'""")
      === """name  =  'it\'s && fine'""")
    assert(Taql.toSql("""name == "x[1]" && y == 2""")
      === """name  =  "x[1]"  AND  y  =  2""")
  }

  test("unsupported casacore operators raise with a clear message") {
    val e1 = intercept[IllegalArgumentException](Taql.toSql("name ~= 'x'"))
    assert(e1.getMessage.contains("~="))
    val e2 = intercept[IllegalArgumentException](Taql.toSql("name !~ 'x'"))
    assert(e2.getMessage.contains("!~"))
  }
}

class ExpressionsSpec extends AnyFunSuite {
  import Expressions._

  test("parser builds the reference op set") {
    assert(parse("A + B * 2") === Bin("+", Ref("A"), Bin("*", Ref("B"), Num(2))))
    assert(parse("-A / (B - 1)")
      === Bin("/", Neg(Ref("A")), Bin("-", Ref("B"), Num(1))))
    assert(parse("A // 7") === Bin("//", Ref("A"), Num(7)))
  }

  test("unknown column raises with available names") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("A", "B")
    val e = intercept[IllegalArgumentException](compile(df, "A + NOPE"))
    assert(e.getMessage.contains("NOPE") && e.getMessage.contains("A"))
  }

  test("reference example shape evaluates") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val df = Seq((8.0, 2.0, 4.0)).toDF("DATA", "DIR1_DATA", "DIR2_DATA")
    val out = df.select(compile(df, "DATA / (-DIR1_DATA + DIR2_DATA)*4").as("v"))
      .head().getDouble(0)
    assert(out === 16.0)
  }

  test("floor division follows numpy: dtype from source form, exact int64, edge cases") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val df = Seq((7L, 2L, -7L, 7.0, -0.0, 0L, Double.NaN, Double.PositiveInfinity))
      .toDF("I", "J", "NI", "F", "NZ", "Z", "NAN", "INF")
    def one(e: String) = df.select(compile(df, e).as("v")).head().get(0)
    // int // int stays integer, floor semantics (toward -inf)
    assert(one("I // J") === 3L)
    assert(one("NI // J") === -4L)
    // numpy: int // 0 == 0 (not an error, not Long.MaxValue)
    assert(one("I // Z") === 0L)
    // a literal WRITTEN as float makes it float floor-division (numpy
    // dtype promotion follows the source form, not the value)
    assert(one("I // 2.0") === 3.0)
    assert(one("I // 2") === 3L)
    // float path: signed zero preserved; NaN/Inf INPUTS propagate instead
    // of collapsing through LongType floor() (NaN→0, Inf→Long.Max).
    // (/0.0 itself is an ANSI error engine-wide, matching the `/` operator.)
    val nz = one("NZ // J").asInstanceOf[Double]
    assert(nz == 0.0 && 1.0 / nz == Double.NegativeInfinity, "keeps -0.0")
    assert(one("NAN // J").asInstanceOf[Double].isNaN)
    assert(one("INF // J") === Double.PositiveInfinity)
    assert(one("F // J") === 3.0)
    // exact past 2^53 where a double detour would round: (2^60+1) // 1
    val big = spark.sql("SELECT CAST(1152921504606846977 AS LONG) AS B")
    assert(big.select(compile(big, "B // 1").as("v")).head().getLong(0)
      === 1152921504606846977L)
    // numpy wraps int64.min // -1 back to int64.min; ANSI div would throw
    val edge = spark.sql(
      s"SELECT CAST(${Long.MinValue} AS LONG) AS MN, CAST(-1 AS LONG) AS M1")
    assert(edge.select(compile(edge, "MN // M1").as("v")).head().getLong(0)
      === Long.MinValue)
    // and the adjacent non-overflow cases still floor correctly
    assert(edge.select(compile(edge, "MN // 1").as("v")).head().getLong(0)
      === Long.MinValue)
    assert(edge.select(compile(edge, "M1 // M1").as("v")).head().getLong(0) === 1L)
  }

  test("elementwise over N-d complex tensor columns (reference broadcasting)") {
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions._
    // DATA (chan=4, corr=2) complex cells from the synthetic MS
    val ms = graft.schema.SyntheticMS.build(spark, 5, 4, 2)
      .withColumn("DIR1_DATA", col("DATA"))
    // (DATA - DIR1_DATA) * 3 + 1 == 1 elementwise (complex: 1 + 0i)
    val out = Expressions.withExpr(ms, "OUT", "(DATA - DIR1_DATA) * 3 + 1")
    val row = out.select(col("OUT")).head()
    val cells = row.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](0)
    assert(cells.length === 4 && cells.head.length === 2)
    cells.foreach(_.foreach { z =>
      assert(z.getDouble(0) === 1.0 && z.getDouble(1) === 0.0)
    })
    // array ∘ scalar real arithmetic: UVW * 2 - UVW == UVW
    val uvw = Expressions.withExpr(ms, "U2", "UVW * 2 - UVW")
      .select(col("U2"), col("UVW")).head()
    assert(uvw.getSeq[Double](0) === uvw.getSeq[Double](1))
  }
}
