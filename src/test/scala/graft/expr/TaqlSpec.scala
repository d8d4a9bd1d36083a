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
}
