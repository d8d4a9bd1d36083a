package graft.expr

import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

class ComplexFnsSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }
  import ComplexFns._
  import spark.implicits._

  private def eval2(a: (Double, Double), b: (Double, Double),
                    f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
  : (Double, Double) = {
    val df = Seq((a._1, a._2, b._1, b._2)).toDF("ar", "ai", "br", "bi")
    val r = df.select(f(c_make(col("ar"), col("ai")), c_make(col("br"), col("bi"))).as("c"))
      .select(col("c.re"), col("c.im")).head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("multiplication matches the textbook formula") {
    assert(eval2((1, 2), (3, 4), c_mul) === (1 * 3 - 2 * 4, 1 * 4 + 2 * 3))
  }

  test("division: z / z == 1 for non-zero z (property)") {
    check(forAll { (re0: Int, im0: Int) =>
      val (re, im) = ((re0 % 100) + 0.5, (im0 % 100) + 0.5)
      val (r, i) = eval2((re, im), (re, im), c_div)
      math.abs(r - 1.0) < 1e-9 && math.abs(i) < 1e-9
    })
  }

  test("abs and conj") {
    val df = Seq((3.0, 4.0)).toDF("re", "im")
    val c = c_make(col("re"), col("im"))
    val row = df.select(c_abs(c).as("m"), c_im(c_conj(c)).as("ci")).head()
    assert(row.getDouble(0) === 5.0 && row.getDouble(1) === -4.0)
  }
}
