package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (the `Aggregator[IN, BUF, OUT]` surface of
  * SURVEY §2.11 — the Spark analog of the reference's
  * "bring-your-own-kernel" extension point).
  */
object Aggregators {

  /** Weighted mean: Σ(w·x) / Σw, accumulated in deterministic partial/final
    * form (Catalyst handles map-side partials automatically).
    */
  val weightedMean: Aggregator[(Double, Double), (Double, Double), Double] =
    new Aggregator[(Double, Double), (Double, Double), Double] {
      override def zero: (Double, Double) = (0.0, 0.0)
      override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
        (b._1 + in._1 * in._2, b._2 + in._2)
      override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
        (a._1 + b._1, a._2 + b._2)
      override def finish(b: (Double, Double)): Double =
        if (b._2 == 0) Double.NaN else b._1 / b._2
      override def bufferEncoder: Encoder[(Double, Double)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Streaming-friendly exact L2 norm aggregate. */
  val l2Norm: Aggregator[Double, Double, Double] =
    new Aggregator[Double, Double, Double] {
      override def zero: Double = 0.0
      override def reduce(b: Double, x: Double): Double = b + x * x
      override def merge(a: Double, b: Double): Double = a + b
      override def finish(b: Double): Double = math.sqrt(b)
      override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
