package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.SparkSpec

/** Pins the events-ts normalization against every physical encoding the
  * testdata has shipped with (TIMESTAMP(NANOS)-as-long and timestamp[us]
  * read as TIMESTAMP_NTZ) — round 11 crashed all ten events queries when
  * the testdata switched encodings and the loader assumed nanos-as-long.
  */
class EventsTsSpec extends SparkSpec {

  test("normalizeTs maps all three ts encodings to the same UTC instants") {
    import spark.implicits._
    // the same three µs-exact instants in each physical form
    val micros = Seq(0L, 1700000000000000L, 1700003600123456L)
    val nanos = micros.map(_ * 1000L).toDF("ts") // LongType (nanosAsLong read)
    val ntz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val tz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))

    assert(EventStream.normalizeTs(nanos).schema("ts").dataType === TimestampType)
    assert(EventStream.normalizeTs(ntz).schema("ts").dataType === TimestampType)
    assert(EventStream.normalizeTs(tz).schema("ts").dataType === TimestampType)

    def instants(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      EventStream.normalizeTs(df)
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    assert(instants(nanos) === micros)
    assert(instants(ntz) === micros)
    assert(instants(tz) === micros)
  }

  test("loadEvents yields TimestampType ts on the shipped testdata") {
    val ev = EventStream.loadEvents(spark, sf("sf0.001"))
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
    val raw = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    assert(ev.count() === raw.count())
    // the INSTANTS agree with an independent derivation: format the raw
    // column to a wall-clock string, re-parse under the UTC session — a
    // timezone shift in the NTZ→TZ cast would move every aggregate here.
    // (Only meaningful for the timestamp encodings; a future switch back
    // to TIMESTAMP(NANOS)-as-long is covered by the synthetic case above.)
    assume(raw.schema("ts").dataType !=
      org.apache.spark.sql.types.LongType)
    val viaString = raw.select(
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
          .as("ts"))
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
        sum(unix_micros(col("ts")))).head()
    val direct = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
        sum(unix_micros(col("ts")))).head()
    assert(direct === viaString)
  }
}
