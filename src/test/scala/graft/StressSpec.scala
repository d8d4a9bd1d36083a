package graft

import org.apache.spark.sql.functions._
import graft.api.{MSTable, MSWrite}
import graft.schema.SyntheticMS

/** The reference's stress workload shape (ref: daskms/tests/test_stress.py
  * :12-33 — repeated read+write of a 1000-row × big-chan × 4-corr complex
  * MS): iterated read → update → write-back cycles on wide tensor rows,
  * verifying read-your-writes each round.
  */
class StressSpec extends SparkSpec {

  test("repeated read+update+write on wide complex tensors") {
    val path = "/root/repo/target/test_stress_ms"
    val ms = SyntheticMS.build(spark, rows = 1000, nchan = 1024, ncorr = 4)
    MSWrite.create(ms, path)
    var expectedTime = 0.0
    (1 to 3).foreach { i =>
      val cur = MSTable.open(spark, path)
      assert(cur.count() === 1000)
      // update: bump TIME on a third of rows via ROWID merge
      val withId = cur // SyntheticMS carries ROWID already
      val delta = withId.filter(col("ROWID") % 3 === 0)
        .select(col("ROWID"), (col("TIME") + 1).as("TIME"))
      val merged = MSWrite.updateByRowId(withId, delta)
      MSWrite.create(merged, path + ".next")
      // swap (same pattern as updateTable's copy-on-write)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.rename(new org.apache.hadoop.fs.Path(path + ".next"),
        new org.apache.hadoop.fs.Path(path))
      expectedTime += 1
      val t0 = MSTable.open(spark, path)
        .filter(col("ROWID") === 0).select("TIME").head().getDouble(0)
      assert(t0 === expectedTime, s"iteration $i read-your-writes")
    }
    // tensor payload integrity after 3 rewrite cycles
    val back = MSTable.open(spark, path)
    val cell = back.filter(col("ROWID") === 5)
      .select(element_at(element_at(col("DATA"), 3), 2)).head().getStruct(0)
    assert(cell.getDouble(0) === 7.0) // re = row + chan = 5 + 2
  }
}
