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

  test("fuzzy pair join under heavy exact-duplicate skew") {
    import spark.implicits._
    // one string duplicated 600×, a near-miss duplicated 200×, and 5 000
    // unique fillers — the corpus-scale skew the collapse path guards:
    // the candidate join must see each string once per variant, while the
    // OUTPUT correctly carries the quadratic duplicate-group pairs
    val rows =
      (0L until 600L).map(i => (i, "boilerplate header")) ++
      (1000L until 1200L).map(i => (i, "boilerplate headed")) ++
      (10000L until 15000L).map(i => (i, s"unique-$i-text"))
    val out = graft.ops.Fuzzy.editDistancePairs(
      rows.toDF("id", "s"), "s", "id", maxDist = 1)
    // distance-0: C(600,2) + C(200,2) inside the two duplicate groups
    assert(out.filter(col("dist") === 0).count() ===
      600L * 599 / 2 + 200L * 199 / 2)
    // distance-1 across the two boilerplate groups: full 600 × 200
    // (the filler ids also produce dist-1 digit-neighbor pairs among
    // themselves — fine, they are not asserted here)
    assert(out.filter(col("dist") === 1 &&
      col("id_a") < 1000 && col("id_b").between(1000, 1199)).count() ===
      600L * 200L)
    // completeness survived the collapse: a spot pair from each class
    assert(out.filter(col("id_a") === 0 && col("id_b") === 1).count() === 1)
    assert(out.filter(col("id_a") === 0 && col("id_b") === 1000).count() === 1)
  }
}
