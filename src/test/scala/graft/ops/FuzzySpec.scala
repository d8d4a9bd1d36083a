package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def brutePairs(names: Seq[(Long, String)], d: Int) =
    (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      dist = levDist(sa, sb)
      if dist <= d
    } yield (ia, ib, dist)).sortBy(t => (t._1, t._2))

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("deletionVariants enumerates the exact <=d deletion neighborhood") {
    val out = Seq("abc").toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), 2).as("v"))
      .select(explode(col("v"))).as[String].collect().toSet
    // d=2 over "abc": itself, 3 single deletions, 3 double deletions
    assert(out == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    val one = Seq("ab").toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), 1).as("v"))
      .select(explode(col("v"))).as[String].collect().toSet
    assert(one == Set("ab", "a", "b"))
    // empty string survives (its only variant is itself)
    val empty = Seq("").toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), 2).as("v"))
      .select(explode(col("v"))).as[String].collect().toSet
    assert(empty == Set(""))
  }

  test("editDistancePairs d=1 equals brute-force levenshtein on a mixed corpus") {
    val names: Seq[(Long, String)] = Seq(
      1L -> "Customer#0001", 2L -> "Customer#0002", 3L -> "Customer#0012",
      4L -> "wholly different", 5L -> "Customer#00012", 6L -> "kitten",
      7L -> "sitten", 8L -> "sittin", 9L -> "", 10L -> "a",
      11L -> "ünïcode", 12L -> "ünicode")
    val df = names.toDF("id", "name")
    val got = Fuzzy.editDistancePairs(df, "name", "id", maxDist = 1)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(got == brutePairs(names, 1))
    assert(got.nonEmpty) // non-vacuous: the fixture has true pairs
  }

  test("editDistancePairs d=2 stays complete (two deletions / substitutions)") {
    val names: Seq[(Long, String)] = Seq(
      1L -> "abcdef", 2L -> "abXdYf", 3L -> "abcd", 4L -> "acdf",
      5L -> "abcdefgh", 6L -> "zzzzzz", 7L -> "ab", 8L -> "ba")
    val df = names.toDF("id", "name")
    val got = Fuzzy.editDistancePairs(df, "name", "id", maxDist = 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(got == brutePairs(names, 2))
  }

  test("matchAgainst finds every reference within distance 1 of each probe") {
    val ref = Seq(1L -> "spark", 2L -> "spork", 3L -> "shark", 4L -> "plane")
      .toDF("rid", "rname")
    val probes = Seq(10L -> "spark", 11L -> "sparkz", 12L -> "xyzzy")
      .toDF("pid", "pname")
    val got = Fuzzy.matchAgainst(probes, ref, "pname", "pid", "rname", "rid")
      .orderBy("probe_id", "ref_id").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((10L, 1L, 0), (10L, 2L, 1), (10L, 3L, 1), (11L, 1L, 1)))
  }

  test("blocked pairs: only same-block pairs, each block exact vs brute force") {
    val rows = Seq(
      (1L, "abc", "g1"), (2L, "abd", "g1"), (3L, "abc", "g2"),
      (4L, "abd", "g2"), (5L, "xyz", "g1"))
    val got = Fuzzy.editDistancePairs(rows.toDF("id", "name", "grp"),
        "name", "id", maxDist = 1, blockCols = Seq("grp"))
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    // cross-block near-misses (1,3), (1,4), (2,3), (2,4) must NOT pair
    assert(got == Seq((1L, 2L, 1), (3L, 4L, 1)))
  }

  test("persisted match index equals inline matchAgainst, enforces its radius") {
    val ref = Seq(1L -> "spark", 2L -> "spork", 3L -> "shark", 4L -> "plane")
      .toDF("rid", "rname")
    val probes = Seq(10L -> "spark", 11L -> "sparkz", 12L -> "xyzzy",
      13L -> "plan").toDF("pid", "pname")
    val dir = "/root/repo/target/test_fuzzy_index"
    Fuzzy.buildMatchIndex(ref, "rname", "rid", dir, maxDist = 1)
    val viaIdx = Fuzzy.matchAgainstIndex(spark, dir, probes, "pname", "pid")
      .as[(Long, Long, Int)].collect().toSet
    val inline = Fuzzy.matchAgainst(probes, ref, "pname", "pid",
        "rname", "rid", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaIdx == inline && viaIdx.nonEmpty)
    // the radius comes from the sidecar, so a corrupt store fails loud
    val ex = intercept[IllegalArgumentException] {
      Fuzzy.matchAgainstIndex(spark, "/root/repo/target/nonexistent_fuzzy",
        probes, "pname", "pid")
    }
    assert(ex.getMessage.contains("sidecar") ||
      ex.getMessage.contains("no fuzzy-match-index"))
  }

  test("match index probes as a real stream") {
    val ref = Seq(1L -> "spark", 2L -> "plane").toDF("rid", "rname")
    val dir = "/root/repo/target/test_fuzzy_index_stream"
    Fuzzy.buildMatchIndex(ref, "rname", "rid", dir, maxDist = 1)
    val probesDf = Seq(10L -> "spurk", 11L -> "plane").toDF("pid", "pname")
    val pdir = "/root/repo/target/test_fuzzy_index_probes"
    probesDf.write.mode("overwrite").parquet(pdir)
    val stream = spark.readStream.schema(probesDf.schema).parquet(pdir)
    val out = Fuzzy.matchAgainstIndex(spark, dir, stream, "pname", "pid")
    assert(out.isStreaming)
    graft.streaming.EventStream.runToMemory(out, "fuzzy_idx_stream_out",
      mode = "append")
    val got = spark.table("fuzzy_idx_stream_out")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 1L, 1), (11L, 2L, 0)))
  }

  test("matchAgainst runs as a real stream-static streaming query") {
    val ref = Seq(1L -> "spark", 2L -> "spork", 3L -> "plane")
      .toDF("rid", "rname").localCheckpoint()
    val dir = "/root/repo/target/test_stream_fuzzy"
    val probesDf = Seq(10L -> "spark", 11L -> "sparkz", 12L -> "xyzzy")
      .toDF("pid", "pname")
    probesDf.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(probesDf.schema).parquet(dir)
    val out = Fuzzy.matchAgainst(stream, ref, "pname", "pid", "rname", "rid")
    assert(out.isStreaming)
    graft.streaming.EventStream.runToMemory(out, "fuzzy_stream_out",
      mode = "append")
    val got = spark.table("fuzzy_stream_out")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 1L, 0), (10L, 2L, 1), (11L, 1L, 1)))
  }

  test("collapseExact=false returns identical pairs on a duplicate-heavy corpus") {
    val names: Seq[(Long, String)] = Seq(
      1L -> "dup", 2L -> "dup", 3L -> "dup", 4L -> "dup!", 5L -> "dupe",
      6L -> "other", 7L -> "othe", 8L -> "dup")
    val df = names.toDF("id", "name")
    val collapsed = Fuzzy.editDistancePairs(df, "name", "id", 1)
      .as[(Long, Long, Int)].collect().toSet
    val direct = Fuzzy.editDistancePairs(df, "name", "id", 1,
        collapseExact = false)
      .as[(Long, Long, Int)].collect().toSet
    assert(collapsed == direct)
    assert(collapsed == brutePairs(names, 1).toSet)
    // the duplicate group produced its distance-0 combinations
    assert(collapsed.count(_._3 == 0) == 6) // C(4,2) over ids {1,2,3,8}
  }

  test("sorted-neighborhood pairs equal the window-join definition") {
    val names: Seq[(Long, String)] = Seq(
      1L -> "alpha", 2L -> "alphb", 3L -> "beta", 4L -> "betas",
      5L -> "gamma", 6L -> "alpha")
    val df = names.toDF("id", "name")
    val w = 3; val d = 2
    val got = Fuzzy.sortedNeighborhoodPairs(df, "name", "id",
        window = w, maxDist = d, assumeDeterministic = true)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    // reference: sort by (name, id), pair within w-1 positions, verify
    val ranked = names.sortBy(t => (t._2, t._1)).zipWithIndex
    val want = (for {
      ((ia, sa), pa) <- ranked; ((ib, sb), pb) <- ranked
      if pb > pa && pb - pa < w
      dist = levDist(sa, sb)
      if dist <= d
    } yield (math.min(ia, ib), math.max(ia, ib), dist))
      .sortBy(t => (t._1, t._2))
    assert(got == want && got.nonEmpty)
  }

  test("SNM with a phonetic (soundex) sort key pairs sound-alikes spelled apart") {
    // "robert"/"rupert" share soundex R163 but sort apart lexically (ruby
    // sits between) — the caller-chosen sortKeyCol is what makes SNM
    // complementary to the deletion join
    val rows = Seq(1L -> "robert", 2L -> "rupert", 3L -> "rob", 4L -> "ruby")
      .toDF("id", "name")
      .withColumn("phon", soundex(col("name")))
    val got = Fuzzy.sortedNeighborhoodPairs(rows, "name", "id",
        window = 2, maxDist = 2, sortKeyCol = Some("phon"),
        assumeDeterministic = true)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 2)))
    // the lexical sort key misses it at window 2 (ruby sits between them)
    val lexical = Fuzzy.sortedNeighborhoodPairs(rows, "name", "id",
        window = 2, maxDist = 2, assumeDeterministic = true)
      .as[(Long, Long, Int)].collect().toSet
    assert(!lexical.contains((1L, 2L, 2)))
    // null strings never pair and never bucket together
    val withNulls = Seq((1L, Some("abc")), (2L, None: Option[String]),
      (3L, None: Option[String])).toDF("id", "name")
    assert(Fuzzy.editDistancePairs(withNulls, "name", "id", 1).count() === 0)
    assert(Fuzzy.matchAgainst(withNulls, withNulls, "name", "id",
      "name", "id").count() === 1) // abc matches only itself
  }

  test("SNM Jaro-Winkler keeps high-prefix-similarity neighbors only") {
    val rows = Seq(1L -> "jonathan smith", 2L -> "jonathan smyth",
      3L -> "jonathan smithson", 4L -> "zachary")
    val got = Fuzzy.sortedNeighborhoodJaroWinkler(rows.toDF("id", "name"),
        "name", "id", window = 4, minSim = 0.93,
        assumeDeterministic = true)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    // smith/smyth and smith/smithson clear 0.93; zachary pairs with nothing
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.forall(t => t._3 >= 0.93 && t._3 <= 1.0))
  }

  test("streaming matchAgainst with eventTimeCol: watermark evicts pair state") {
    import java.sql.Timestamp
    val ref = Seq(1L -> "spark", 2L -> "plane").toDF("rid", "rname")
      .localCheckpoint()
    val dir = "/root/repo/target/test_stream_fuzzy_wm"
    val fs = new java.io.File(dir)
    if (fs.exists()) fs.listFiles().foreach(_.delete())
    def micro(id: Long, name: String, hour: Int) =
      Seq((id, name, Timestamp.valueOf(f"2026-01-01 $hour%02d:00:00")))
        .toDF("pid", "pname", "ts")
    micro(10L, "spurk", 0).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(micro(10L, "spurk", 0).schema).parquet(dir)
    val out = Fuzzy.matchAgainst(stream, ref, "pname", "pid", "rname", "rid",
      maxDist = 1, eventTimeCol = Some("ts"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("fuzzy_wm_out").start()
    try {
      q.processAllAvailable()
      micro(11L, "plune", 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
      micro(12L, "spark", 6).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("fuzzy_wm_out")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == Set((10L, 1L, 1), (11L, 2L, 1), (12L, 1L, 0)))
      // watermark advanced past earlier batches: pair-dedup state evicted
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "watermark never evicted dedup state")
      val finalState = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(Long.MaxValue)
      assert(finalState <= 2, s"state not bounded: $finalState rows")
    } finally q.stop()
  }

  test("damerau mode finds transposition pairs plain levenshtein misses") {
    val rows = Seq(1L -> "abcd", 2L -> "acbd", 3L -> "abdc", 4L -> "qqqq")
    val lev = Fuzzy.editDistancePairs(rows.toDF("id", "s"), "s", "id", 1)
      .as[(Long, Long, Int)].collect().toSet
    val dam = Fuzzy.editDistancePairs(rows.toDF("id", "s"), "s", "id", 1,
        damerau = true)
      .as[(Long, Long, Int)].collect().toSet
    assert(lev.isEmpty) // each transposition is levenshtein distance 2
    assert(dam == Set((1L, 2L, 1), (1L, 3L, 1)))
  }

  test("matchAgainst damerau mode resolves transposed probes") {
    val ref = Seq(1L -> "abcd", 2L -> "wxyz").toDF("rid", "rname")
    val probes = Seq(10L -> "acbd").toDF("pid", "pname")
    val lev = Fuzzy.matchAgainst(probes, ref, "pname", "pid", "rname", "rid")
      .collect()
    val dam = Fuzzy.matchAgainst(probes, ref, "pname", "pid", "rname", "rid",
        damerau = true)
      .as[(Long, Long, Int)].collect().toSeq
    assert(lev.isEmpty) // levenshtein says 2
    assert(dam == Seq((10L, 1L, 1)))
  }

  test("damerau_levenshtein is SQL-callable after registration") {
    org.apache.spark.sql.graft.ColumnShim.registerFunction(spark,
      "damerau_levenshtein",
      exprs => graft.expr.VectorExprs.DamerauLevenshtein(exprs(0), exprs(1)))
    assert(spark.sql("SELECT damerau_levenshtein('ca', 'abc') AS d")
      .head.getInt(0) == 2)
  }

  test("fuzzy pair plan has no cartesian product and one distinct-pair exchange") {
    val df = Seq(1L -> "aa", 2L -> "ab").toDF("id", "name")
    val plan = Fuzzy.editDistancePairs(df, "name", "id", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
