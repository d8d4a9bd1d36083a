package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Chat-template rendering and loss-mask span derivation. */
class SftSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed two-turn conversation: text, spans, masked chars") {
    val turns = Seq((1L, 0L, "user", "hi"), (1L, 1L, "assistant", "yo!"))
      .toDF("conv", "ord", "role", "text")
    val r = Sft.renderChat(turns, "conv", "ord", "role", "text").head()
    assert(r.getAs[Int]("n_turns") === 2)
    assert(r.getAs[String]("text") === "<|user|>hi\n<|assistant|>yo!\n")
    // turn 2: offset 11 ("<|user|>hi\n"), tag "<|assistant|>" = 13 chars
    // -> span [24, 27)
    assert(r.getAs[String]("mask_spans") === "24:27")
    assert(r.getAs[Int]("masked_chars") === 3)
  }

  test("spans slice the rendered text back to exactly the masked turns") {
    // 120 documents -> 12 conversations of 10 alternating turns; every
    // span, substring'd out of the rendered text, must equal the
    // original turn text — the self-consistency a trainer depends on
    val turns = (0L until 120L).map { i =>
      (i % 12, i, if ((i / 12) % 2 == 0) "user" else "assistant",
        s"turn $i body ${"x" * (i % 7).toInt}")
    }.toDF("conv", "ord", "role", "text")
    val out = Sft.renderChat(turns, "conv", "ord", "role", "text").collect()
    assert(out.length === 12)
    val byConv = turns.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .groupBy(_._1)
    out.foreach { r =>
      val conv = r.getLong(0)
      val text = r.getAs[String]("text")
      val spans = r.getAs[String]("mask_spans").split(",").filter(_.nonEmpty)
        .map { s => val Array(a, b) = s.split(":"); (a.toInt, b.toInt) }
      val wantMasked = byConv(conv).sortBy(_._2)
        .filter(_._3 == "assistant").map(_._4)
      assert(spans.length === wantMasked.length, s"conv $conv")
      spans.zip(wantMasked).foreach { case ((a, b), want) =>
        assert(text.substring(a, b) === want, s"conv $conv span $a:$b")
      }
      assert(r.getAs[Int]("masked_chars") === wantMasked.map(_.length).sum)
    }
  }

  test("no masked role -> empty spans; null text renders empty; maskRole override") {
    val turns = Seq((1L, 0L, "user", "q"), (1L, 1L, "tool", null))
      .toDF("conv", "ord", "role", "text")
    val r = Sft.renderChat(turns, "conv", "ord", "role", "text").head()
    assert(r.getAs[String]("mask_spans") === "")
    assert(r.getAs[Int]("masked_chars") === 0)
    assert(r.getAs[String]("text") === "<|user|>q\n<|tool|>\n")
    // masking the tool role instead: null text -> empty span s:s
    val r2 = Sft.renderChat(turns, "conv", "ord", "role", "text",
      maskRole = "tool").head()
    assert(r2.getAs[String]("mask_spans") === "18:18")
  }

  test("offsets count code points, not bytes or UTF-16 units") {
    // "héllo𝄞" = 6 code points (𝄞 is a surrogate pair in UTF-16)
    val turns = Seq((1L, 0L, "user", "héllo𝄞"), (1L, 1L, "assistant", "ok"))
      .toDF("conv", "ord", "role", "text")
    val r = Sft.renderChat(turns, "conv", "ord", "role", "text").head()
    // turn 1 renders 8 + 6 + 1 = 15 code points; span = [15+13, 15+13+2)
    assert(r.getAs[String]("mask_spans") === "28:30")
  }

  test("conversations are independent and deterministic across partitionings") {
    val turns = (0L until 90L).map(i =>
      (i % 9, i, if (i % 2 == 0) "user" else "assistant", s"t$i"))
      .toDF("conv", "ord", "role", "text")
    val a = Sft.renderChat(turns, "conv", "ord", "role", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sft.renderChat(turns.repartition(17), "conv", "ord", "role", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b && a.size === 9)
  }

  test("FIM transform: hand splits, round-trip, SPM order, code points") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    // p = 0.3 / 0.7 on 10 chars: lo=3 hi=7 -> abc / defg / hij
    val psm = Sft.fimTransform(docs, "text", "doc_id",
      lit(0.3), lit(0.7)).head()
    assert(psm.getString(1) === "<|fim_pre|>abc<|fim_suf|>hij<|fim_mid|>defg")
    assert((psm.getInt(2), psm.getInt(3), psm.getInt(4)) === ((3, 4, 3)))
    // fraction order never matters
    val swapped = Sft.fimTransform(docs, "text", "doc_id",
      lit(0.7), lit(0.3)).head()
    assert(swapped.getString(1) === psm.getString(1))
    // SPM leads with the suffix
    val spm = Sft.fimTransform(docs, "text", "doc_id",
      lit(0.3), lit(0.7), spm = true).head()
    assert(spm.getString(1) === "<|fim_suf|>hij<|fim_pre|>abc<|fim_mid|>defg")
    // round-trip: prefix + middle + suffix reassembles EVERY document
    val many = (0L until 50L).map(i => (i, s"doc $i body " + ("x" * (i % 7).toInt)))
      .toDF("doc_id", "text")
    val parts = Sft.fimTransform(many, "text", "doc_id",
      (col("doc_id") * 13 % 97).cast("double") / 97.0,
      (col("doc_id") * 29 % 89).cast("double") / 89.0)
    val re = parts.select(col("doc_id"),
        regexp_extract(col("fim_text"),
          "<\\|fim_pre\\|>(.*)<\\|fim_suf\\|>(.*)<\\|fim_mid\\|>(.*)", 1)
          .as("p"),
        regexp_extract(col("fim_text"),
          "<\\|fim_pre\\|>(.*)<\\|fim_suf\\|>(.*)<\\|fim_mid\\|>(.*)", 3)
          .as("m"),
        regexp_extract(col("fim_text"),
          "<\\|fim_pre\\|>(.*)<\\|fim_suf\\|>(.*)<\\|fim_mid\\|>(.*)", 2)
          .as("s"))
      .join(many, "doc_id")
      .filter(concat(col("p"), col("m"), col("s")) =!= col("text"))
    assert(re.count() === 0)
    // offsets are CODE POINTS: the surrogate-pair char counts once
    val uni = Sft.fimTransform(
      Seq((1L, "a𝄞bc")).toDF("doc_id", "text"), "text", "doc_id",
      lit(0.5), lit(0.75)).head()
    assert((uni.getInt(2), uni.getInt(3), uni.getInt(4)) === ((2, 1, 1)))
    assert(uni.getString(1) === "<|fim_pre|>a𝄞<|fim_suf|>c<|fim_mid|>b")
    // null text -> empty parts, no NaN/null output
    val nul = Sft.fimTransform(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "text", "doc_id", lit(0.3), lit(0.7)).head()
    assert(nul.getString(1) === "<|fim_pre|><|fim_suf|><|fim_mid|>")
    // a null / out-of-range fraction refuses loudly instead of clipping
    // into empty parts that would silently break the round-trip
    val doc = Seq((1L, "abcdef")).toDF("doc_id", "text")
    for (bad <- Seq(lit(-0.1), lit(1.5), lit(null).cast("double"),
        lit(Double.NaN))) {
      val e = intercept[Exception](
        Sft.fimTransform(doc, "text", "doc_id", bad, lit(0.5)).collect())
      def msgs(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs(e).contains("fraction out of [0, 1]"), msgs(e))
    }
    // boundary values 0 and 1 are legal (empty prefix / empty suffix)
    val edge = Sft.fimTransform(doc, "text", "doc_id", lit(0.0), lit(1.0))
      .head()
    assert(edge.getString(1) === "<|fim_pre|><|fim_suf|><|fim_mid|>abcdef")
  }

  test("preference pairs: best-worst, gap filter, singleton drop, tie ids") {
    val r = Seq(
      ("A", 1L, "a", 3.0), ("A", 2L, "b", 9.0), ("A", 3L, "c", 5.0),
      ("B", 4L, "only", 1.0),                       // singleton: dropped
      ("C", 5L, "x", 2.0), ("C", 6L, "y", 2.0),     // all tied
      ("D", 7L, "p", 7.0), ("D", 8L, "q", 7.0), ("D", 9L, "r", 1.0))
      .toDF("prompt", "rid", "text", "score")
    val got = Sft.preferencePairs(r, "prompt", "rid", "text", "score")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3), x.getString(4),
          x.getDouble(5)))).toMap
    assert(got("A") === ((2L, 1L, "b", "a", 6.0)))
    // all-tied prompt still yields two DISTINCT responses (ids break
    // opposite ways), gap 0 survives the default minGap = 0
    assert(got("C") === ((5L, 6L, "x", "y", 0.0)))
    // chosen tie -> smallest id wins
    assert(got("D") === ((7L, 9L, "p", "r", 6.0)))
    assert(!got.contains("B"))
    // a gap floor drops the tied prompt
    val gapped = Sft.preferencePairs(r, "prompt", "rid", "text", "score",
      minGap = 0.5).collect().map(_.getString(0)).toSet
    assert(gapped === Set("A", "D"))
    intercept[IllegalArgumentException](Sft.preferencePairs(
      r, "prompt", "rid", "text", "score", minGap = -1))
  }

  test("preference pairs: all-pairs mode expands rankings, ties never pair") {
    val r = Seq(
      ("A", 1L, "a", 1.0), ("A", 2L, "b", 2.0), ("A", 3L, "c", 3.0),
      ("C", 5L, "x", 2.0), ("C", 6L, "y", 2.0))
      .toDF("prompt", "rid", "text", "score")
    val all = Sft.preferencePairs(r, "prompt", "rid", "text", "score",
        allPairs = true)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      .toSet
    // A: every strictly-better ordered pair; C: tied, no pair at all
    assert(all === Set(("A", 3L, 2L), ("A", 3L, 1L), ("A", 2L, 1L)))
    val gapped = Sft.preferencePairs(r, "prompt", "rid", "text", "score",
        minGap = 1.5, allPairs = true)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSet
    assert(gapped === Set((3L, 1L)))
    // null text renders as empty string, not null
    val n = Sft.preferencePairs(
      Seq(("E", 1L, null.asInstanceOf[String], 1.0), ("E", 2L, "t", 2.0))
        .toDF("prompt", "rid", "text", "score"),
      "prompt", "rid", "text", "score").head()
    assert(n.getString(4) === "")
  }

  test("Bradley-Terry: two-model closed form, counts, determinism") {
    // A beats B 3x, B beats A 1x -> the MM fixpoint is pi_A = 3/4
    // (reached in one round from the uniform start: den_A = 4/(0.5+0.5))
    val battles = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("winner", "loser")
    val got = Sft.bradleyTerry(battles, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") === ((0.75, 3L, 4L)))
    assert(got("B") === ((0.25, 1L, 4L)))
    // repartitioning never changes the fit (pair counts are exact)
    val got2 = Sft.bradleyTerry(battles.repartition(7), "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got2 === got.map { case (k, v) => k -> v._1 })
  }

  test("Bradley-Terry: zero-win sink, disconnected components, self-battles") {
    // B never wins -> strength 0; the C/D component ranks independently
    // and the global normalization splits mass across components
    val battles = Seq(("A", "B"), ("A", "B"), ("C", "D"))
      .toDF("winner", "loser")
    val got = Sft.bradleyTerry(battles, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") === ((0.5, 2L, 2L)))
    assert(got("B") === ((0.0, 0L, 2L)))
    assert(got("C") === ((0.5, 1L, 1L)))
    assert(got("D") === ((0.0, 0L, 1L)))
    // self-battles are dropped, not counted
    val self = Sft.bradleyTerry(
      battles.unionByName(Seq(("A", "A")).toDF("winner", "loser")),
      "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(self("A") === 2L)
  }

  test("Bradley-Terry: strengths sum to ~1, transitive order, refusals") {
    // A > B > C by win rate; fitted strengths must respect the order
    val battles = (Seq.fill(4)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(4)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
      Seq.fill(3)(("A", "C")))
      .toDF("winner", "loser")
    val got = Sft.bradleyTerry(battles, "winner", "loser", iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-6, got)
    assert(got("A") > got("B") && got("B") > got("C"), got)
    // null model ids coalesce to a sentinel instead of crashing
    val n = Sft.bradleyTerry(
      Seq((null.asInstanceOf[String], "B")).toDF("winner", "loser"),
      "winner", "loser").collect().map(_.getString(0)).toSet
    assert(n === Set("__null__", "B"))
    intercept[IllegalArgumentException](
      Sft.bradleyTerry(battles, "winner", "loser", iters = 0))
    intercept[IllegalArgumentException](
      Sft.bradleyTerry(battles, "winner", "loser", maxModels = 2))
    intercept[IllegalArgumentException](Sft.bradleyTerry(
      battles.filter(lit(false)), "winner", "loser"))
  }

  test("eloRatings: hand-computed updates, order dependence, counts") {
    // battle 1 at equal ratings: E_w = 0.5, delta = 32*0.5 = 16
    val one = Seq((1L, "A", "B")).toDF("ord", "winner", "loser")
    val r1 = Sft.eloRatings(one, "winner", "loser", "ord")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(r1("A") === ((1016.0, 1L, 0L, 1L)))
    assert(r1("B") === ((984.0, 0L, 1L, 1L)))
    // second A win moves less (A is now favored): E_w > 0.5
    val two = Seq((1L, "A", "B"), (2L, "A", "B"))
      .toDF("ord", "winner", "loser")
    val r2 = Sft.eloRatings(two, "winner", "loser", "ord")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ew2 = BigDecimal(1.0 / (1.0 + math.pow(10.0, -32.0 / 400.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2("A") === BigDecimal(1016.0 + 32.0 * (1.0 - ew2))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r2("A") - 1016.0 < 16.0 && r2("A") > 1016.0)
    // order matters: win-then-lose ends differently from lose-then-win
    val wl = Sft.eloRatings(
      Seq((1L, "A", "B"), (2L, "B", "A")).toDF("ord", "winner", "loser"),
      "winner", "loser", "ord")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val lw = Sft.eloRatings(
      Seq((2L, "A", "B"), (1L, "B", "A")).toDF("ord", "winner", "loser"),
      "winner", "loser", "ord")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wl("A") !== lw("A"))
    // and the loser of the most recent game sits below initial
    assert(wl("A") < 1000.0 && lw("A") > 1000.0)
  }

  test("eloRatings: numeric order, refusals, rating conservation") {
    // a numeric orderCol must sort numerically (2 before 10 — a string
    // cast would fold "10" before "2")
    val battles = Seq((2L, "A", "B"), (10L, "B", "C"), (1L, "C", "A"))
      .toDF("ord", "winner", "loser")
    val got = Sft.eloRatings(battles, "winner", "loser", "ord")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // replay by hand: C>A at 1, A>B at 2, B>C at 10
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var rt = Map("A" -> 1000.0, "B" -> 1000.0, "C" -> 1000.0)
    for ((w, l) <- Seq(("C", "A"), ("A", "B"), ("B", "C"))) {
      val ew = r9(1.0 / (1.0 + math.pow(10.0, (rt(l) - rt(w)) / 400.0)))
      rt += w -> r9(rt(w) + 32.0 * (1.0 - ew))
      rt += l -> r9(rt(l) - 32.0 * (1.0 - ew))
    }
    assert(got === rt)
    // zero-sum updates conserve total rating (up to the 9dp rounding)
    assert(math.abs(got.values.sum - 3000.0) < 1e-6)
    // duplicate order values refuse loudly
    intercept[IllegalArgumentException](Sft.eloRatings(
      Seq((1L, "A", "B"), (1L, "B", "C")).toDF("ord", "winner", "loser"),
      "winner", "loser", "ord").collect())
    // a corpus-sized log refuses with the bradleyTerry pointer
    val e = intercept[IllegalArgumentException](Sft.eloRatings(
      battles, "winner", "loser", "ord", maxBattles = 2))
    assert(e.getMessage.contains("bradleyTerry"), e.getMessage)
    intercept[IllegalArgumentException](Sft.eloRatings(
      battles.filter(lit(false)), "winner", "loser", "ord"))
    intercept[IllegalArgumentException](Sft.eloRatings(
      battles, "winner", "loser", "ord", k = 0.0))
  }
}
