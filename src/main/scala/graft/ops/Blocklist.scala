package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist matching via Aho–Corasick (1975): ONE pass
  * over each document finds every occurrence of every pattern —
  * O(text + matches) per document REGARDLESS of the pattern count,
  * where the naive form (a LIKE/contains per pattern, or a pattern
  * cross join) pays O(patterns × text). Blocklists in corpus curation
  * run to thousands of terms (slurs, boilerplate markers, spam hosts),
  * which is exactly where the automaton wins.
  *
  * Match semantics: every (pattern, end-position) pair counts —
  * overlapping and nested matches included (`he` inside `she` counts
  * both; `aa` in `aaa` counts twice). Matching is code-unit exact and
  * case-sensitive; callers wanting case folding lower both sides (the
  * tokenizer convention — keeps the oracle replayable).
  *
  * Scale shape: the automaton is built ONCE on the driver — O(Σ
  * pattern-lengths) nodes — and rides the scan closure like the
  * tokenizer vocabularies; the scan is one UDF pass per document, no
  * join, no explode, no shuffle beyond the caller's.
  */
object Blocklist {

  /** Goto/fail/output automaton over exact code-unit patterns. Rides
    * the scan closure (Serializable), like the tokenizer vocabularies. */
  private[ops] final class Ac(patterns: IndexedSeq[String])
      extends Serializable {
    private val children =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
    private val outs =
      scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = children(s).getOrElseUpdate(ch, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          outs += Nil
          children.length - 1
        })
      }
      outs(s) = pi :: outs(s)
    }
    // BFS failure links; output sets merge along them
    private val fail = Array.fill(children.length)(0)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach(queue.enqueue(_))
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        children(s).foreach { case (ch, nxt) =>
          var f = fail(s)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(nxt) =
            if (children(f).contains(ch) && children(f)(ch) != nxt)
              children(f)(ch)
            else 0
          outs(nxt) = outs(nxt) ++ outs(fail(nxt))
          queue.enqueue(nxt)
        }
      }
    }

    /** Occurrence count per pattern index. */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      if (text == null) return counts
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !children(s).contains(ch)) s = fail(s)
        s = children(s).getOrElse(ch, 0)
        outs(s).foreach(pi => counts(pi) += 1)
        i += 1
      }
      counts
    }
  }

  /** Per-document blocklist census: (id, n_matches, n_patterns,
    * patterns_csv) — total occurrences (overlaps included), distinct
    * patterns hit, and the hit patterns as a sorted CSV scalar (the
    * driver comparator cannot sort array columns). Documents with no
    * hit emit (0, 0, "").
    */
  def blocklistMatches(docs: DataFrame, textCol: String, idCol: String,
                       patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "blocklist: at least one pattern")
    require(patterns.forall(_.nonEmpty), "blocklist: empty pattern")
    require(patterns.distinct.size == patterns.size,
      s"blocklist: duplicate patterns")
    val pats = patterns.toIndexedSeq
    val ac = new Ac(pats)
    val census = udf { (text: String) =>
      val c = ac.countMatches(text)
      val hit = pats.indices.filter(c(_) > 0)
      (c.sum, hit.length, hit.map(pats).sorted.mkString(","))
    }
    docs.select(col(idCol), census(col(textCol).cast("string")).as("__c"))
      .select(col(idCol), col("__c._1").as("n_matches"),
        col("__c._2").as("n_patterns"), col("__c._3").as("patterns_csv"))
  }
}
