package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern matching (Aho & Corasick 1975): ONE pass over
  * each document finds every occurrence of every pattern in a dictionary —
  * the scale shape for dictionary-based filtering/tagging/redaction
  * (blocklists, quality phrase lists, PII dictionaries) where a per-pattern
  * regex pass would cost O(patterns × corpus).
  *
  * The automaton is built once on the driver (size ≈ Σ pattern length) and
  * ships to executors in the task closure — the classic broadcast-model
  * pattern, same discipline as the PQ codebooks. Matching is O(text length
  * + matches) per document regardless of dictionary size.
  */
final class AhoCorasick(val patterns: IndexedSeq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  // trie with goto/fail/output tables, built breadth-first
  private val (gotoMaps, fail, outputs) = {
    val gm = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        node = gm(node).getOrElseUpdate(ch, {
          gm += scala.collection.mutable.Map.empty[Char, Int]
          out += Nil
          gm.length - 1
        })
      }
      out(node) ::= pi
    }
    val fl = Array.fill(gm.length)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    gm(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gm(u).foreach { case (ch, v) =>
        queue.enqueue(v)
        var f = fl(u)
        while (f != 0 && !gm(f).contains(ch)) f = fl(f)
        fl(v) = if (gm(f).contains(ch) && gm(f)(ch) != v) gm(f)(ch) else 0
        out(v) = out(v) ++ out(fl(v)) // suffix matches surface here too
      }
    }
    (gm.map(_.toMap).toIndexedSeq, fl, out.map(_.toArray).toIndexedSeq)
  }

  /** Occurrence count per pattern index (ALL occurrences, overlapping
    * included — standard AC semantics). */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !gotoMaps(node).contains(ch)) node = fail(node)
      node = gotoMaps(node).getOrElse(ch, 0)
      val out = outputs(node)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Per-document occurrence counts of every dictionary pattern, emitted as
    * (id, pattern, n_matches) for patterns with ≥1 match. One automaton
    * scan per document (mapPartitions; the automaton rides the closure);
    * no shuffle, no per-pattern pass. */
  def multiPatternCounts(spark: SparkSession, docs: DataFrame,
                         patterns: Seq[String], idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val ac = new AhoCorasick(patterns.toIndexedSeq)
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(it => it.flatMap { case (id, text) =>
        val counts = ac.countMatches(text)
        Iterator.range(0, counts.length).filter(counts(_) > 0)
          .map(p => (id, ac.patterns(p), counts(p)))
      })
      .toDF(idCol, "pattern", "n_matches")
  }
}
