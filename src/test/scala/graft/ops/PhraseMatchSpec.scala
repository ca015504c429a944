package graft.ops

import graft.SparkSpec
import graft.functions.{AcAutomaton, AhoCorasickHits}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

class PhraseMatchSpec extends SparkSpec {
  import spark.implicits._

  test("automaton: overlapping, nested, and fail-chain matches") {
    val ac = new AcAutomaton(Seq("he", "hers", "his", "she"))
    // 'she' contains 'he' via the fail chain; ids are list positions
    assert(ac.search("ushers").toSeq === Seq(0, 1, 3)) // he, hers, she
    assert(ac.search("this").toSeq === Seq(2))
    assert(ac.search("xyz").toSeq === Seq.empty)
    assert(ac.search("").toSeq === Seq.empty)
    // repeated occurrences report once (distinct semantics)
    assert(ac.search("hehehe").toSeq === Seq(0))
  }

  test("expression rejects unsorted or duplicate pattern lists") {
    intercept[IllegalArgumentException] {
      AhoCorasickHits(GraftBridge.expression(lit("x")), Seq("b", "a"))
    }
    intercept[IllegalArgumentException] {
      AhoCorasickHits(GraftBridge.expression(lit("x")), Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      AhoCorasickHits(GraftBridge.expression(lit("x")), Seq.empty)
    }
    // '' would never be reported by the automaton though contains
    // matches it — rejected loudly rather than silently diverging
    intercept[IllegalArgumentException] {
      AhoCorasickHits(GraftBridge.expression(lit("x")), Seq("", "a"))
    }
  }

  test("coverage equals per-phrase contains on every doc") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick quick she said"),
      (3L, "nothing here matches"),
      (4L, "")).toDF("doc_id", "text")
    val phrases = Seq("quick", "she", "he quick", "own fo")
    val got = PhraseMatch.coverage(docs, "doc_id", "text", phrases)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // naive truth: sorted phrase list filtered by contains
    val sorted = phrases.sorted
    val want = docs.collect().map { r =>
      val hs = sorted.filter(p => r.getString(1).contains(p))
      (r.getLong(0), hs.size.toLong, hs.mkString(","))
    }.sortBy(_._1).toSeq
    assert(got.toSeq === want)
  }

  test("topPhrases: deterministic count-desc gram-asc ranking") {
    val docs = Seq((1L, "a b c a b c a b d"), (2L, "a b d x y z"))
      .toDF("doc_id", "text")
    // trigram counts: 'a b c'=2, 'a b d'=2, others 1 -> tie broken asc
    val top = PhraseMatch.topPhrases(docs, "text", n = 3, k = 2)
    assert(top === Seq("a b c", "a b d"))
  }

  test("phrases spanning word boundaries match as substrings") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = PhraseMatch.coverage(docs, "doc_id", "text",
      Seq("a bet", "beta g", "gamma x")).collect().head
    assert(r.getLong(1) === 2 && r.getString(2) === "a bet,beta g")
  }
}
