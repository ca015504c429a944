package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** X61 DSIR: feature counts include bigrams, a degenerate single
  * bucket zeroes every ratio, target-like vocabulary outranks
  * non-target vocabulary, selection is deterministic and k-bounded.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("hashed counts cover unigrams + bigrams (2·len − 1 grams)") {
    val f = Dsir.hashedNgramCounts(docs((1L, "a b c")), "doc_id", "text",
      dim = 1, seed = "s").as[(Long, Long, Long)].collect()
    // dim=1 collapses every gram into bucket 0: 3 unigrams + 2 bigrams
    assert(f.toSeq === Seq((1L, 0L, 5L)))
  }

  test("a single bucket makes every log-ratio zero") {
    val d = docs((1L, "a b"), (2L, "c d"), (3L, "e f"))
    val r = Dsir.bucketLogRatios(
        Dsir.hashedNgramCounts(d, "doc_id", "text", 1, "s"),
        Seq(1L).toDF("doc_id"), "doc_id", dim = 1)
      .as[(Long, Long)].collect()
    // tgt fraction (t+1)/(T+1) and raw fraction (r+1)/(R+1) differ, but
    // with dim=1 both micro-lns are of the same-shaped smoothed MLE over
    // one bucket... compute directly instead of assuming: t=3,T=3 →
    // ln(4/4)=0; r=9,R=9 → ln(10/10)=0
    assert(r.toSeq === Seq((0L, 0L)))
  }

  test("target-like vocabulary outranks non-target vocabulary") {
    // targets speak aa/bb; distractors speak zz/yy; two fresh docs,
    // one per vocabulary — the target-like one must weigh more
    val d = docs(
      (1L, "aa bb aa bb aa"), (2L, "bb aa bb aa bb"),
      (3L, "zz yy zz yy zz"), (4L, "yy zz yy zz yy"),
      (10L, "aa bb aa"), (11L, "zz yy zz"))
    val sel = Dsir.select(d, Seq(1L, 2L).toDF("doc_id"), "doc_id", "text",
        k = 6, dim = 64, seed = "s")
      .as[(Long, Long, Long)].collect()
    val w = sel.map(r => r._1 -> r._2).toMap
    assert(w(10L) > w(11L))
    assert(w(1L) > w(3L))
  }

  test("selection is k-bounded, deterministic, ties to the lower id") {
    val d = docs((1L to 20L).map(i => (i, s"tok$i common word")): _*)
    val tgt = Seq(1L, 2L, 3L).toDF("doc_id")
    def run() = Dsir.select(d, tgt, "doc_id", "text", k = 5, dim = 32,
      seed = "s").as[(Long, Long, Long)].collect().toSeq
    val a = run()
    assert(a.size === 5)
    assert(a === run())
    // keys strictly ordered desc (Gumbel keys collide with ~0 prob;
    // the deterministic tie rule is still pinned by the plan's sort)
    assert(a.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("k beyond the corpus returns every document") {
    val d = docs((1L, "a b"), (2L, "c d"))
    val sel = Dsir.select(d, Seq(1L).toDF("doc_id"), "doc_id", "text",
      k = 10, dim = 8, seed = "s")
    assert(sel.count() === 2L)
  }
}
