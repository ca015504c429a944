package graft.ops

import graft.SparkSpec
import graft.engine.Tables

/** X52 invariants beyond the DuckDB oracle: exact agreement with an
  * independent driver-side reference implementation of interpolated
  * Kneser-Ney (plain Scala maps and loops — no shared code with the
  * operator), plus the contract edges: short docs, unseen mass, and the
  * seen-vs-gibberish ordering a quality filter exists for.
  */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private val S = KneserNey.Scale

  /** Textbook interpolated KN over integer fixed point — the same math
    * written the single-machine way (BigInt, maps, loops). With
    * `estimated`, per-order discounts come from the count-of-count
    * estimate a/b = n1/(n1+2n2), falling back to 3/4 when n1 = 0.
    */
  private def reference(refDocs: Seq[String], doc: String,
                        estimated: Boolean = false): (Long, Long, Long) = {
    def grams(ts: Seq[String], n: Int): Seq[String] =
      if (ts.length < n) Seq.empty
      else ts.sliding(n).map(_.mkString(" ")).toSeq
    def sfx(g: String, k: Int) = g.split(" ").takeRight(k).mkString(" ")
    def pfx(g: String, k: Int) = g.split(" ").take(k).mkString(" ")
    val refToks = refDocs.map(_.split(" ").toSeq)
    val c5 = refToks.flatMap(grams(_, 5)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val h5 = c5.toSeq.groupBy(p => pfx(p._1, 4))
      .view.mapValues(v => (v.map(_._2).sum, v.size.toLong)).toMap
    def cont(n: Int): Map[String, Long] =
      refToks.flatMap(grams(_, n)).distinct.groupBy(g => sfx(g, n - 1))
        .view.mapValues(_.size.toLong).toMap
    val (cont4, cont3, cont2, cont1) = (cont(5), cont(4), cont(3), cont(2))
    def hist(c: Map[String, Long], k: Int): Map[String, (Long, Long)] =
      c.toSeq.groupBy(p => pfx(p._1, k))
        .view.mapValues(v => (v.map(_._2).sum, v.size.toLong)).toMap
    val (hist4, hist3, hist2) = (hist(cont4, 3), hist(cont3, 2), hist(cont2, 1))
    val tc1 = cont1.values.sum
    val v1 = cont1.size.toLong
    val v = refToks.flatten.distinct.size.toLong
    val p0 = S / v
    def discount(counts: Iterable[Long]): (Long, Long) =
      if (!estimated) (3L, 4L)
      else {
        val n1 = counts.count(_ == 1L).toLong
        val n2 = counts.count(_ == 2L).toLong
        if (n1 == 0L) (3L, 4L) else (n1, n1 + 2 * n2)
      }
    val (a5, b5) = discount(c5.values)
    val (a4, b4) = discount(cont4.values)
    val (a3, b3) = discount(cont3.values)
    val (a2, b2) = discount(cont2.values)
    val (a1, b1) = discount(cont1.values)
    def ord(cnt: Long, h: Option[(Long, Long)], pLow: Long,
            a: Long, b: Long): Long = h match {
      case None => pLow
      case Some((den, n1p)) =>
        (((BigInt(b) * cnt - a).max(BigInt(0)) * S +
          BigInt(a) * n1p * pLow) / (BigInt(b) * den)).toLong
    }
    val positions = grams(doc.split(" ").toSeq, 5)
    var (sum, unseen) = (0L, 0L)
    positions.foreach { g =>
      val cn1 = cont1.getOrElse(sfx(g, 1), 0L)
      val p1 = (((BigInt(b1) * cn1 - a1).max(BigInt(0)) * S +
        BigInt(a1) * v1 * p0) / (BigInt(b1) * tc1)).toLong
      val p2 = ord(cont2.getOrElse(sfx(g, 2), 0L),
        hist2.get(pfx(sfx(g, 2), 1)), p1, a2, b2)
      val p3 = ord(cont3.getOrElse(sfx(g, 3), 0L),
        hist3.get(pfx(sfx(g, 3), 2)), p2, a3, b3)
      val p4 = ord(cont4.getOrElse(sfx(g, 4), 0L),
        hist4.get(pfx(sfx(g, 4), 3)), p3, a4, b4)
      val p5 = ord(c5.getOrElse(g, 0L), h5.get(pfx(g, 4)), p4, a5, b5)
      sum += p5
      if (c5.getOrElse(g, 0L) == 0L) unseen += 1
    }
    (positions.size.toLong, unseen, sum)
  }

  private def sparkScore(refDocs: Seq[String], docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] =
    KneserNey.score(
      docs.toDF("doc_id", "text"),
      refDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "doc_id", "text")
      .select("doc_id", "n_ngrams", "n_unseen", "sum_p_fix")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("matches the independent reference implementation on real corpus docs") {
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val refDocs = texts.take(25).map(_._2)
    val scoreDocs = texts.slice(20, 35) // overlaps ref + unseen docs
    val got = sparkScore(refDocs, scoreDocs)
    scoreDocs.foreach { case (id, text) =>
      assert(got(id) === reference(refDocs, text),
        s"doc $id diverges from the reference KN implementation")
    }
  }

  test("modified KN (estimated discounts) matches the reference implementation") {
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val refDocs = texts.take(25).map(_._2)
    val scoreDocs = texts.slice(20, 32)
    val got = KneserNey.scoreModified(
      scoreDocs.toDF("doc_id", "text"),
      refDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "doc_id", "text")
      .select("doc_id", "n_ngrams", "n_unseen", "sum_p_fix")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    scoreDocs.foreach { case (id, text) =>
      assert(got(id) === reference(refDocs, text, estimated = true),
        s"doc $id diverges from the modified-KN reference")
    }
    // on a real corpus the estimate must actually differ from 3/4 for
    // at least one doc's score (else this test proves nothing)
    assert(scoreDocs.exists { case (id, text) =>
      got(id) !== reference(refDocs, text, estimated = false)
    })
  }

  test("estimated discounts fall back to 3/4 when an order has no singletons") {
    // every bigram occurs exactly twice -> n1 = 0 at several orders;
    // must not divide by zero and must equal the fixed-discount model
    // wherever ALL orders fall back
    val ref = Seq("a b a b", "a b a b")
    val got = KneserNey.scoreModified(
      Seq((1L, "a b a b a")).toDF("doc_id", "text"),
      ref.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "doc_id", "text")
      .select("n_ngrams", "n_unseen", "sum_p_fix")
      .as[(Long, Long, Long)].head()
    val want = reference(ref, "a b a b a", estimated = true)
    assert((want._1, want._2, want._3) === got)
  }

  test("documents shorter than 5 tokens have no positions and no row") {
    val got = sparkScore(Seq("a b c d e f g"), Seq(1L -> "a b c d", 2L -> "a b c d e"))
    assert(!got.contains(1L))
    assert(got(2L)._1 === 1L)
  }

  test("perplexity buckets: tertile thresholds from the ref slice, value-based assignment") {
    // 9 ref docs, distinct scores 90..10 -> cut ranks (9+2)div3=3 and
    // (18+2)div3=6: t1 = 70, t2 = 40. Non-ref docs 20/21/22 probe the
    // boundaries: 70 is head (>= t1), 40 middle (>= t2), 39 tail.
    val scored = ((1L to 9L).map(i => (i, 100L - i * 10L)) ++
      Seq((20L, 70L), (21L, 40L), (22L, 39L)))
      .toDF("doc_id", "avg_p_fix")
    val refIds = (1L to 9L).toDF("doc_id")
    val got = KneserNey.perplexityBuckets(scored, refIds, "doc_id")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert((1L to 3L).forall(got(_) == "head"))
    assert((4L to 6L).forall(got(_) == "middle"))
    assert((7L to 9L).forall(got(_) == "tail"))
    assert(got(20L) === "head")
    assert(got(21L) === "middle")
    assert(got(22L) === "tail")
  }

  test("perplexity buckets: empty reference slice fails loudly at the action") {
    // The guard is IN the plan (no driver-side isEmpty job at build
    // time): building the frame is free, the first action raises.
    val scored = Seq((1L, 50L)).toDF("doc_id", "avg_p_fix")
    val refIds = Seq(99L).toDF("doc_id") // disjoint from scored
    val frame = KneserNey.perplexityBuckets(scored, refIds, "doc_id")
    val ex = intercept[Exception](frame.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("reference slice is empty")))
  }

  test("a reference sentence outscores gibberish, and gibberish keeps nonzero mass") {
    val ref = Seq.fill(5)("the quick brown fox jumps over the lazy dog") ++
      Seq("an entirely different sentence with other words here")
    val got = sparkScore(ref, Seq(
      1L -> "the quick brown fox jumps",
      2L -> "zz yy xx ww vv"))
    val (n1, u1, s1) = got(1L)
    val (n2, u2, s2) = got(2L)
    assert(u1 === 0L && u2 === 1L)
    assert(s1 / n1 > s2 / n2)
    assert(s2 > 0L, "unseen text must keep the uniform-floor mass")
  }
}
