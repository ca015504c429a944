package graft.ops

import graft.SparkSpec
import graft.engine.Tables

/** X47 winnowing invariants beyond the DuckDB oracle: exact equivalence
  * with a driver-side reference implementation of the published
  * algorithm, the shared-run guarantee, and the density reduction.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 4

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The published algorithm, straight off the paper: every width-W
    * window of k-gram hashes keeps its minimum, ties rightmost.
    */
  private def reference(text: String): Set[(Int, String)] = {
    val hashes = text.split(" ").sliding(K).map(_.mkString(" "))
      .map(md5hex).toVector
    (0 to hashes.length - W).flatMap { s =>
      val (h, i) = (s until s + W).map(i => (hashes(i), i))
        .minBy { case (h, i) => (h, -i) }
      Some((i, h))
    }.toSet
  }

  private def winnowed(docs: Seq[(Long, String)]): Map[Long, Set[(Int, String)]] =
    Dedup.winnow(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap

  test("matches the reference implementation on real corpus documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().take(25).toSeq
    val got = winnowed(docs)
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === reference(text),
        s"doc $id diverges from the published algorithm")
    }
  }

  test("the winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // P is 10 tokens >= W+K-1 = 6; all other tokens unique per doc
    val P = (0 until 10).map(i => s"p$i").mkString(" ")
    val got = winnowed(Seq(
      1L -> s"u0 u1 u2 u3 $P u4 u5",
      2L -> s"v0 $P v1 v2 v3"))
    val h1 = got(1L).map(_._2)
    val h2 = got(2L).map(_._2)
    assert((h1 intersect h2).nonEmpty)
  }

  test("two-tier pruned runs equal the exhaustive operator above the guarantee") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val minSpan = K + W - 1 // = w + k - 1: the guarantee threshold
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "a_start", "b_start", "span_len")
        .as[(Long, Long, Int, Int, Long)].collect().toSet
    val full = canon(Dedup.substringRuns(docs, "doc_id", "text", K, minSpan))
    val pruned = canon(Dedup.substringRunsPruned(docs, "doc_id", "text",
      K, minSpan, W))
    assert(full.nonEmpty)
    assert(pruned === full)
    // below the guarantee threshold the operator refuses loudly
    intercept[IllegalArgumentException] {
      Dedup.substringRunsPruned(docs, "doc_id", "text", K, minSpan - 1, W)
    }
  }

  test("capped pruned runs equal the exhaustive capped operator (corpus-wide hot set)") {
    import org.apache.spark.sql.functions.col
    // boilerplate B repeats in 5 docs (every B-window hash occurs 5 > cap
    // 4 -> dropped corpus-wide); the rare span P is shared by just two
    // docs and must survive pruning + capping with identical offsets
    val B = (0 until 8).map(i => s"b$i").mkString(" ")
    val P = (0 until 10).map(i => s"p$i").mkString(" ")
    val docs = (Seq(
      1L -> s"u0 $B u1 $P",
      2L -> s"$P v0 $B") ++
      (3 to 5).map(i => i.toLong -> s"w${i}0 $B w${i}1")).toDF("doc_id", "text")
    val minSpan = K + W - 1
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "a_start", "b_start", "span_len")
        .as[(Long, Long, Int, Int, Long)].collect().toSet
    val cap = Some(4)
    val full = canon(Dedup.substringRuns(docs, "doc_id", "text", K, minSpan,
      maxWindowFreq = cap))
    val pruned = canon(Dedup.substringRunsPruned(docs, "doc_id", "text",
      K, minSpan, W, maxWindowFreq = cap))
    // the B-anchored runs are capped away; the P run survives both forms
    assert(full.nonEmpty)
    assert(full.forall { case (_, _, _, _, len) => len === 10L })
    assert(pruned === full)
  }

  test("density: selection is a strict subsample at roughly 2/(w+1)") {
    val text = (0 until 200).map(i => s"t${i % 97}").mkString(" ")
    val sel = winnowed(Seq(1L -> text))(1L).size
    val windows = 200 - K + 1
    assert(sel < windows / 2, s"selected $sel of $windows")
    assert(sel > windows / 8, s"selected $sel of $windows")
  }
}
