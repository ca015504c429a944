package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X74 Bloom gate: parameter guards, the no-false-negative contract (the
  * property that makes gate-then-verify lossless), real pruning on
  * disjoint values, and end-to-end equality of [[Bloom.contamination]]
  * with the naive exact join it shortcuts.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private val m = 1 << 12
  private val k = 4

  test("parameter guards are loud") {
    val vals = Seq("a").toDF("s")
    intercept[IllegalArgumentException](Bloom.buildBitmap(vals, "s", 100, k))
    intercept[IllegalArgumentException](Bloom.buildBitmap(vals, "s", m, 5))
    intercept[IllegalArgumentException](Bloom.buildBitmap(vals, "s", m, 0))
    val bm = Bloom.buildBitmap(vals, "s", m, k)
    intercept[IllegalArgumentException](
      vals.filter(Bloom.mightContain(col("s"), bm.tail, m, k)).count())
  }

  test("no false negatives: every inserted value passes the gate") {
    val vals = (0 until 500).map(i => s"value $i shingle").toDF("s")
    val bm = Bloom.buildBitmap(vals, "s", m, k)
    assert(bm.length == m / 64)
    assert(vals.filter(Bloom.mightContain(col("s"), bm, m, k)).count() == 500)
  }

  test("the gate actually prunes disjoint values") {
    val in = (0 until 200).map(i => s"inserted $i").toDF("s")
    val bm = Bloom.buildBitmap(in, "s", m, k)
    val out = (0 until 1000).map(i => s"absent $i").toDF("s")
    val fp = out.filter(Bloom.mightContain(col("s"), bm, m, k)).count()
    // 200 values * 4 bits in 4096 => fill <= 800/4096; fp rate < (0.2)^4
    assert(fp < 50, s"$fp of 1000 disjoint values passed — gate not pruning")
  }

  test("contamination == the naive exact join (lossless gate, dense 0s)") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // shares the 8-gram b..i with eval 100
      (2L, "z y x w v u t s r q"), // clean
      (3L, "b c d e f g h i x y") // shares b..i too
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "p b c d e f g h i p")).toDF("doc_id", "text")
    val got = Bloom.contamination(docs, ev, "doc_id", "text", n = 8,
      m = m, k = k).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exact: docs 1 and 3 each share one distinct eval doc; 2 is clean
    assert(got === Seq((1L, 1L), (2L, 0L), (3L, 1L)))
  }
}
