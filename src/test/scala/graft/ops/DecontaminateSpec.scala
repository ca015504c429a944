package graft.ops

import graft.SparkSpec

/** X60 eval-set decontamination: planted quotes excised whole,
  * untouched text byte-identical, full contamination empties the doc,
  * sub-n overlaps survive, overlapping matches union.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // one eval doc of 9 tokens -> two 8-gram shingles (e1..e8, e2..e9)
  private def evalDocs = Seq((100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9"))
    .toDF("doc_id", "text")

  private def clean(docs: org.apache.spark.sql.DataFrame) =
    Dedup.decontaminate(docs, evalDocs, "doc_id", "text", n = 8)
      .as[(Long, String, Long)].collect().toSet

  test("a planted eval quote is fully removed, surroundings survive") {
    val docs = Seq((10L, "a b c e1 e2 e3 e4 e5 e6 e7 e8 e9 x y"))
      .toDF("doc_id", "text")
    assert(clean(docs) === Set((10L, "a b c x y", 9L)))
  }

  test("non-overlapping documents pass through byte-identical") {
    // the double space survives: untouched docs are never re-tokenized
    val docs = Seq((11L, "p  q r s")).toDF("doc_id", "text")
    assert(clean(docs) === Set((11L, "p  q r s", 0L)))
  }

  test("whole-doc contamination empties the doc") {
    val docs = Seq((12L, "e1 e2 e3 e4 e5 e6 e7 e8")).toDF("doc_id", "text")
    assert(clean(docs) === Set((12L, "", 8L)))
  }

  test("an overlap shorter than n tokens is not removed") {
    val docs = Seq((13L, "e1 e2 e3 e4 e5 e6 e7")).toDF("doc_id", "text")
    assert(clean(docs) === Set((13L, "e1 e2 e3 e4 e5 e6 e7", 0L)))
  }

  test("overlapping and repeated matches union per document") {
    // quote at tokens 0-7 and again at 9-17: covered intervals
    // [0,7] u [9,16] u [10,17] -> only token 8 ('z') survives
    val docs = Seq(
      (14L, "e1 e2 e3 e4 e5 e6 e7 e8 z e1 e2 e3 e4 e5 e6 e7 e8 e9"))
      .toDF("doc_id", "text")
    assert(clean(docs) === Set((14L, "z", 17L)))
  }
}
