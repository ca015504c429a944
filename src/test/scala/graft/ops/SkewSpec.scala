package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum equal their unsalted forms") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val plain = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(ev, Seq("event_type"), 8)
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
    val plainSum = ev.groupBy("event_type").agg(sum("value").as("sum"))
      .as[(String, Double)].collect().toMap
    val saltedSum = Skew.saltedSum(ev, Seq("event_type"), "value", 8)
      .as[(String, Double)].collect().toMap
    // double addition order differs across salt groups; compare to 1e-6
    plainSum.foreach { case (k, v) => assert(math.abs(saltedSum(k) - v) < 1e-6) }
  }

  test("df-capping drops only boilerplate shingles and keeps planted dups") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = Dedup.shingleTable(docs, "doc_id", "text")
    val capped = Skew.capDocumentFrequency(sh, "doc_id", maxDf = 4)
    assert(capped.count() < sh.count())
    // max per-shingle fanout is bounded
    val maxDf = capped.groupBy("s").count().agg(max("count")).as[Long].head
    assert(maxDf <= 4)
    // planted near-dups still surface at a slightly relaxed threshold
    val exact = Dedup.jaccardPairs(sh, "doc_id", 0.95)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val cappedPairs = Skew.jaccardPairsCapped(docs, "doc_id", "text", 0.8, 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recovered = exact.count(cappedPairs.contains)
    assert(recovered.toDouble / exact.size >= 0.8,
      s"recovered $recovered/${exact.size}")
  }
}
