package graft.functions

import graft.SparkSpec
import graft.engine.Tables
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Misra-Gries contract against exact counts: inclusion of everything
  * above the frequency threshold, bounded undercount, and survival of
  * Spark's partial/serialize/merge aggregation path across partitions.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("heavy hitters: inclusion + error bound vs exact counts, across partitions") {
    val k = 64
    // repartition forces many partial buffers through serialize + merge
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").repartition(8)
    val exact = docs.select(explode(split($"text", " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val bound = n / (k + 1) // MG guarantee threshold / max undercount
    val est = TextAnalysis.heavyHitters(docs, "text", k)
      .as[(String, Long)].collect().toMap
    assert(est.size <= k)
    // inclusion: every token above the threshold is reported
    val mustHave = exact.filter(_._2 > bound).keySet
    assert(mustHave.nonEmpty, s"test corpus too flat for k=$k")
    mustHave.foreach(t => assert(est.contains(t), s"missing heavy hitter '$t'"))
    // bound: estimates never exceed truth, undercount by at most N/(k+1)
    est.foreach { case (t, c) =>
      val truth = exact(t)
      assert(c <= truth, s"'$t' overcounted: $c > $truth")
      assert(truth - c <= bound, s"'$t' undercounted past bound: $truth - $c > $bound")
    }
  }

  test("heavy hitters: a planted dominant token survives a tiny k") {
    val docs = ((0 until 200).map(i => (i.toLong, "spam spam spam unique" + i)) :+
      (999L, "filler words only")).toDF("doc_id", "text")
    val est = TextAnalysis.heavyHitters(docs, "text", k = 4)
      .as[(String, Long)].collect().toMap
    assert(est.contains("spam")) // 600 of ~1000 tokens: far above N/(k+1)
  }
}
