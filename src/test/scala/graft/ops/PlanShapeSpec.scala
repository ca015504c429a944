package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan shape regressions: these operators were designed around
  * specific exchange/broadcast properties (PLANS.md) — a refactor that
  * silently adds a shuffle or forces a broadcast would pass every
  * value-level test while breaking the 100 TB story, so the properties
  * are pinned here.
  */
class PlanShapeSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(s: String, needle: String): Int =
    s.sliding(needle.length).count(_ == needle)

  test("shingle table is generated scan-side: zero exchanges") {
    val plan = physical(
      Dedup.shingleTable(Tables.documents(spark, sf), "doc_id", "text"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("as-of join costs exactly one exchange (no join operator)") {
    val plan = physical(
      Sessionize.asofLast(Tables.events(spark, sf), "user_id", "ts", "event_id",
        probePred = col("event_type") === "purchase",
        refPred = col("event_type") === "view"))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("sessionize shares one exchange across both window passes and the agg") {
    val plan = physical(
      Sessionize.sessions(Tables.events(spark, sf), "user_id", "ts", "event_id",
        gapSecs = 1800))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
  }

  test("c1 keeps the nation dim broadcast (explicit hint survives planning)") {
    val plan = physical(graft.engine.AnalyticsQueries
      .queries("c1_revenue_by_nation")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"nation dim not broadcast in:\n$plan")
  }

  test("bucketed embedding dedup plan carries no forced broadcast hint") {
    // AQE may CHOOSE broadcast at this tiny SF; what must not exist is a
    // planted hint that would force it at 100 TB. Inspect the analyzed
    // (pre-AQE) plan for ResolvedHint nodes.
    val analyzed = Dedup.embeddingDupPairsBucketed(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0.4, bits = 6)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), s"forced hint in:\n$analyzed")
  }

  test("text stats and repetition are pure projections: zero exchanges") {
    for (df <- Seq(
        TextAnalysis.textStats(Tables.documents(spark, sf), "doc_id", "text"),
        TextAnalysis.repetition(Tables.documents(spark, sf), "doc_id", "text"))) {
      val plan = physical(df)
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    }
  }
}
