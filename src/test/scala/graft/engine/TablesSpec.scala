package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.types.TimestampType

/** Pins the [[Tables.events]] normalization contract: every known physical
  * generation of `events.ts` lands as micro-precision TimestampType, the
  * UTC-session precondition is enforced loudly (a non-UTC session would
  * silently re-label NTZ instants into the wrong epoch), and an unknown
  * physical type fails instead of being blind-cast.
  */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("events ts normalizes to TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1)
  }

  test("events refuses a non-UTC session") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.events(spark, sf))
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set(tzKey, saved)
  }

  test("unknown ts physical type fails loudly, not a blind cast") {
    // Simulate a future generation shipping ts as StringType: events()
    // must refuse it rather than silently cast to timestamp (which would
    // yield nulls / wrong instants downstream).
    import spark.implicits._
    val dir = tmpDir("tables-badts")
    Seq(("e1", "2026-01-01 00:00:00")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[RuntimeException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unexpected type"))
  }
}
