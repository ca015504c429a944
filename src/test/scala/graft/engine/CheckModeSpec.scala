package graft.engine

import graft.SparkSpec

/** Q3 + show — the reference's check/show commands (SURVEY §3.2/§3.3),
  * asserted against the golden transcript expectations.
  */
class CheckModeSpec extends SparkSpec {

  test("check: round-trips raw + adapter through temp views (Q1/Q2/Q3)") {
    val r = CheckMode.run(spark, PumpConfig())
    assert(r.ddlFragment ===
      ", command String, key_id String, params_key String, params_thingKey String, params_ts String, params_value Float64")
    assert(r.schemaConsistent)
    assert(r.rawRoundTrip === Seq(("check-mid", "check-topic", PumpConfig.GoldenSample)))
    assert(r.rawCount === 1)
    assert(r.adapterCount === 2) // two records in the golden sample
    assert(r.adapterColumns === Seq("mid", "command", "key_id", "params_key",
      "params_thingKey", "params_ts", "params_value"))
    // views dropped after check
    assert(!spark.catalog.tableExists("raw_message_check"))
    assert(!spark.catalog.tableExists("json_message_check"))
  }

  test("show: prints every config section") {
    val s = CheckMode.show(PumpConfig())
    Seq("[source-mqtt]", "[monitor-mqtt]", "[dbstore]", "[adapter]", "[processor]")
      .foreach(sec => assert(s.contains(sec), sec))
    assert(s.contains("pump/data/0"))
  }
}
