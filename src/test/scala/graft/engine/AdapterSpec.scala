package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A1-A8 against the golden transcript fixture (FIXTURES.md §1). */
class AdapterSpec extends SparkSpec {
  import spark.implicits._

  lazy val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)

  test("golden sample flattens to the 2 expected rows, sorted columns") {
    val df = Seq(("m1", PumpConfig.GoldenSample)).toDF("mid", "payload")
    val out = Adapter.adapt(df, "payload", inf, Seq("mid")).orderBy("key_id")
    assert(out.columns.toSeq === Seq("mid", "command", "key_id", "params_key",
      "params_thingKey", "params_ts", "params_value"))
    val rows = out.collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getString(1) === "property.publish")
    assert(r1.getString(2) === "1")
    assert(r1.getString(3) === "ut")
    assert(r1.getString(4) === "545420B443E8455335363335520C6E6B")
    assert(r1.getString(5) === "2020-01-05T20:31:00Z")
    assert(r1.getDouble(6) === 564.0) // Float64, not Long (readme.txt:40)
    assert(rows(1).getDouble(6) === 128.0)
  }

  test("protocol violation poisons the whole message, raw path unaffected (A3/T3)") {
    val df = Seq(
      ("good", PumpConfig.GoldenSample),
      ("bad", """{"1": {"command": "x", "params": {"thingKey":"t","ts":"s","key":"k","value":1}}, "2": 42}"""),
      ("corrupt", """{"1": {"command": """)
    ).toDF("mid", "payload")
    val good = Adapter.adapt(df, "payload", inf, Seq("mid"))
    assert(good.select("mid").distinct().as[String].collect().toSet === Set("good"))
    val bad = Adapter.rejects(df, "payload", inf)
    assert(bad.select("mid").as[String].collect().toSet === Set("bad", "corrupt"))
    // raw projection sees all three regardless
    val raw = Adapter.rawProjection(df, $"mid", lit("t"), $"payload", current_timestamp())
    assert(raw.count() === 3)
  }

  test("A8: missing runtime keys bind as NULL, extra keys silently dropped") {
    val runtime = """{"9": {"command": "c", "params": {"key": "k", "EXTRA": 1}}}"""
    val out = Adapter.adapt(Seq(("m", runtime)).toDF("mid", "payload"), "payload", inf, Seq("mid"))
    val r = out.collect().head
    assert(r.getAs[String]("params_key") === "k")
    assert(r.getAs[Any]("params_thingKey") == null)
    assert(r.getAs[Any]("params_value") == null)
    assert(!out.columns.contains("params_EXTRA"))
  }

  test("empty top-level map is invalid (reference loop emits no rows)") {
    val out = Adapter.adapt(Seq(("m", "{}")).toDF("mid", "payload"), "payload", inf, Seq("mid"))
    assert(out.count() === 0)
  }

  test("flatten joins nested paths with underscore at any depth (A4)") {
    val deep = JsonInference.inferFromSample("""{"1": {"a": {"b": {"c": 1}}, "d": "x"}}""")
    val cols = Adapter.flattenColumns(deep.recordType).map(_._1)
    assert(cols.toSet === Set("a_b_c", "d"))
  }

  test("raw projection derives collect_date from collect_datetime (T5/K1)") {
    val df = Seq(("m", "p")).toDF("mid", "payload")
    val raw = Adapter.rawProjection(df, $"mid", lit("top"), $"payload",
      to_timestamp(lit("2020-01-05 20:31:00")))
    val r = raw.collect().head
    assert(r.getAs[java.sql.Date]("collect_date").toString === "2020-01-05")
    assert(raw.columns.toSeq === Seq("mid", "topic", "payload", "collect_datetime", "collect_date"))
  }
}
