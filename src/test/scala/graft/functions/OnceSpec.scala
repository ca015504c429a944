package graft.functions

import graft.SparkSpec
import graft.engine.{Adapter, PumpConfig, JsonInference}
import org.apache.spark.sql.functions._

/** The Once barrier: identity semantics, and the plan property it exists
  * for (a single from_json in the adapter pipeline).
  */
class OnceSpec extends SparkSpec {
  import spark.implicits._

  test("once(x) is the identity on values and nulls") {
    val df = Seq(Some(1), None, Some(3)).toDF("x")
    val got = df.select(Once.once($"x" * 2).as("y")).as[Option[Int]].collect()
    assert(got.toSeq === Seq(Some(2), None, Some(6)))
  }

  test("adapter plan parses the payload exactly once") {
    val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)
    val ev = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"props".as("payload"))
    val plan = Adapter.adapt(ev, "payload", inf, Seq("event_id"))
      .queryExecution.optimizedPlan.toString
    val parses = "from_json".r.findAllIn(plan).length
    assert(parses === 1, s"expected 1 from_json in plan, found $parses:\n$plan")
  }
}
