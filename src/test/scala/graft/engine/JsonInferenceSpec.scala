package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.types._

/** A6/A7 against the reference's golden transcript
  * (`/root/reference/release_20120128/readme.txt:30-52`).
  */
class JsonInferenceSpec extends SparkSpec {

  test("golden sample infers the reference DDL fragment verbatim") {
    val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)
    assert(JsonInference.ddlFragment(inf) ===
      ", command String, key_id String, params_key String, params_thingKey String, params_ts String, params_value Float64")
  }

  test("sorted keys include key_id and follow lexicographic order (A5)") {
    val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)
    assert(inf.sortedKeys === Seq("command", "key_id", "params_key",
      "params_thingKey", "params_ts", "params_value"))
  }

  test("type lattice: every JSON number is Double, never Long") {
    val inf = JsonInference.inferFromSample("""{"r": {"i": 5, "f": 5.5, "b": true, "s": "x"}}""")
    assert(inf.leafTypes("i") === DoubleType)
    assert(inf.leafTypes("f") === DoubleType)
    assert(inf.leafTypes("b") === BooleanType)
    assert(inf.leafTypes("s") === StringType)
  }

  test("consistent flag: identical records -> true, divergent -> false (A7 warning)") {
    assert(JsonInference.inferFromSample(PumpConfig.GoldenSample).consistent)
    val divergent = JsonInference.inferFromSample("""{"1": {"a": 1}, "2": {"b": "x"}}""")
    assert(!divergent.consistent)
    // schema is the field union, so A8 binds missing keys as null
    assert(divergent.recordType.fieldNames.sorted === Array("a", "b"))
  }

  test("protocol: non-object record in sample is rejected (A3)") {
    val e = intercept[IllegalArgumentException] {
      JsonInference.inferFromSample("""{"1": 42}""")
    }
    assert(e.getMessage.contains("adapter protocol match error"))
  }

  test("payload type is a map of unknown record ids, not a struct (§7.3)") {
    val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)
    assert(inf.payloadType.keyType === StringType)
    // the sample's record ids "1"/"2" must NOT appear as field names
    assert(!inf.recordType.fieldNames.contains("1"))
  }
}
