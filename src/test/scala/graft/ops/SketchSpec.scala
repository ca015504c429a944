package graft.ops

import graft.SparkSpec

/** X83 linear counting: formula agreement with a driver-side reference,
  * collision accounting (filled <= n_exact), the loud saturation branch,
  * and the hexDigits guard.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("estimate matches the driver-side formula, collisions included") {
    val rows = (0 until 300).map(i => ("g", s"value $i")) ++
      (0 until 50).map(i => ("h", s"other $i"))
    val got = Sketch.linearCount(rows.toDF("grp", "v"), "grp", "v",
        hexDigits = 2) // m = 256: real collisions at n=300
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // reference: same md5 prefix lane, same double formula
    def ref(vs: Seq[String]): (Long, Long, Double) = {
      val filled = vs.map(v => org.apache.commons.codec.digest.DigestUtils
        .md5Hex(v).substring(0, 2)).distinct.size
      val m = 256.0
      val est = BigDecimal(-m * math.log(1.0 - filled / m))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (vs.distinct.size.toLong, filled.toLong, est)
    }
    val g = ref((0 until 300).map(i => s"value $i"))
    assert(got("g") === g)
    assert(got("g")._2 < got("g")._1, "m=256 with n=300 must collide")
    assert(got("h") === ref((0 until 50).map(i => s"other $i")))
  }

  test("saturation raises instead of NULL-ing (the ln(0) divergence guard)") {
    // 16 buckets, >= 16 distinct md5 lanes: guaranteed saturation
    val rows = (0 until 400).map(i => ("g", s"v$i"))
    val e = intercept[Exception] {
      Sketch.linearCount(rows.toDF("grp", "v"), "grp", "v", hexDigits = 1)
        .collect()
    }
    assert(e.getMessage.contains("saturated"))
  }

  test("all-null groups drop (the batch-equals-stream contract)") {
    // countDistinct ignores nulls: an all-null group would emit
    // n_exact=0/filled=0 and a 0/0 NaN err_ppm that CardinalityStream
    // never emits — both sides must drop the group entirely
    val rows = Seq(("g", "a"), ("g", null), ("dead", null))
      .toDF("grp", "v")
    val got = Sketch.linearCount(rows, "grp", "v", hexDigits = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("g" -> 1L), "null values must not count; " +
      "all-null groups must vanish")
  }

  test("hexDigits guard") {
    val df = Seq(("g", "v")).toDF("grp", "v")
    intercept[IllegalArgumentException](Sketch.linearCount(df, "grp", "v", 0))
    intercept[IllegalArgumentException](Sketch.linearCount(df, "grp", "v", 7))
  }
}
