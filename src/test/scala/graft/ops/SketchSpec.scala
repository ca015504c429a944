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

  // ------------------------------------------------------------- X88 HLL

  /** Driver-side replica of the full X88 algorithm (same md5 lane, same
    * rho, same exact-BIGINT denominator, same small-range branch) — the
    * spec's independent second implementation.
    */
  private def hllRef(vals: Seq[String]): (Long, Long, Double) = {
    val m = 256L
    def rho(h: String): Int = {
      val stripped = h.substring(2, 14).dropWhile(_ == '0')
      if (stripped.isEmpty) 49
      else {
        val d = Integer.parseInt(stripped.head.toString, 16)
        val lz = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
        (12 - stripped.length) * 4 + lz + 1
      }
    }
    val hs = vals.map(org.apache.commons.codec.digest.DigestUtils.md5Hex)
    val regs = hs.groupBy(_.substring(0, 2)).map { case (_, g) => g.map(rho).max }
    val filled = regs.size.toLong
    val twoTo49 = 562949953421312L
    val sPresent = regs.map(mj => math.pow(2.0, 49 - mj).toLong).sum
    val s = (m - filled) * twoTo49 + sPresent
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m * twoTo49 / s.toDouble
    def round6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val est =
      if (raw <= 2.5 * m && filled < m)
        round6(m * math.log(m.toDouble / (m - filled)))
      else round6(raw)
    (vals.distinct.size.toLong, filled, est)
  }

  test("hll matches the driver-side replica on both estimator branches") {
    // 30 values: raw <= 2.5m with empty registers -> small-range branch;
    // 5000 values: raw branch (filled pushes raw past 640)
    val small = (0 until 30).map(i => s"value $i")
    val large = (0 until 5000).map(i => s"other $i")
    val rows = small.map(("s", _)) ++ large.map(("l", _))
    val got = Sketch.hll(spark.createDataFrame(rows).toDF("grp", "v"),
        "grp", "v", hexDigits = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("s") === hllRef(small))
    assert(got("l") === hllRef(large))
    // the small side must actually have exercised the fallback: its est
    // equals the register-occupancy linear count, not the raw formula
    val filledS = got("s")._2
    assert(got("s")._3 === BigDecimal(256.0 * math.log(256.0 / (256 - filledS)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("hll survives cardinalities that saturate linear counting") {
    // 5000 distinct values into 256 buckets: linearCount(hexDigits=2)
    // saturates and raises; hll with the SAME 256 registers estimates
    // within 3 standard errors (sigma ~ 1.04/sqrt(256) = 6.5%)
    val rows = (0 until 5000).map(i => ("g", s"v $i"))
    val df = spark.createDataFrame(rows).toDF("grp", "v")
    intercept[Exception](Sketch.linearCount(df, "grp", "v", 2).collect())
    val est = Sketch.hll(df, "grp", "v", 2).collect().head.getDouble(3)
    assert(math.abs(est - 5000.0) / 5000.0 < 3 * 1.04 / 16,
      s"hll estimate $est too far from 5000")
  }

  test("merged sketch of overlapping slices == sketch of the union") {
    val a = spark.createDataFrame((0 until 900).map(i => ("g", s"v $i")))
      .toDF("grp", "v")
    val b = spark.createDataFrame((500 until 1400).map(i => ("g", s"v $i")))
      .toDF("grp", "v")
    val merged = Sketch.hllMerged(a, b, "grp", "v", 2).collect().head
    val direct = Sketch.hll(a.unionAll(b), "grp", "v", 2).collect().head
    assert(merged.getLong(1) === 1400L, "exact union audit")
    assert(merged.getDouble(3) === direct.getDouble(3),
      "pointwise-max merge must reproduce the direct sketch exactly")
  }

  test("hll drops null values and all-null groups") {
    val rows = Seq(("g", "a"), ("g", null), ("dead", null))
    val got = Sketch.hll(spark.createDataFrame(rows).toDF("grp", "v"),
        "grp", "v", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("g" -> 1L))
  }

  test("hll hexDigits guard") {
    val df = spark.createDataFrame(Seq(("g", "v"))).toDF("grp", "v")
    intercept[IllegalArgumentException](Sketch.hll(df, "grp", "v", 1))
    intercept[IllegalArgumentException](Sketch.hll(df, "grp", "v", 5))
  }
}
