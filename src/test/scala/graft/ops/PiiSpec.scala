package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("scan counts each category and attributes dotted phones to phone") {
    val d = docs(
      1L -> "write to a.user@example.com or b_user@sub.example.org today",
      2L -> "call 415-555-0199 or 202.555.0101 from 10.0.0.1",
      3L -> "clean prose with no identifiers at all")
    val r = Pii.scan(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 2 && r(0).getLong(4) === 2) // 2 emails
    // dot-separated phone is a phone, not an IP (ordering contract)
    assert(r(1).getLong(2) === 2 && r(1).getLong(3) === 1
      && r(1).getLong(4) === 3)
    assert(r(2).getLong(4) === 0)
  }

  test("negative controls do not match") {
    val d = docs(
      1L -> "order 12345-678-9012 shipped",       // 3-3-4 tail not word-bounded
      2L -> "upgrade to v1.2 beta now",           // not a dotted quad
      3L -> "range 1.2.3 and build 1.2.3.4.5 ok") // 3 groups; 5 groups matches once
    val r = Pii.scan(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getLong(4) === 0)
    assert(r(1).getLong(4) === 0)
    // 1.2.3 is no quad; 1.2.3.4.5 matches exactly once ("1.2.3.4" —
    // the trailing \b holds because '.' is a non-word char)
    assert(r(2).getLong(3) === 1 && r(2).getLong(4) === 1)
  }

  test("phone/IP-shaped substrings inside an email count as email only") {
    // counts must mirror mask(): mask() replaces the whole email before
    // the IP/phone passes ever see its local part, so counting on the
    // raw text would inflate n_pii for text mask() renders fully clean
    val d = docs(
      1L -> "mail 415-555-0199@example.com now",
      2L -> "host 10.0.0.1@odd.example up")
    val r = Pii.scan(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 1 && r(0).getLong(2) === 0
      && r(0).getLong(4) === 1) // email only, no phantom phone
    assert(r(1).getLong(1) === 1 && r(1).getLong(3) === 0
      && r(1).getLong(4) === 1) // email only, no phantom IP
  }

  test("mask replaces email then ip then phone with typed tokens") {
    val d = docs(1L ->
      "mail x.y@example.com call 415-555-0100 or 202.555.0101 node 10.1.2.3")
    val out = d.select(Pii.mask(col("text"))).as[String].head()
    assert(out ===
      "mail <EMAIL> call <PHONE> or <PHONE> node <IP>")
  }

  test("policy verdicts: keep / mask / drop with null text on drop") {
    val d = docs(
      1L -> "nothing to hide",
      2L -> "one hit a@b.example and done",
      3L -> "a@b.example c@d.example 415-555-0100 10.0.0.1 10.0.0.2 too many")
    val r = Pii.policy(d, "doc_id", "text", maxPii = 4)
      .orderBy("doc_id").collect()
    assert(r(0).getString(5) === "keep" && r(0).getString(6) === d.orderBy("doc_id").collect()(0).getString(1))
    assert(r(1).getString(5) === "mask" && r(1).getString(6).contains("<EMAIL>"))
    assert(r(2).getString(5) === "drop" && r(2).isNullAt(6))
  }

  test("policy rejects maxPii < 1") {
    intercept[IllegalArgumentException] {
      Pii.policy(docs(1L -> "x"), "doc_id", "text", maxPii = 0)
    }
  }

  test("summary aggregates per verdict") {
    val d = docs(
      1L -> "plain",
      2L -> "also plain",
      3L -> "a@b.example once",
      4L -> "a@b.example c@d.example 415-555-0100 10.0.0.1 10.0.0.2 dense")
    val r = Pii.summary(d, "doc_id", "text", maxPii = 4)
      .orderBy("verdict").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("drop", "keep", "mask"))
    assert(r(1).getLong(1) === 2) // two kept docs
    assert(r(0).getLong(2) === 2 && r(0).getLong(3) === 1
      && r(0).getLong(4) === 2)  // drop row: 2 emails, 1 phone, 2 ips
  }

  test("kAnonymitySweep: one row per k, counts and exact ppm agree " +
    "with a driver-side reference") {
    import spark.implicits._
    // class sizes by (lang, src): (en,a)=3, (en,b)=2, (fr,a)=1 -> 6 rows
    val d = Seq(("en", "a"), ("en", "a"), ("en", "a"),
      ("en", "b"), ("en", "b"), ("fr", "a")).toDF("lang", "src")
    val r = Pii.kAnonymitySweep(d, Seq("lang", "src"), Seq(2L, 3L, 10L))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(r === Seq(
      Seq(2L, 3L, 1L, 1L, 166666L),   // only the singleton below k=2
      Seq(3L, 3L, 2L, 3L, 500000L),   // singleton + the pair
      Seq(10L, 3L, 3L, 6L, 1000000L)))// everything suppressed
    // the single-k audit is reproducible from the curve at the same k
    val single = Pii.kAnonymity(d, Seq("lang", "src"), 3L)
      .select("n_suppressed").distinct().as[Long].collect()
    assert(single.toSeq === Seq(3L))
    intercept[IllegalArgumentException] {
      Pii.kAnonymitySweep(d, Seq("lang", "src"), Seq(1L))
    }
    intercept[IllegalArgumentException] {
      Pii.kAnonymitySweep(d, Seq("lang", "src"), Seq.empty)
    }
  }

  test("kAnonymityGeneralize: rolled-up buckets match a driver-side " +
    "reference, and coarsening never increases suppression") {
    import spark.implicits._
    val d = Seq(("en", 10L), ("en", 60L), ("en", 110L), ("en", 160L),
      ("fr", 10L), ("fr", 20L)).toDF("lang", "len")
    // b=50: en splits into four singletons (all at risk at k=2), fr is
    // a safe pair; b=100 merges en into two safe pairs; b=200 into one
    val r = Pii.kAnonymityGeneralize(d, Seq("lang"), "len",
        Seq(50L, 100L, 200L), 2L)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(r === Seq(
      Seq(50L, 5L, 4L, 4L, 666666L),
      Seq(100L, 3L, 0L, 0L, 0L),
      Seq(200L, 2L, 0L, 0L, 0L)))
    // the monotonicity the curve exists for: a coarse at-risk class is
    // made of fine classes that were each already at risk
    val sup = r.map(_(3).asInstanceOf[Long])
    assert(sup === sup.sorted.reverse)
    intercept[IllegalArgumentException] { // misaligned bucket boundaries
      Pii.kAnonymityGeneralize(d, Seq("lang"), "len", Seq(50L, 75L), 2L)
    }
  }

  test("riskPiiJoint: cells and shares match a driver-side reference") {
    import spark.implicits._
    // (en,a) is a safe class of 2 (one clean, one masked); (fr,b) an
    // at-risk singleton whose doc is PII-dense enough to drop
    val d = Seq(
      ("en", "a", "plain prose"),
      ("en", "a", "mail a@b.example now"),
      ("fr", "b", "a@b.example c@d.example 10.0.0.1 10.0.0.2")
    ).toDF("lang", "src", "text")
    val r = Pii.riskPiiJoint(d, Seq("lang", "src"), "text",
        k = 2L, maxPii = 3)
      .orderBy("at_risk", "verdict").collect().map(_.toSeq).toSeq
    assert(r === Seq(
      Seq(false, "keep", 1L, 333333L),
      Seq(false, "mask", 1L, 333333L),
      Seq(true, "drop", 1L, 333333L)))
    // null quasi-identifiers form their own class (the kAnonymity
    // grouping rule) — the null-safe join must not lose those rows
    val withNull = d.union(Seq(
      (null.asInstanceOf[String], "a", "plain")).toDF("lang", "src", "text"))
    val rn = Pii.riskPiiJoint(withNull, Seq("lang", "src"), "text",
        k = 2L, maxPii = 3)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).collect()
    assert(rn(0).getLong(0) === 4L) // every row lands in a cell
  }

  test("scan is a single zero-shuffle projection (no Exchange in plan)") {
    val d = docs(1L -> "a@b.example")
    val plan = Pii.policy(d, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // x151/x152 fixture: class (en,a) = {s1,s1,s2} diverse, (en,b) =
  // {s1,s1} homogeneous, (fr,a) = {null} (null sensitive is a VALUE),
  // (null,a) = {s2} (null quasi-identifier is a CLASS)
  private def divDocs = {
    import spark.implicits._
    Seq(("en", "a", "s1"), ("en", "a", "s1"), ("en", "a", "s2"),
      ("en", "b", "s1"), ("en", "b", "s1"),
      ("fr", "a", null.asInstanceOf[String]),
      (null.asInstanceOf[String], "a", "s2")).toDF("lang", "src", "sv")
  }

  test("lDiversity: distinct-value sweep with null classes and values, " +
    "exact ppm") {
    val got = Pii.lDiversity(divDocs, Seq("lang", "src"), "sv",
        Seq(2L, 3L)).orderBy("l").collect().map(_.toSeq).toSeq
    // classes: (en,a) n_sv=2 k=3; (en,b) n_sv=1 k=2; (fr,a) n_sv=1 k=1
    // (null IS a value); (null,a) n_sv=1 k=1 (null IS a class)
    // l=2: low-div = 3 classes, 4 docs of 7 -> 571428 ppm
    // l=3: all 4 classes low, 7 docs -> 1000000 ppm
    assert(got === Seq(
      Seq(2L, 4L, 3L, 4L, 571428L),
      Seq(3L, 4L, 4L, 7L, 1000000L)))
    // sensitive-as-quasi-identifier and bad l fail loudly
    intercept[IllegalArgumentException] {
      Pii.lDiversity(divDocs, Seq("lang", "sv"), "sv", Seq(2L))
    }
    intercept[IllegalArgumentException] {
      Pii.lDiversity(divDocs, Seq("lang"), "sv", Seq(1L))
    }
  }

  test("tCloseness: per-class total-variation ppm vs the global " +
    "distribution, null-safe, breach flag") {
    // global over 7 docs: s1=4, s2=2, null=1
    // (en,a) {s1:2,s2:1}: |2*7-4*3| + |1*7-2*3| + |0*7-1*3| = 2+1+3 = 6
    //   -> 6*1e6/(2*3*7) = 142857 ppm
    // (en,b) {s1:2}: |2*7-4*2| + |0-2*2| + |0-1*2| = 6+4+2 = 12
    //   -> 12*1e6/(2*2*7) = 428571 ppm
    // (fr,a) {null:1}: |0-4| + |0-2| + |1*7-1| = 12 -> 857142 ppm
    // (null,a) {s2:1}: |0-4| + |1*7-2| + |0-1| = 10 -> 714285 ppm
    val got = Pii.tCloseness(divDocs, Seq("lang", "src"), "sv",
        tPpm = 500000L)
      .orderBy("lang", "src").collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq(null, "a", 1L, 714285L, true),
      Seq("en", "a", 3L, 142857L, false),
      Seq("en", "b", 2L, 428571L, false),
      Seq("fr", "a", 1L, 857142L, true)))
  }

  test("tCloseness and lDiversity ride ONE class-value exchange " +
    "(plan-shape pin: a single scan of the input)") {
    val svc = Pii.sensitiveClassCounts(divDocs, Seq("lang", "src"), "sv")
      .orderBy("lang", "src", "sv").collect().map(_.toSeq).toSeq
    // the ledger itself: additive counts, null groups preserved
    assert(svc.length === 5)
    assert(svc.contains(Seq("en", "a", "s1", 2L)))
    assert(svc.contains(Seq("fr", "a", null, 1L)))
  }
}
