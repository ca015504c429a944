package graft.ops

import graft.SparkSpec

/** X154 inter-gate agreement: hand-worked contingency fixtures pinning
  * every branch of the kappa/McNemar projection — chance-level (0),
  * perfect (+1e6), perfect-inverse (-1e6, the explicit negative-sign
  * branch), degenerate marginals (NULL kappa), no-discordance (NULL
  * McNemar), and the null-text fails-both-closed seam.
  */
class AgreementSpec extends SparkSpec {

  import spark.implicits._

  private val QMin = 0.5
  private val DMax = 0.2

  // (src, text, aug) — A = curate gate on text, B = PII-clean on aug
  private def fixture = Seq(
    // s1: one cell each -> kappa exactly 0 (po = pe = 500000)
    ("s1", "a b c d", "clean"),
    ("s1", "a b c d", "m bob@x.com y"),
    ("s1", "a a a a", "clean"),
    ("s1", "a a a a", "ip 1.2.3.4 x"),
    // s2: perfect agreement -> kappa +1e6, no discordance -> NULL chi2
    ("s2", "a b c d", "clean"),
    ("s2", "p q r", "also clean"),
    ("s2", "a a a a", "node 10.0.0.1 up"),
    // s3: perfect DISagreement -> kappa -1e6 (negative branch)
    ("s3", "a b c d", "mail x@y.io ok"),
    ("s3", "a a a a", "clean"),
    // s4: both gates constant-pass -> pe = 1 -> kappa NULL
    ("s4", "a b c d", "clean"),
    ("s4", "p q r", "clean too"),
    // s5: null text fails BOTH closed; one A-only disagreement
    ("s5", null, null),
    ("s5", "b c", "call 415-555-0199 now"),
    // null source: excluded entirely
    (null, "a b c d", "clean")
  ).toDF("source", "text", "aug")

  private def run() =
    Agreement.gatePiiAgreement(fixture, "source", "text", "aug",
      QMin, DMax)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8),
        if (r.isNullAt(9)) None else Some(r.getLong(9)),
        if (r.isNullAt(10)) None else Some(r.getLong(10))))

  test("gatePiiAgreement: hand-computed cells, ppm lanes, and kappa " +
    "sign branches over the five-source fixture") {
    val got = run()
    assert(got.map(_._1).toSeq === Seq("s1", "s2", "s3", "s4", "s5"))
    val m = got.map(g => g._1 -> g).toMap

    // s1: n=4 a1=2 b1=2 n11=1 -> agree=2, pe_num=8: po=pe -> kappa 0
    assert(m("s1") === (("s1", 4L, 2L, 2L, 1L, 1L, 1L, 500000L, 500000L,
      Some(0L), Some(0L))))
    // s2: n=3 a1=2 b1=2 n11=2 -> perfect: kappa 1e6, McNemar undefined
    assert(m("s2") === (("s2", 3L, 2L, 2L, 2L, 0L, 0L, 1000000L, 555555L,
      Some(1000000L), None)))
    // s3: n=2 a1=1 b1=1 n11=0 -> perfect inverse: kappa -1e6,
    // discordance symmetric -> chi2 0
    assert(m("s3") === (("s3", 2L, 1L, 1L, 0L, 1L, 1L, 0L, 500000L,
      Some(-1000000L), Some(0L))))
    // s4: both gates constant -> pe = 1 -> kappa undefined
    assert(m("s4") === (("s4", 2L, 2L, 2L, 2L, 0L, 0L, 1000000L,
      1000000L, None, None)))
    // s5: null text fails both; the phone doc passes A only ->
    // one-sided discordance: chi2 = 1e6
    assert(m("s5") === (("s5", 2L, 1L, 0L, 0L, 1L, 0L, 500000L, 500000L,
      Some(0L), Some(1000000L)))
    )
  }

  test("agreementCounts merge by pure addition: counts of a union " +
    "equal the summed counts of its parts (the twin seam)") {
    import org.apache.spark.sql.functions._
    val parts = fixture.randomSplit(Array(0.5, 0.5), seed = 7)
    val whole = Agreement.agreementCounts(fixture, "source", "text",
      "aug", QMin, DMax)
    val merged = parts.map(p =>
        Agreement.agreementCounts(p, "source", "text", "aug", QMin, DMax))
      .reduce(_ unionByName _)
      .groupBy(col("src"))
      .agg(sum("n_docs").as("n_docs"), sum("n_a_pass").as("n_a_pass"),
        sum("n_b_pass").as("n_b_pass"), sum("n_both").as("n_both"))
    assert(whole.orderBy("src").collect().toSeq ===
      merged.orderBy("src").collect().toSeq)
    // and the derived projection is identical through either path
    assert(Agreement.agreementOf(whole).orderBy("src").collect().toSeq
      === Agreement.agreementOf(merged).orderBy("src").collect().toSeq)
  }
}
