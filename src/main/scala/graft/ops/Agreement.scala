package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X154 — inter-gate AGREEMENT audit: Cohen's kappa (Cohen 1960) and
  * McNemar's test (McNemar 1947) between two boolean document gates,
  * per source. The reference pump has no notion of document gates at
  * all (its rows are opaque JSON — `data_adapter.go`), so this is
  * north-star surface: the datacard question "does gate A already do
  * gate B's work?" answered with the chance-corrected statistic
  * instead of the raw joint cells (x150's table says how the cells
  * fill; kappa says whether that is MORE than two independent coins
  * with those marginals would produce, and McNemar whether the two
  * gates even fail the same FRACTION of documents).
  *
  * The x154 wiring rates each document with (A) the x116 curation gate
  * over the raw text and (B) the x94 PII-clean predicate over the
  * PII-augmented text — "is quality-gating a substitute for a PII
  * audit?" (the answer the curve should give on any real corpus: no).
  * The kernel itself is rater-agnostic: [[agreementOf]] works over ANY
  * additive (src, n_docs, n_a_pass, n_b_pass, n_both) ledger, which is
  * also what makes the streaming twin a pure-addition fold.
  *
  * ARITHMETIC (both engines replay it exactly):
  *   n_agree      = n - a1 - b1 + 2·n11            (n11 + n00)
  *   po_ppm       = ⌊1e6 · n_agree / n⌋
  *   pe_num       = a1·b1 + (n-a1)(n-b1)           (expected agreements · n)
  *   pe_ppm       = ⌊1e6 · pe_num / n²⌋
  *   kappa_micro  = sign · ⌊1e6 · |n·n_agree - pe_num| / (n² - pe_num)⌋
  *                  (NULL when n² = pe_num — both marginals degenerate,
  *                  kappa undefined; the sign is made explicit so the
  *                  value never depends on an engine's negative-divide
  *                  convention)
  *   mcnemar_micro = ⌊1e6 · (n01 - n10)² / (n01 + n10)⌋
  *                  (NULL when the gates never disagree — no
  *                  discordant pairs, the statistic is undefined)
  * All lanes DECIMAL(38,0)/HUGEINT — no float sums anywhere.
  *
  * SHAPE AT 100 TB: ONE scan-side projection (gate signals + PII
  * counts are both row-local regex/array work inside whole-stage
  * codegen) and ONE source-grain exchange with map-side combine — the
  * x144 shape with one more counting lane. Nothing corpus-scale
  * materializes; the derived statistics are a projection over the
  * source-sized ledger.
  */
object Agreement {

  /** Per-source kappa + McNemar between the curation gate (on
    * `textCol`) and the PII-clean predicate (on `augCol`). Null
    * sources are excluded (the x131 rule); null text fails BOTH gates
    * closed (a document that cannot be rated cannot pass a release
    * gate).
    *
    * Output: (src, n_docs, n_a_pass, n_b_pass, n_both, n_only_a,
    * n_only_b, po_ppm, pe_ppm, kappa_micro, mcnemar_micro).
    */
  def gatePiiAgreement(docs: DataFrame, srcCol: String, textCol: String,
                       augCol: String, qualityMin: Double,
                       dupMax: Double): DataFrame =
    agreementOf(agreementCounts(docs, srcCol, textCol, augCol,
      qualityMin, dupMax))

  /** The ADDITIVE per-source contingency lanes both
    * [[gatePiiAgreement]] and the streaming twin's delta build share
    * (counts from disjoint batches merge by pure addition — the
    * [[Curate.attributionCounts]] discipline). One signal path, so
    * batch and stream cannot drift.
    */
  private[graft] def agreementCounts(docs: DataFrame, srcCol: String,
                                     textCol: String, augCol: String,
                                     qualityMin: Double,
                                     dupMax: Double): DataFrame = {
    val rated = ratedDocs(docs, srcCol, textCol, augCol, qualityMin,
      dupMax)
    rated.groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("a_pass")).as("n_a_pass"),
        count_if(col("b_pass")).as("n_b_pass"),
        count_if(col("a_pass") && col("b_pass")).as("n_both"))
  }

  /** The per-document verdict pair (src, a_pass, b_pass) — one
    * scan-side projection; both gates coalesce null signals to FAIL.
    */
  private def ratedDocs(docs: DataFrame, srcCol: String, textCol: String,
                        augCol: String, qualityMin: Double,
                        dupMax: Double): DataFrame = {
    val base = docs.filter(col(srcCol).isNotNull)
      .select(col(srcCol).as("src"), col(textCol), col(augCol))
    val sig = Curate.gateSignals(base, textCol)
    val scanned = Pii.scan(sig, "src", augCol)
    scanned.select(col("src"),
      coalesce(Curate.gatePass(qualityMin, dupMax), lit(false))
        .as("a_pass"),
      coalesce(col("n_pii") === 0L, lit(false)).as("b_pass"))
  }

  /** The derived-statistics projection over any accumulated
    * contingency ledger — shared with the streaming twin's accessor
    * (the [[Curate.attributionOf]] seam discipline).
    */
  private[graft] def agreementOf(counts: DataFrame): DataFrame =
    counts
      .withColumn("n_agree",
        col("n_docs") - col("n_a_pass") - col("n_b_pass") +
          lit(2L) * col("n_both"))
      .withColumn("__pe_num", expr(
        "CAST(n_a_pass AS DECIMAL(38,0)) * n_b_pass" +
          " + CAST(n_docs - n_a_pass AS DECIMAL(38,0))" +
          " * (n_docs - n_b_pass)"))
      .select(col("src"), col("n_docs"), col("n_a_pass"),
        col("n_b_pass"), col("n_both"),
        (col("n_a_pass") - col("n_both")).as("n_only_a"),
        (col("n_b_pass") - col("n_both")).as("n_only_b"),
        expr("CAST(CAST(n_agree AS DECIMAL(38,0)) * 1000000" +
          " div n_docs AS BIGINT)").as("po_ppm"),
        expr("CAST(__pe_num * 1000000" +
          " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)")
          .as("pe_ppm"),
        expr(
          """CASE
            |  WHEN CAST(n_docs AS DECIMAL(38,0)) * n_docs = __pe_num
            |    THEN CAST(NULL AS BIGINT)
            |  WHEN CAST(n_docs AS DECIMAL(38,0)) * n_agree >= __pe_num
            |    THEN CAST((CAST(n_docs AS DECIMAL(38,0)) * n_agree
            |        - __pe_num) * 1000000
            |      div (CAST(n_docs AS DECIMAL(38,0)) * n_docs - __pe_num)
            |      AS BIGINT)
            |  ELSE -CAST((__pe_num
            |        - CAST(n_docs AS DECIMAL(38,0)) * n_agree) * 1000000
            |      div (CAST(n_docs AS DECIMAL(38,0)) * n_docs - __pe_num)
            |      AS BIGINT)
            |END""".stripMargin.replace("\n", " ")).as("kappa_micro"),
        expr(
          """CASE
            |  WHEN n_a_pass + n_b_pass - 2 * n_both = 0
            |    THEN CAST(NULL AS BIGINT)
            |  ELSE CAST(CAST((n_a_pass - n_b_pass) AS DECIMAL(38,0))
            |      * (n_a_pass - n_b_pass) * 1000000
            |    div (n_a_pass + n_b_pass - 2 * n_both) AS BIGINT)
            |END""".stripMargin.replace("\n", " ")).as("mcnemar_micro"))
}
