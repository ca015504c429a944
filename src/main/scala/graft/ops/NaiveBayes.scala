package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X42 — trained multinomial Naive Bayes document classifier: the
  * missing *trained* half of the quality-gate story (X26 scores against
  * a reference LM, X39 builds features — this learns from labels and
  * classifies). Train a good/bad quality sample and the winning class
  * plus its log-score IS the quality gate (composes with the X22
  * curation pipeline); the demo query trains on the corpus's `lang`
  * labels, the labeled column the test tables ship.
  *
  * Model (Laplace-smoothed multinomial NB, McCallum & Nigam 1998):
  * score(doc, c) = ln p(c) + Σ_w ln p(w|c), with
  * p(w|c) = (count(w, c) + 1) / (tokens(c) + V). Every ln is converted
  * to integer MICRO-NATS at the seam — round(ln(p) * 10^6) — the same
  * cross-libm discipline as the repo's 6 dp rounding (x24/x25): after
  * the seam, per-document accumulation is exact BIGINT addition, so
  * sums are addition-order-insensitive and the DuckDB oracle reproduces
  * every score and every argmax bit-for-bit. Ties break to the
  * lexicographically smaller label in both engines.
  *
  * Shape at 100 TB: training is two one-shuffle aggregations over the
  * labeled sample (per-(token, class) counts; per-class totals). The
  * per-class totals, priors, and vocabulary size are k+2 driver-side
  * numbers; the (token, class) counts PIVOT to one row per token with k
  * count columns, so scoring is ONE equi-join of the exploded corpus
  * tokens against the vocabulary (AQE broadcasts a small model) and ONE
  * per-document aggregation of k integer sums — the corpus is never
  * row-multiplied by the class count, which a (token × class) cross
  * join would do. The class-wide column lists cap at [[MaxClasses]]
  * (the CentroidArgmin linear-codegen lesson: classifiers have dozens
  * of classes, not thousands — past that you want a different layout,
  * and the guard says so loudly).
  */
object NaiveBayes {

  val MaxClasses = 64

  /** Classify `docs` under an NB model trained on `ref` (rows carrying
    * `labelCol`). Output: (idCol, pred, score_micro) — winning label and
    * its total score in micro-nats (prior + token log-likelihoods).
    */
  /** `withMargin = true` appends `margin_micro` — the exact micro-nat
    * gap between the winning and runner-up class scores (0 on a tie,
    * NULL when only one class exists), the confidence lane the x124
    * reliability audit bins on. The base three columns are unchanged.
    */
  def classify(docs: DataFrame, ref: DataFrame, idCol: String,
               textCol: String, labelCol: String,
               withMargin: Boolean = false): DataFrame = {
    // every model statistic (priors, token counts, vocab) comes from the
    // same LABELED population: a null-labeled ref row belongs to no class,
    // and letting it into nDocs/vocab would skew every prior (and NPE the
    // sorted label map)
    val labeled = ref.filter(col(labelCol).isNotNull)
    val labels = labeled.select(col(labelCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(labels.nonEmpty, s"no labels in $labelCol")
    require(labels.size <= MaxClasses,
      s"${labels.size} classes exceeds the $MaxClasses cap — the pivoted " +
        "k-wide score layout is built for dozens of classes, not thousands")

    val tok = labeled.select(col(labelCol).cast("string").as("label"),
      explode(split(col(textCol), " ")).as("w"))
    // per-class token totals, doc counts, vocab size: k+2 driver numbers
    val totals = tok.groupBy(col("label")).agg(count(lit(1)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docCounts = labeled.groupBy(col(labelCol).cast("string").as("label"))
      .agg(count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs = docCounts.values.sum
    val vocabSize = tok.select(col("w")).distinct().count()

    // (token, class) counts pivoted to one row per token, k columns
    val wide = tok.groupBy(col("label"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("w")).pivot("label", labels).agg(sum(col("c")))

    def lnMicro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round(log(c) * lit(1e6)).cast("long")
    // prior in micro-nats, computed with the same SQL ln/round as the
    // token terms (and as the oracle) rather than driver-side math.log,
    // so the half-up boundary semantics cannot diverge between engines
    val priorRow = docCounts.keys.toSeq.sorted.map { l =>
      lnMicro(lit(docCounts(l).toDouble / nDocs)).as(s"prior_$l")
    }
    val priors = docs.sparkSession.range(1).select(priorRow: _*)
      .collect().head
    val prior = labels.indices.map(i => priors.getLong(i))

    val scored = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .join(wide, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(lnMicro((coalesce(col(s"`${labels.head}`"), lit(0L)) + lit(1L))
          .cast("double") / lit((totals.getOrElse(labels.head, 0L) + vocabSize).toDouble)))
          .as("s_0"),
        labels.zipWithIndex.tail.map { case (l, i) =>
          sum(lnMicro((coalesce(col(s"`$l`"), lit(0L)) + lit(1L))
            .cast("double") / lit((totals.getOrElse(l, 0L) + vocabSize).toDouble)))
            .as(s"s_$i")
        }: _*)
    // argmax via struct max: (score, -index) — highest score wins, ties
    // go to the largest -index = the lexicographically smallest label
    val cands = array(labels.indices.map(i =>
      struct((col(s"s_$i") + lit(prior(i))).as("score"),
        lit(-i).as("neg_idx"))): _*)
    val best = array_max(cands)
    val baseCols = Seq(col(idCol),
      element_at(array(labels.map(lit): _*), -best.getField("neg_idx") + 1)
        .as("pred"),
      best.getField("score").as("score_micro"))
    val marginCol =
      if (labels.size < 2) lit(null).cast("long").as("margin_micro")
      else (best.getField("score") -
        element_at(array_sort(cands), labels.size - 1).getField("score"))
        .as("margin_micro")
    scored.select(baseCols ++ (if (withMargin) Seq(marginCol) else Nil): _*)
  }
}
