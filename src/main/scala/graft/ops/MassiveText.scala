package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X68 — the composed MassiveText-style gate (Rae et al. 2021 end to
  * end): [[C4]] line cleaning first, then the [[Gopher]] quality rules
  * AND repetition signals evaluated over the CLEANED text, the order
  * the paper's pipeline applies them.
  *
  * SHAPE AT 100 TB: the whole three-stage pipeline is ONE scan-side
  * projection — the stage verdicts are column kernels
  * ([[C4.pageVerdict]]/[[C4.cleanedCol]], [[Gopher.qualityVerdict]],
  * [[Gopher.repetitionVerdict]]) composed in the same select, so there
  * is no join, no shuffle, and no second pass over the corpus between
  * stages (plan-pinned). Downstream verdicts are NULL for documents C4
  * already dropped (their cleaned text does not exist).
  *
  * Output: doc_id, c4_kept, quality_kept, rep_kept, kept_doc.
  */
object MassiveText {

  def gate(docs: DataFrame, idCol: String, textCol: String,
           minWords: Int = 3, minLines: Int = 5): DataFrame = {
    val page = col(textCol)
    // Stage the CLEANED text — and its line/word arrays — as real
    // columns before the Gopher kernels read them: higher-order-
    // function kernels are CodegenFallback and re-evaluate child trees
    // per signal with no cross-column CSE, so the inline `cleaned`
    // expression re-ran the whole C4 line filter once per Gopher gate
    // (~20× per row — the round-21 x68 cost center). Pipelined
    // projections over the same scan: still no join, no shuffle, no
    // second pass over the corpus between stages (plan-pinned).
    val staged = docs
      .select(col(idCol),
        C4.pageVerdict(page, minWords, minLines).as("c4_kept"),
        C4.cleanedCol(page, minWords, minLines).as("__cleaned"))
      .select(col(idCol), col("c4_kept"), col("__cleaned"),
        Gopher.linesOf(col("__cleaned")).as("__lines"),
        Gopher.wordsOf(col("__cleaned")).as("__words"))
    staged.select(col(idCol), col("c4_kept"),
        when(col("c4_kept"), Gopher.qualityVerdict(col("__cleaned"),
          col("__lines"), col("__words"))).as("quality_kept"),
        when(col("c4_kept"), Gopher.repetitionVerdict(col("__cleaned"),
          col("__lines"), col("__words"))).as("rep_kept"))
      .withColumn("kept_doc", col("c4_kept") &&
        coalesce(col("quality_kept"), lit(false)) &&
        coalesce(col("rep_kept"), lit(false)))
  }
}
