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
    val c4k = C4.pageVerdict(page, minWords, minLines)
    val cleaned = C4.cleanedCol(page, minWords, minLines)
    docs.select(col(idCol), c4k.as("c4_kept"),
        when(c4k, Gopher.qualityVerdict(cleaned)).as("quality_kept"),
        when(c4k, Gopher.repetitionVerdict(cleaned)).as("rep_kept"))
      .withColumn("kept_doc", col("c4_kept") &&
        coalesce(col("quality_kept"), lit(false)) &&
        coalesce(col("rep_kept"), lit(false)))
  }
}
