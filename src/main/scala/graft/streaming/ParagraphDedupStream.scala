package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Bloom, Dolma}

/** X87 in streaming form: the actual Dolma production shape — documents
  * arrive in batches and every PARAGRAPH is admitted exactly once
  * stream-wide: first occurrence (stream order, then (doc, idx) within
  * a batch) wins; every later copy is excised from its document before
  * emission.
  *
  * POINT-IN-TIME CONTRACT (the [[DecontaminateStream]] discipline):
  * batch N's output equals batch-mode within-batch paragraph dedup
  * ([[graft.ops.C4.spanDedup]] at span=1) composed with
  * [[Dolma.paragraphDecontaminateAgainst]] versus the paragraphs
  * ADMITTED in batches 0..N−1 — so a single batch reduces to the batch
  * operator exactly (spec-pinned), and emitted documents are never
  * re-cut as the stream grows (append-only).
  *
  * STATE IS THE ADMITTED-DIGEST SET, never text: one md5 per distinct
  * paragraph ever admitted — the accumulating Bloom-side set of the
  * Dolma recipe, queryable exactly. Per batch the x74 bitmap is rebuilt
  * from the accumulated set (bitmap-sized bit_or — a production stream
  * would keep the bitmap itself as OR-monotone merge state, same
  * answers) and gates the batch's paragraph digests row-locally; only
  * the bloom-positive sliver reaches the exact verify join against the
  * state. State is APPEND-ONLY and batchId-partitioned with the strict
  * `batch_id < N` read rule: at-least-once replay sees the identical
  * prior state and rewrites identical partitions — exactly-once, no
  * pointer file.
  */
object ParagraphDedupStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 m: Int, k: Int)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // distinct: an at-least-once source can duplicate a document row
    // WITHIN one batch; it must be cut (and its paragraphs admitted)
    // once
    val docs = batch.select(col(idCol), col(textCol)).distinct()
      .localCheckpoint(false)
    val pars = Dolma.paragraphDigests(docs, idCol, textCol)
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/pdig",
      pars.select(col("d")), Seq("d"), batchId)
      .localCheckpoint(false)
    // within-batch first occurrence by (doc, idx): later copies drop
    val rn = row_number().over(
      Window.partitionBy(col("d")).orderBy(col(idCol), col("idx")))
    val ranked = pars.withColumn("rn", rn)
    // cross-batch: the x74 gate against the accumulated set — bitmap
    // probe kills the never-seen majority row-locally, exact verify
    // confirms the sliver (lossless, the Bloom no-false-negative
    // argument). The admitted set grows STREAM-WIDE, so the same scale
    // contract as [[Dolma.paragraphDecontaminateAgainst]] applies: the
    // bitmap is sized to the measured state cardinality (m is the
    // minimum), skipped loudly once saturated, and the verify join is
    // un-hinted — AQE broadcasts a small state, a large state shuffles
    // digest-only rows instead of force-collecting to the driver
    val nPrior = prior.count()
    val mEff = Dolma.derivedBits(m, nPrior)
    val fp = Dolma.bloomFpRate(mEff, k, nPrior)
    val gated = if (fp <= Dolma.MaxFpRate) {
      val bm = Bloom.buildBitmap(prior.select(col("d").as("s")), "s", mEff, k)
      ranked.filter(Bloom.mightContain(col("d"), bm, mEff, k))
    } else {
      System.err.println(
        f"[pdedup-stream] bloom gate SKIPPED at batch $batchId%d: " +
          f"$nPrior%d admitted digests saturate the ${Bloom.MaxBits}%d-bit " +
          f"cap (est. FP $fp%.3f) — exact digest semi join only " +
          "(results identical)")
      ranked
    }
    val priorHit = gated
      .join(prior, Seq("d"), "left_semi")
      .select(col(idCol), col("idx"))
    val dupWithin = ranked.filter(col("rn") > 1)
      .select(col(idCol), col("idx"))
    val cleaned = Dolma.exciseByIdx(docs,
      dupWithin.unionByName(priorHit).distinct(), idCol, textCol)
    cleaned.write.mode("overwrite")
      .parquet(s"$statePath/out/batch_id=$batchId")
    // admit: this batch's first occurrences that the stream has never
    // seen — the state stays the distinct admitted-digest set
    val novel = ranked.filter(col("rn") === 1).select(col("d")).distinct()
      .join(prior, Seq("d"), "left_anti")
    novel.write.mode("overwrite")
      .parquet(s"$statePath/pdig/batch_id=$batchId")
  }

  /** All cleaned documents emitted so far. */
  def cleaned(spark: SparkSession, statePath: String,
              idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/out")
      .select(col(idCol), col("n_pars"), col("n_removed"), col("cleaned"))

  /** Drain a streaming frame of (idCol, textCol) rows through the
    * online paragraph gate under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, m: Int, k: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("ParagraphDedupStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, m, k)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
