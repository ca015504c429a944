package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** X41 in streaming form: ONLINE substring-run detection over a growing
  * corpus — the [[DedupStream]] pattern applied to positional window
  * fingerprints. Each micro-batch computes its [[Dedup.windowTable]]
  * ONCE (feeding both the probe and the index append), matches its
  * windows against the appended index plus itself, runs the
  * gaps-and-islands diagonal detection on the matched positions, emits
  * the maximal shared runs it introduces (batch-vs-corpus and
  * batch-vs-batch), and appends its own window rows. A document is
  * tokenized and fingerprinted exactly once, ever; per-batch cost
  * scales with the batch (corpus windows only join where a delta hash
  * matches — probe-side build), never the corpus.
  *
  * Run completeness: every emitted run has at least one delta endpoint,
  * and ALL window matches of such a pair exist at this batch (the delta
  * doc's windows are fully present, the partner's are fully in the
  * index), so islands — and therefore run maximality and offsets — are
  * exact, not incremental approximations. Already-emitted pairs between
  * older documents never rematch (both endpoints' bands sit in the
  * index; neither probes).
  *
  * State is APPEND-ONLY and batchId-partitioned
  * (`state/{windows,runs}/batch_id=N`) with the strict `batch_id < N`
  * read rule: at-least-once replay collapses to exactly-once runs with
  * no pointer file.
  *
  * `maxWindowFreq` is POINT-IN-TIME: each batch recomputes the hot set
  * over corpus-so-far + delta, so a hash is suppressed from the batch in
  * which it first crosses the cap and every batch after — but runs it
  * anchored in EARLIER batches were legitimate detections at their
  * emission time and are never retracted (emitted runs are append-only
  * facts, the K6 monitor-sink contract). Accumulated [[runs]] output can
  * therefore be a SUPERSET of batch-mode `substringRuns(cap)` over the
  * same final corpus; batch-equivalence holds per batch, and exactly
  * when no hash crosses the cap mid-stream (both spec-pinned in
  * `SubstringStreamSpec`). Replay stays idempotent: a replayed batch
  * sees the identical `batch_id < N` corpus, hence the identical hot
  * set.
  */
object SubstringStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 k: Int, minSpan: Int, maxWindowFreq: Option[Int])
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(minSpan >= k, s"minSpan $minSpan below window size $k")
    val deltaW = Dedup.windowTable(
      batch.select(col(idCol), col(textCol)), idCol, textCol, k)
    val corpusW = DedupStream.readState(spark, s"$statePath/windows",
      deltaW, Seq(idCol, "p", "h"), batchId)
    val allW = corpusW.unionByName(deltaW)
    val (probe, build) = maxWindowFreq match {
      case Some(cap) =>
        val hot = allW.groupBy(col("h")).agg(count(lit(1)).as("occ"))
          .filter(col("occ") > cap).select(col("h"))
        (deltaW.join(broadcast(hot), Seq("h"), "left_anti"),
          allW.join(broadcast(hot), Seq("h"), "left_anti"))
      case None => (deltaW, allW)
    }
    // normalize to (d1 < d2) with positions following their documents;
    // delta x delta matches arrive once from each side -> distinct
    val m = probe.as("a").join(build.as("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(
        least(col(s"a.$idCol"), col(s"b.$idCol")).as("d1"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("d2"),
        when(col(s"a.$idCol") < col(s"b.$idCol"), col("a.p"))
          .otherwise(col("b.p")).as("pa"),
        when(col(s"a.$idCol") < col(s"b.$idCol"), col("b.p"))
          .otherwise(col("a.p")).as("pb"))
      .distinct()
    val byDiag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d1"), col("d2"), col("diag")).orderBy(col("pa"))
    val runs = m.withColumn("diag", col("pa") - col("pb"))
      .withColumn("island", col("pa") - row_number().over(byDiag))
      .groupBy(col("d1"), col("d2"), col("diag"), col("island"))
      .agg(min(col("pa")).as("a_start"), min(col("pb")).as("b_start"),
        (count(lit(1)) + lit(k - 1).cast("long")).as("span_len"))
      .filter(col("span_len") >= minSpan)
      .select(col("d1"), col("d2"), col("a_start"), col("b_start"),
        col("span_len"))
    runs.write.mode("overwrite")
      .parquet(s"$statePath/runs/batch_id=$batchId")
    deltaW.write.mode("overwrite")
      .parquet(s"$statePath/windows/batch_id=$batchId")
  }

  /** All runs emitted so far (d1, d2, a_start, b_start, span_len). */
  def runs(spark: SparkSession, statePath: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/runs")
      .select("d1", "d2", "a_start", "b_start", "span_len")

  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, checkpointDir: String, k: Int = 6,
            minSpan: Int = 8,
            maxWindowFreq: Option[Int] = None,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("SubstringStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, k, minSpan, maxWindowFreq)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
