package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.KneserNey

/** X52 in streaming form: an ONLINE self-training Kneser-Ney scorer —
  * each micro-batch is scored against the model over ALL documents seen
  * so far INCLUDING itself, then folds its own statistics into the
  * appended model state. The emitted score of batch N is therefore
  * bit-identical to batch-mode `KneserNey.score(batchN, union of
  * batches 0..N)` (spec-pinned) — the point-in-time contract: earlier
  * batches were scored under smaller models and are never re-scored
  * (append-only emissions, as [[SubstringStream]]'s cap).
  *
  * THE MODEL STATE IS THE ARTIFACT, NOT THE TEXT: raw documents are
  * never retained or re-scanned. Per batch the state gains (a) ADDITIVE
  * 5-gram count deltas and (b) the batch's NEW n-gram types at orders
  * 4..1 plus new continuation-1 keys (anti-joined against the prior
  * type sets — continuation counts are type counts, so only novelty
  * appends), plus (c) a 3-number summary row. Scoring rebuilds just the
  * model rows the batch can touch: every model table is SEMI-JOIN
  * PRUNED by the batch's history keys before aggregation (a key's
  * aggregate over the pruned rows equals the full-table value — pruning
  * selects whole groups), so per-batch join work scales with state rows
  * MATCHING the batch, never the corpus; the three global constants
  * (distinct bigram types, continuation keys, vocabulary) come from
  * summing the batch-count summaries — O(batches) rows, no state scan.
  *
  * State is APPEND-ONLY and batchId-partitioned
  * (`state/{c5,t4,t3,t2,t1,c1k,summary,scores}/batch_id=N`) with the
  * strict `batch_id < N` read rule: at-least-once replay sees the
  * identical prior state and rewrites identical partitions —
  * exactly-once with no pointer file.
  */
object KnLmStream {

  def applyBatch(statePath: String, idCol: String, textCol: String)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = batch.select(col(idCol), col(textCol)).localCheckpoint(false)

    // ---- the batch's model-statistic deltas ----
    val deltaC5 = KneserNey.ngramRows(delta, textCol, 5)
      .groupBy(col("g")).agg(count(lit(1)).as("c")).localCheckpoint(false)
    def deltaTypes(n: Int): DataFrame =
      KneserNey.ngramRows(delta, textCol, n).distinct()
    val deltaT4 = deltaTypes(4)
    val deltaT3 = deltaTypes(3)
    val deltaT2 = deltaTypes(2)
    val deltaT1 = delta.select(explode(split(col(textCol), " ")).as("g"))
      .distinct()

    // ---- prior state ----
    def st(name: String, like: DataFrame, cols: Seq[String]): DataFrame =
      DedupStream.readState(spark, s"$statePath/$name", like, cols, batchId)
    val priorC5 = st("c5", deltaC5, Seq("g", "c"))
    val priorT4 = st("t4", deltaT4, Seq("g"))
    val priorT3 = st("t3", deltaT3, Seq("g"))
    val priorT2 = st("t2", deltaT2, Seq("g"))
    val priorT1 = st("t1", deltaT1, Seq("g"))
    val deltaC1k = deltaT2
      .select(substring_index(col("g"), " ", -1).as("w")).distinct()
    val priorC1k = st("c1k", deltaC1k, Seq("w"))

    // novelty only: type sets append what the corpus has not seen
    val newT4 = deltaT4.join(priorT4, Seq("g"), "left_anti")
      .localCheckpoint(false)
    val newT3 = deltaT3.join(priorT3, Seq("g"), "left_anti")
      .localCheckpoint(false)
    val newT2 = deltaT2.join(priorT2, Seq("g"), "left_anti")
      .localCheckpoint(false)
    val newT1 = deltaT1.join(priorT1, Seq("g"), "left_anti")
      .localCheckpoint(false)
    val newC1k = deltaC1k.join(priorC1k, Seq("w"), "left_anti")
      .localCheckpoint(false)

    // ---- global constants from the summary ledger (O(batches) rows) ----
    val sumLike = delta.sparkSession.range(0)
      .select(lit(0L).as("n_t2"), lit(0L).as("n_t1"), lit(0L).as("n_c1k"))
    val priorSum = st("summary", sumLike, Seq("n_t2", "n_t1", "n_c1k"))
      .agg(coalesce(sum(col("n_t2")), lit(0L)).as("pt2"),
        coalesce(sum(col("n_t1")), lit(0L)).as("pt1"),
        coalesce(sum(col("n_c1k")), lit(0L)).as("pc1k"))
    val newCounts = newT2.agg(count(lit(1)).as("n_t2"))
      .crossJoin(newT1.agg(count(lit(1)).as("n_t1")))
      .crossJoin(newC1k.agg(count(lit(1)).as("n_c1k")))
      .localCheckpoint(false)
    val consts = priorSum.crossJoin(newCounts)
      .select((col("pt2") + col("n_t2")).as("tc1"),
        (col("pc1k") + col("n_c1k")).as("v1"),
        (col("pt1") + col("n_t1")).as("v"))

    // ---- the batch's history-key sets (what the model joins can touch);
    // each pair key's history is a prefix of it, so one semi-join per
    // order covers both the pair and the history table ----
    val pos = delta.select(explode(
      graft.functions.Shingles.shingles(split(col(textCol), " "), 5)).as("g"))
    val h4s = pos.select(substring_index(col("g"), " ", 4).as("h4")).distinct()
    val h3s = pos.select(substring_index(
      substring_index(col("g"), " ", -4), " ", 3).as("h3")).distinct()
    val h2s = pos.select(substring_index(
      substring_index(col("g"), " ", -3), " ", 2).as("h2")).distinct()
    val h1s = pos.select(substring_index(
      substring_index(col("g"), " ", -2), " ", 1).as("h1")).distinct()
    val ws = pos.select(substring_index(col("g"), " ", -1).as("w")).distinct()

    // ---- restricted model over state ∪ delta ----
    val c5r = priorC5.unionByName(deltaC5)
      .withColumn("h4", substring_index(col("g"), " ", 4))
      .join(h4s, Seq("h4"), "left_semi")
    val c5m = c5r.groupBy(col("g")).agg(sum(col("c")).as("c5"))
    val h5m = c5m.groupBy(substring_index(col("g"), " ", 4).as("h4"))
      .agg(sum(col("c5")).as("tot5"), count(lit(1)).as("n1p5"))

    val t5r = priorC5.select(col("g")).unionByName(deltaC5.select(col("g")))
      .withColumn("h3", substring_index(
        substring_index(col("g"), " ", -4), " ", 3))
      .join(h3s, Seq("h3"), "left_semi")
      .select(col("g")).distinct()
    val cont4 = t5r.groupBy(substring_index(col("g"), " ", -4).as("u4"))
      .agg(count(lit(1)).as("cn4"))
    val hist4 = cont4.groupBy(substring_index(col("u4"), " ", 3).as("h3"))
      .agg(sum(col("cn4")).as("den4"), count(lit(1)).as("n1p4"))

    // prior ∪ NEW is a disjoint union of the full type set — no distinct
    val t4r = priorT4.unionByName(newT4)
      .withColumn("h2", substring_index(
        substring_index(col("g"), " ", -3), " ", 2))
      .join(h2s, Seq("h2"), "left_semi")
    val cont3 = t4r.groupBy(substring_index(col("g"), " ", -3).as("u3"))
      .agg(count(lit(1)).as("cn3"))
    val hist3 = cont3.groupBy(substring_index(col("u3"), " ", 2).as("h2"))
      .agg(sum(col("cn3")).as("den3"), count(lit(1)).as("n1p3"))

    val t3r = priorT3.unionByName(newT3)
      .withColumn("h1", substring_index(
        substring_index(col("g"), " ", -2), " ", 1))
      .join(h1s, Seq("h1"), "left_semi")
    val cont2 = t3r.groupBy(substring_index(col("g"), " ", -2).as("u2"))
      .agg(count(lit(1)).as("cn2"))
    val hist2 = cont2.groupBy(substring_index(col("u2"), " ", 1).as("h1"))
      .agg(sum(col("cn2")).as("den2"), count(lit(1)).as("n1p2"))

    val cont1 = priorT2.unionByName(newT2)
      .withColumn("w", substring_index(col("g"), " ", -1))
      .join(ws, Seq("w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).as("cn1"))

    val scores = KneserNey.scoreWithModel(delta, idCol, textCol,
      KneserNey.Model(c5m, h5m, cont4, hist4, cont3, hist3, cont2, hist2,
        cont1, consts))

    // ---- emissions + state appends (own partitions: replay rewrites) ----
    scores.write.mode("overwrite")
      .parquet(s"$statePath/scores/batch_id=$batchId")
    deltaC5.write.mode("overwrite")
      .parquet(s"$statePath/c5/batch_id=$batchId")
    newT4.write.mode("overwrite").parquet(s"$statePath/t4/batch_id=$batchId")
    newT3.write.mode("overwrite").parquet(s"$statePath/t3/batch_id=$batchId")
    newT2.write.mode("overwrite").parquet(s"$statePath/t2/batch_id=$batchId")
    newT1.write.mode("overwrite").parquet(s"$statePath/t1/batch_id=$batchId")
    newC1k.write.mode("overwrite")
      .parquet(s"$statePath/c1k/batch_id=$batchId")
    newCounts.write.mode("overwrite")
      .parquet(s"$statePath/summary/batch_id=$batchId")
  }

  /** All per-batch scores emitted so far. */
  def scores(spark: SparkSession, statePath: String, idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/scores")
      .select(col(idCol), col("n_ngrams"), col("n_unseen"),
        col("sum_p_fix"), col("avg_p_fix"))

  /** Drain a streaming frame of (idCol, textCol) documents into the
    * online KN scorer state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("KnLmStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
