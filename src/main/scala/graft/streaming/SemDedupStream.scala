package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Similarity

/** X36 in streaming form: ONLINE semantic deduplication over a growing
  * embedding corpus — the [[DedupStream]] pattern with the SemDeDup
  * cluster confinement. Each micro-batch assigns its vectors to the
  * FIXED coarse centroids (the quantizer is a persisted artifact trained
  * once per corpus version, exactly like the production IVF contract),
  * probes ONLY its own clusters against the appended index — clusters
  * the batch doesn't touch contribute zero join work — emits the
  * above-threshold cosine pairs it introduces (batch-vs-corpus and
  * batch-vs-batch), then appends its assigned rows to the index. A
  * vector is quantized and assigned exactly once, ever.
  *
  * State layout is APPEND-ONLY and batchId-partitioned
  * (`state/{vecs,pairs}/batch_id=N`), with the same replay contract as
  * [[DedupStream]]: a batch reads strictly `batch_id < N` and overwrites
  * its own partition, so at-least-once delivery collapses to
  * exactly-once pairs with no pointer file.
  */
object SemDedupStream {

  /** One micro-batch: assign, probe shared clusters, emit pairs, append
    * — exposed for direct unit testing of the replay contract.
    */
  def applyBatch(statePath: String, idCol: String, vecCol: String,
                 centroids: Array[Array[Int]], threshold: Double)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // assigned exactly once: these rows feed BOTH the probe and the append
    val delta = Similarity.assignLists(batch, idCol, vecCol, centroids)
      .select(col(idCol), col("q"), col("n2"), col("list_id"))
    val corpus = DedupStream.readState(spark, s"$statePath/vecs", delta,
      Seq(idCol, "q", "n2", "list_id"), batchId)
    val all = corpus.unionByName(delta)
    // delta probes; corpus-only clusters never join (probe-side build)
    val pairs = delta.as("a").join(all.as("b"),
        col("a.list_id") === col("b.list_id") &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(least(col(s"a.$idCol"), col(s"b.$idCol")).as("d1"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("d2"),
        round(Similarity.cosine(
          Similarity.dot(col("a.q"), col("b.q")),
          col("a.n2"), col("b.n2")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct() // delta x delta pairs arrive once from each side
    pairs.write.mode("overwrite")
      .parquet(s"$statePath/pairs/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/vecs/batch_id=$batchId")
  }

  /** All pairs emitted so far (d1, d2, sim). */
  def pairs(spark: SparkSession, statePath: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/pairs").select("d1", "d2", "sim")

  /** Drain a streaming frame of (idCol, vecCol) embeddings into the
    * online semantic-dedup state under `statePath`.
    */
  def start(emb: DataFrame, statePath: String, idCol: String, vecCol: String,
            checkpointDir: String, centroids: Array[Array[Int]],
            threshold: Double = 0.95,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    emb.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("SemDedupStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, vecCol, centroids, threshold)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
