package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Curate, Dedup}

/** X116 in streaming form: the ONLINE curation pipeline — corpus and
  * eval documents arrive interleaved (rows flagged by `evalCol`), and
  * every corpus document runs the in-order online stages against the
  * state accumulated so far:
  *
  *   gate (quality / repetition, [[Curate.gateSignals]] — the SAME
  *   projection the batch flagship uses, so the two cannot drift)
  *   → exact dedup (normalized fingerprint vs every fingerprint
  *     retained before, then first-occurrence within the batch)
  *   → MinHash-LSH near-dedup (probe the persisted band index — the
  *     [[DedupStream]] machinery; an arriving near-dup of a RETAINED
  *     doc drops, the retained corpus is never revisited)
  *   → n-gram decontamination (vs eval shingles seen so far INCLUDING
  *     this batch's — the [[DecontaminateStream]] point-in-time rule).
  *
  * Emitted per batch: the per-document DISPOSITION LEDGER (doc_id,
  * verdict ∈ eval/gate/exact_dup/near_dup/decon/kept) — the batch
  * flagship's ledger restricted to the online stages. Quota, split
  * assignment, and packing are corpus-shape decisions (they depend on
  * totals a stream has not seen yet) and stay batch-side by design.
  *
  * POINT-IN-TIME CONTRACT: with empty prior state, one batch's ledger
  * equals the composed batch stages run on that batch alone (the spec
  * pins this against the batch operators). The retained corpus is
  * append-only: a prior KEPT doc never flips verdict when a later
  * near-dup of it arrives — the ARRIVING doc drops (pairs from the
  * index probe always have ≥1 batch member; the batch member is the
  * one ledgered `near_dup`).
  *
  * STATE is append-only, batchId-partitioned, strictly `batch_id < N`
  * on read (the [[DedupStream]] replay rule — at-least-once replay
  * rewrites identical partitions, exactly-once without a pointer
  * file). Sizes differ by table — the per-batch COST contract is
  * "scales with retained corpus, never raw stream volume":
  *   - `fps/`    one 16-byte digest per retained-at-exact-stage doc
  *     (sliver-sized; the exact-dedup probe is a digest anti-join);
  *   - `bands/`  the LSH band index of stage-3 survivors — fixed-width
  *     rows, numSigs/rowsPerBand per doc (sliver-sized);
  *   - `docs/`   RETAINED-CORPUS-SIZED: the full text of every kept
  *     doc, because pair VERIFICATION (exact Jaccard above the LSH
  *     candidate cut) needs the member text. Each batch's probe
  *     re-scans it for the verify join, so per-batch cost grows with
  *     the retained corpus — the price of exact verification; a
  *     candidate-pruned read (semi-join on band-collision ids pushed
  *     into the scan) is the documented refinement if that scan ever
  *     dominates. [[StateMaintenance.compactState]] keeps its
  *     PARTITION COUNT bounded so listing/footer overhead does not
  *     also grow with stream length;
  *   - `evsh/`   the NOVEL distinct eval shingles (the
  *     [[KnLmStream]] novelty-append discipline — bounded by the eval
  *     suite, broadcasts into each batch's probe);
  *   - `ledger/` the emitted verdicts.
  */
object CurateStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 evalCol: String, qualityMin: Double, dupMax: Double,
                 numSigs: Int = 16, rowsPerBand: Int = 4,
                 threshold: Double = 0.8, deconN: Int = 8)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // a NULL eval flag must not vanish the row from the ledger (both
    // filters below would reject it): null reads as corpus
    val rows = batch
      .select(col(idCol), col(textCol),
        coalesce(col(evalCol), lit(false)).as("is_eval"))
      .localCheckpoint(false)

    // eval side: novelty-append the distinct shingle set
    val evalDelta = Dedup.evalShingleSet(
      rows.filter(col("is_eval")), textCol, deconN)
    val priorSh = DedupStream.readState(spark, s"$statePath/evsh",
      evalDelta, Seq("s"), batchId)
    val newSh = evalDelta.join(priorSh, Seq("s"), "left_anti")
      .localCheckpoint(false)
    val allSh = priorSh.unionByName(newSh)

    // stage 1: gate — one scan-side projection over the batch's corpus
    // rows; multi-consumer stages pin (the batch flagship discipline)
    val sig = Curate.gateSignals(
        rows.filter(!col("is_eval")).select(col(idCol), col(textCol)),
        textCol)
      .localCheckpoint(false)
    val gatePassed = sig.filter(Curate.gatePass(qualityMin, dupMax))
      .localCheckpoint(false)

    // stage 2: exact dedup — prior fingerprints always win, then first
    // occurrence (min id) within the batch
    val priorFps = DedupStream.readState(spark, s"$statePath/fps",
      gatePassed.select(col("norm_fp")), Seq("norm_fp"), batchId)
    val exactRanked = gatePassed
      .join(priorFps, Seq("norm_fp"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy("norm_fp").orderBy(idCol)))
      .localCheckpoint(false)
    val exactPassed = exactRanked.filter(col("rn") === 1)
      .select(col(idCol), col(textCol), col("norm_fp"))
      .localCheckpoint(false)
    val exactDropped = gatePassed
      .join(exactPassed.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol))

    // stage 3: near-dedup — hash the batch's survivors once, probe the
    // persisted index (batch-vs-corpus AND batch-vs-batch pairs)
    val deltaBands = Dedup.bandRows(
      Dedup.docSignatures(exactPassed, idCol, textCol, numSigs),
      idCol, numSigs, rowsPerBand)
    val corpusDocs = DedupStream.readState(spark, s"$statePath/docs",
      exactPassed.select(col(idCol), col(textCol)), Seq(idCol, textCol),
      batchId)
    val corpusBands = DedupStream.readState(spark, s"$statePath/bands",
      deltaBands, Seq(idCol, "band_id", "key"), batchId)
    val pairs = Dedup.incrementalLshPairsIndexed(exactPassed, deltaBands,
      corpusDocs, corpusBands, idCol, textCol, threshold)
    // the retained corpus never revisits: when the GREATER member of a
    // pair is a prior retained doc, the arriving lesser member drops;
    // otherwise the greater member is from this batch and drops (which
    // is exactly the batch operator's d2 rule when prior state is empty)
    val nearDrop = pairs
      .join(corpusDocs.select(col(idCol).as("d2"), lit(1).as("__prior")),
        Seq("d2"), "left")
      .select(when(col("__prior").isNotNull, col("d1")).otherwise(col("d2"))
        .as(idCol))
      .distinct().localCheckpoint(false)
    val nearPassed = exactPassed.join(nearDrop, Seq(idCol), "left_anti")
      .localCheckpoint(false)

    // stage 4: decontamination — any deconN-shingle shared with the
    // accumulated eval set (broadcast — the x74 bounded-eval contract)
    val deconDrop = Dedup.shingleTable(nearPassed, idCol, textCol,
        n = deconN)
      .join(broadcast(allSh.select(col("s").as("es"))),
        col("s") === col("es"))
      .select(col(idCol)).distinct().localCheckpoint(false)

    // ledger: every input row carries exactly one verdict
    def ledger(ids: DataFrame, verdict: String): DataFrame =
      ids.select(col(idCol), lit(verdict).as("verdict"))
    val out = ledger(rows.filter(col("is_eval")), "eval")
      .unionByName(ledger(sig.join(gatePassed.select(col(idCol)),
        Seq(idCol), "left_anti"), "gate"))
      .unionByName(ledger(exactDropped, "exact_dup"))
      .unionByName(ledger(nearDrop, "near_dup"))
      .unionByName(ledger(deconDrop, "decon"))
      .unionByName(ledger(nearPassed.join(deconDrop, Seq(idCol),
        "left_anti"), "kept"))

    out.write.mode("overwrite")
      .parquet(s"$statePath/ledger/batch_id=$batchId")
    exactPassed.select(col("norm_fp")).write.mode("overwrite")
      .parquet(s"$statePath/fps/batch_id=$batchId")
    exactPassed.select(col(idCol), col(textCol)).write.mode("overwrite")
      .parquet(s"$statePath/docs/batch_id=$batchId")
    deltaBands.write.mode("overwrite")
      .parquet(s"$statePath/bands/batch_id=$batchId")
    newSh.write.mode("overwrite")
      .parquet(s"$statePath/evsh/batch_id=$batchId")
  }

  /** The full ledger emitted so far (idCol, verdict, batch_id). */
  def ledger(spark: SparkSession, statePath: String,
             idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/ledger")
      .select(col(idCol), col("verdict"), col("batch_id"))

  /** Drain a streaming frame of (idCol, textCol, evalCol) rows into
    * the online curation state under `statePath`.
    *
    * @param maintainEvery when > 0, run [[StateMaintenance.maintain]]
    *   after every `maintainEvery`-th batch, at the watermark the
    *   checkpoint's own commits log proves safe
    *   ([[StateMaintenance.committedWatermark]]) — the stream bounds
    *   its own state partition count with no external scheduler. Safe
    *   inside foreachBatch: the current batch has not committed, so
    *   the watermark is always <= it, and no other batch can be
    *   in flight. External state readers see the same brief swap
    *   window as any [[Pump.compact]] run. COST: a fold rewrites the
    *   folded data (for `docs/`, the retained corpus), so pick a
    *   cadence that amortizes it — maintainEvery should be hundreds
    *   at production trigger rates, not 1 (1 is the spec's setting,
    *   where the corpus is rows, not terabytes).
    * @param maintainFilesPerFold output files per folded sentinel —
    *   the [[StateMaintenance.compactState]] knob, defaulted for the
    *   retained-corpus-sized `docs/` table: a 1-file fold would both
    *   serialize the fold write through one task and strip every
    *   later verify-join scan of its split parallelism.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, evalCol: String, qualityMin: Double,
            dupMax: Double, checkpointDir: String,
            numSigs: Int = 16, rowsPerBand: Int = 4,
            threshold: Double = 0.8, deconN: Int = 8,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 32): StreamingQuery = {
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("CurateStream",
        statePath, checkpointDir, maintainEvery, maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, evalCol, qualityMin,
          dupMax, numSigs, rowsPerBand, threshold, deconN)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
