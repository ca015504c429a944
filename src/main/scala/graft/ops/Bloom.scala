package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X74 — Bloom-gated eval-set contamination check: the x13 exact
  * shingle-membership semantics behind a Bloom-filter pre-gate (Bloom
  * 1970; the standard big-data membership shortcut — Spark itself ships
  * one for runtime join filters).
  *
  * Why it exists at 100 TB: the exact check joins EVERY corpus shingle
  * against the eval set. Broadcasting the eval shingle STRINGS into that
  * join works (x13) but makes every scan task probe a multi-GB string
  * hash map when the eval suite is large. A Bloom bitmap is a fixed
  * `m`-bit artifact (2^18 bits = 32 KB here) that answers "definitely
  * not present" row-locally with k integer hashes — the overwhelming
  * majority of corpus shingles die at the scan, and only the
  * bloom-positive sliver reaches the exact verify join. The composition
  * is LOSSLESS: a Bloom filter has no false negatives, so
  * gate-then-verify returns byte-identically the exact answer — which is
  * exactly what the oracle (the naive exact join) proves per run. False
  * positives only cost verify-join rows, never correctness (the x48
  * prune-then-verify discipline).
  *
  * Determinism: bit positions are k disjoint 8-hex lanes of md5(s) mod m
  * — the repo-wide md5 lane family ([[Dedup]] MinHash), so the bitmap is
  * a pure function of the eval set, reproducible across engines and
  * retries.
  *
  * Scale seams, loud: the bitmap is driver-assembled from a distributed
  * `bit_or` aggregation over WORD indexes (≤ m/64 rows collected — 4096
  * longs at the default m, never shingle-count-sized) and re-enters the
  * plan as one array literal in the scan-side membership predicate; m is
  * capped at [[MaxBits]] (2 MB of longs) — past that you shard the
  * bitmap, a different layout.
  */
object Bloom {

  /** Driver-side bitmap cap, in bits (2^24 = 2 MiB of longs). */
  val MaxBits: Int = 1 << 24

  /** md5 has 32 hex chars = 4 disjoint 8-hex (32-bit) lanes. */
  val MaxHashes: Int = 4

  private def checkParams(m: Int, k: Int): Unit = {
    require(m >= 64 && m <= MaxBits && m % 64 == 0,
      s"bloom bits m=$m must be a multiple of 64 in [64, $MaxBits]")
    require(k >= 1 && k <= MaxHashes,
      s"bloom hashes k=$k must be in [1, $MaxHashes] (md5 has 4 disjoint " +
        "32-bit lanes)")
  }

  /** The k bit positions of `s`: disjoint 8-hex md5 lanes mod m, as
    * long columns in [0, m).
    */
  def positions(s: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map(i =>
      conv(substring(md5(s), i * 8 + 1, 8), 16, 10).cast("long") % m)

  /** Build the m-bit bitmap over the values of `sCol`: one map-side-
    * combined `bit_or` per 64-bit word, ≤ m/64 rows to the driver.
    */
  def buildBitmap(vals: DataFrame, sCol: String, m: Int, k: Int): Array[Long] = {
    checkParams(m, k)
    val pos = vals.select(explode(array(positions(col(sCol), m, k): _*)).as("p"))
    val words = pos
      .select(expr("p div 64").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("bit"))
      .groupBy(col("w")).agg(call_function("bit_or", col("bit")).as("bits"))
      .collect()
    val bm = Array.fill(m / 64)(0L)
    words.foreach(r => bm(r.getLong(0).toInt) = r.getLong(1))
    bm
  }

  /** Row-local membership probe: true iff all k bits of `s` are set in
    * `bm` — "maybe present"; false is a certain miss. The bitmap rides
    * the plan as a single array literal (codegen-friendly: element_at +
    * shiftright + mask, no UDF).
    */
  def mightContain(s: Column, bm: Array[Long], m: Int, k: Int): Column = {
    checkParams(m, k)
    require(bm.length == m / 64, s"bitmap has ${bm.length} words, want ${m / 64}")
    val words = typedLit(bm.toSeq)
    positions(s, m, k).map { p =>
      val word = element_at(words, (floor(p / 64) + 1).cast("int"))
      (call_function("shiftright", word, (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L))
    }.reduce(_ && _)
  }

  /** X74 end to end: per-doc count of distinct eval docs sharing an
    * n-token shingle — x13's exact semantics, computed Bloom-gated.
    * `docs` and `evalDocs` are disjoint by contract (the x60 split).
    * Returns (idCol, n_eval_matches) DENSE over every doc — clean docs
    * carry 0, so the lossless-gate claim is pinned corpus-wide, not
    * just on the contaminated sliver.
    */
  def contamination(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int, m: Int, k: Int): DataFrame =
    contaminationAgainst(docs,
      Dedup.shingleTable(evalDocs, idCol, textCol, n)
        .select(col(idCol).as("eval_id"), col("s")),
      idCol, textCol, n, m, k)

  /** The gate+verify half of [[contamination]], against a PREPARED
    * (eval_id, s) shingle table — split out so the streaming twin
    * ([[graft.streaming.BloomGateStream]]) can accumulate the eval side
    * incrementally across batches.
    */
  def contaminationAgainst(docs: DataFrame, evalSh: DataFrame,
                           idCol: String, textCol: String,
                           n: Int, m: Int, k: Int): DataFrame = {
    val ev = evalSh.select(col("eval_id"), col("s").as("es"))
    val bm = buildBitmap(ev.select(col("es").as("s")).distinct(), "s", m, k)
    val cand = Dedup.shingleTable(docs, idCol, textCol, n)
      .filter(mightContain(col("s"), bm, m, k))
    val hits = cand.join(broadcast(ev), col("s") === col("es"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("eval_id")).as("m"))
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("m"), lit(0L)).as("n_eval_matches"))
  }
}
