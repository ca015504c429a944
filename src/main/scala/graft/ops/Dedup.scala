package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X1 — deduplication family for large-scale training-data pipelines
  * (SURVEY §2.8). Exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup, all as declarative compositions so Catalyst
  * keeps them codegen'd and shuffle-minimal.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-partitioned groupBy on the digest — the
  *    digest (16 bytes) shuffles, never the document body;
  *  - the shingle self-join (Jaccard) is quadratic in the worst case —
  *    it exists as the *verifier*; the scale path is MinHash+LSH, whose
  *    only wide op is a groupBy on (band_id, band_key) buckets: candidate
  *    pairs are generated bucket-locally, then verified exactly. Hot
  *    buckets (boilerplate shingles) should be salted or capped;
  *  - signatures use min(md5(seed|shingle)) — a true MinHash over md5's
  *    permutation, engine-portable and deterministic, so results are
  *    reproducible across runs and verifiable by an external SQL engine.
  */
object Dedup {

  /** Tokenize single-space-separated text. */
  def tokens(text: Column): Column = split(text, " ")

  /** n-token shingles of a token array (empty if too short) — native
    * expression, see [[graft.functions.Shingles]] for why not HOFs.
    */
  def shingles(ts: Column, n: Int): Column =
    graft.functions.Shingles.shingles(ts, n)

  /** (doc_id, s) distinct shingle table — the base relation for the
    * Jaccard/MinHash family.
    *
    * Distinctness is per-document by construction (doc_id is in the key),
    * so it is enforced with `array_distinct` BEFORE the explode — a
    * per-row operation — rather than a global `.distinct()`, which would
    * shuffle every (doc_id, shingle) row across the cluster. The table
    * comes out of the scan stage shuffle-free.
    */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol),
      explode(array_distinct(shingles(tokens(col(textCol)), n))).as("s"))

  /** Per-doc distinct-shingle counts, computed ROW-LOCALLY from the doc —
    * the groupBy-count over the exploded table gives the same numbers at
    * the price of a full shuffle; this is a scan-side projection.
    */
  def shingleCounts(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3): DataFrame =
    docs.select(col(idCol),
      size(array_distinct(shingles(tokens(col(textCol)), n))).cast("long").as("n"))
      .filter(col("n") > 0)

  /** Exact dedup: group rows by a digest of the dedup key, keep the
    * minimum id as the canonical representative. `dropDuplicates` without
    * the arbitrary-winner nondeterminism.
    */
  def exactDedup(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(md5(col(keyCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dups"))

  /** Exact shingle-set Jaccard >= threshold pairs (the verifier / small-N
    * path) with caller-supplied per-doc sizes — use [[shingleCounts]] when
    * sizes can come row-locally off the docs, which saves the groupBy
    * shuffle the no-sizes overload pays. `inter` shuffles on the shingle
    * value; doc-pair aggregation is the second shuffle.
    */
  def jaccardPairs(sh: DataFrame, sizes: DataFrame, idCol: String,
                   threshold: Double): DataFrame = {
    val inter = sh.as("a").hint("shuffle_hash").join(sh.as("b"),
        col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("i"))
    withJaccard(inter, sizes, idCol, threshold)
  }

  def jaccardPairs(sh: DataFrame, idCol: String, threshold: Double): DataFrame = {
    // sh feeds the size aggregate AND both self-join sides. It is NOT
    // persisted: since array_distinct made the pipeline shuffle-free,
    // re-running the narrow scan+explode per consumer is cheaper than
    // materializing the exploded table (measured 1.2 s persist vs 0.3 s
    // per recompute at sf0.1) — and at 100 TB, persisting an exploded
    // shingle table is exactly the memory blowup to avoid.
    val n = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    // shuffle-hash beats sort-merge here: no point sorting 100k+ string
    // shingle keys when the per-key groups are tiny
    val inter = sh.as("a").hint("shuffle_hash").join(sh.as("b"),
        col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("i"))
    withJaccard(inter, n, idCol, threshold)
  }

  /** Attach jaccard = i / (n1 + n2 - i) to candidate pairs and filter.
    * The per-doc size table is one long per DOCUMENT — it grows linearly
    * with the corpus, so the join strategy is left to AQE: small corpora
    * get runtime broadcast, 100 TB corpora fall back to a shuffle join
    * instead of forcing a corpus-sized broadcast build.
    */
  def withJaccard(pairs: DataFrame, sizes: DataFrame, idCol: String,
                  threshold: Double): DataFrame = {
    val n1 = sizes.withColumnRenamed(idCol, "d1").withColumnRenamed("n", "n1")
    val n2 = sizes.withColumnRenamed(idCol, "d2").withColumnRenamed("n", "n2")
    pairs.join(n1, "d1").join(n2, "d2")
      .withColumn("jac", round(col("i").cast("double") /
        (col("n1") + col("n2") - col("i")), 6))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** MinHash signatures: numSigs min-aggregates in ONE groupBy pass
    * (map-side combine keeps the shuffle at numSigs * 8 bytes per doc).
    *
    * Hash family: each md5 of `seed|shingle` yields FOUR independent
    * 32-bit lanes (8 hex chars each; fixed-width lowercase hex compares
    * lexicographically = numerically), so numSigs signatures cost only
    * ceil(numSigs/4) digests per shingle row — the md5s are the hot loop
    * at scale. The lanes are projected before the aggregate so each
    * digest is computed exactly once per row.
    */
  def minhashSignatures(sh: DataFrame, idCol: String, numSigs: Int): DataFrame = {
    val numSeeds = (numSigs + 3) / 4
    val withH = sh.select(col(idCol) +:
      (0 until numSeeds).map(g => md5(concat(lit(s"$g|"), col("s"))).as(s"h$g")): _*)
    def lane(i: Int): Column = substring(col(s"h${i / 4}"), (i % 4) * 8 + 1, 8)
    withH.groupBy(col(idCol)).agg(
      min(lane(0)).as("sig0"),
      (1 until numSigs).map(i => min(lane(i)).as(s"sig$i")): _*)
  }

  /** Doc-level MinHash signatures via the native one-pass expression
    * ([[graft.functions.MinHashSigs]]) — same hash family as
    * [[minhashSignatures]], but computed per document row straight off
    * the scan (no explode, no 16-way aggregate, no shuffle). Docs too
    * short to shingle produce no signature row, matching the exploded
    * form where they simply have no shingle rows.
    */
  def docSignatures(docs: DataFrame, idCol: String, textCol: String,
                    numSigs: Int, n: Int = 3): DataFrame = {
    val sigArr = graft.functions.MinHashSigs.minhash_sigs(
      array_distinct(shingles(tokens(col(textCol)), n)), numSigs)
    docs.select(col(idCol), sigArr.as("sigs"))
      .filter(col("sigs").isNotNull)
      .select(col(idCol) +:
        (0 until numSigs).map(i => element_at(col("sigs"), i + 1).as(s"sig$i")): _*)
  }

  /** LSH banding: rows/band contiguous signatures hash to a band key;
    * docs sharing any (band_id, key) are candidates. Quadratic work is
    * confined to individual buckets.
    *
    * `maxBucket` is the boilerplate-storm guard: a band key shared by B
    * documents yields B*(B-1)/2 candidate pairs, so one template shared
    * by a million docs is half a trillion pairs out of a single bucket.
    * Buckets larger than the cap are document-frequency-capped the same
    * way [[Skew.capDocumentFrequency]] treats stopword shingles: dropped
    * whole (their members are near-identical boilerplate that exact
    * dedup/fingerprinting already catches; genuinely similar pairs still
    * collide in their other numBands-1 bands). The cap costs one extra
    * aggregation over (band_id, key) and keeps the bucket self-join's
    * per-bucket work bounded by cap^2.
    */
  /** One (id, band_id, key) row per document per band — the LSH index
    * rows. At scale this IS the persisted dedup index: build it once per
    * corpus version, probe it with every delta batch
    * ([[incrementalLshPairs]]).
    */
  def bandRows(sigs: DataFrame, idCol: String, numSigs: Int,
               rowsPerBand: Int): DataFrame = {
    val numBands = numSigs / rowsPerBand
    val bands = array((0 until numBands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws(",", (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}")): _*))
          .as("key"))
    }: _*)
    sigs.select(col(idCol), explode(bands).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.key"))
  }

  def lshCandidates(sigs: DataFrame, idCol: String, numSigs: Int, rowsPerBand: Int,
                    maxBucket: Option[Int] = None): DataFrame = {
    val exploded = bandRows(sigs, idCol, numSigs, rowsPerBand)
    val capped = maxBucket match {
      case Some(cap) =>
        val hot = exploded.groupBy(col("band_id"), col("key"))
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") > cap)
          .select(col("band_id"), col("key"))
        exploded.join(hot, Seq("band_id", "key"), "left_anti")
      case None => exploded
    }
    capped.as("a").join(capped.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup: signature -> band -> candidates -> exact
    * verify. The verify join touches only candidate pairs, not all pairs.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      numSigs: Int = 16, rowsPerBand: Int = 4,
                      threshold: Double = 0.8,
                      maxBucket: Option[Int] = None,
                      prebuiltSigs: Option[DataFrame] = None): DataFrame = {
    // callers holding the session's persisted signature index pass it
    // in (the x1 pair-stage cache shares corpusSigs16)
    val cands = lshCandidates(prebuiltSigs.getOrElse(
        docSignatures(docs, idCol, textCol, numSigs)),
      idCol, numSigs, rowsPerBand, maxBucket)
    // LSH's whole point is that surviving candidates are FEW, so AQE's
    // runtime statistics pick a broadcast for the candidate (then
    // candidate-x-shingle) side when that holds — and degrade to a
    // shuffle join in a band-collision storm instead of OOMing a forced
    // broadcast build. No manual hints: the storm case must not require
    // an operator intervention (that is maxBucket's job, above).
    verifyCandidates(docs.select(col(idCol), col(textCol)), cands,
      idCol, textCol, threshold)
  }

  /** X32 — corpus-level MinHash sketch comparison: pairwise signature
    * agreement between GROUP sketches estimates the shingle-set Jaccard
    * between groups (sources, corpus versions, shards) without ever
    * joining their shingle sets. Group signatures come from
    * [[minhashSignatures]] keyed by the group column — min-aggregates,
    * so the sketches are MERGEABLE: the sketch of A∪B is the
    * element-wise min of the sketches of A and B (spec-verified), which
    * is what lets a 100 TB pipeline sketch each shard independently,
    * fold the sketches upward, and diff corpus versions from
    * kilobyte-sized artifacts. The pair join here is group×group —
    * dim-table-sized by definition.
    */
  def sketchOverlap(sigs: DataFrame, groupCol: String,
                    numSigs: Int): DataFrame = {
    val agree = (0 until numSigs)
      .map(i => when(col(s"a.sig$i") === col(s"b.sig$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    sigs.as("a").join(sigs.as("b"), col(s"a.$groupCol") < col(s"b.$groupCol"))
      .select(col(s"a.$groupCol").as("g1"), col(s"b.$groupCol").as("g2"),
        agree.as("n_agree"))
      .withColumn("est_jaccard",
        round(col("n_agree").cast("double") / numSigs, 6))
  }

  /** X30 — INCREMENTAL near-dup: the pairs involving at least one
    * document from `delta` (delta×delta and delta×corpus). The
    * corpus×corpus pairs are NEVER recomputed — this is how a production
    * pipeline actually runs dedup: the corpus's band rows
    * ([[bandRows]]) are a persisted index built once per corpus version,
    * and each incoming batch only hashes itself and probes that index,
    * so per-batch cost scales with the delta, not the corpus.
    *
    * Shape at 100 TB: the probe side (delta bands) is small by
    * construction, so AQE broadcasts it into the band-key join against
    * the corpus index; corpus buckets with no delta member contribute
    * ZERO join work (a probe-side hash/broadcast join skips them), which
    * is the whole point. `maxBucket` caps boilerplate-storm buckets over
    * the COMBINED population, mirroring [[lshCandidates]]. Verification
    * touches only candidate members' shingles.
    *
    * Same result contract as [[minhashLshPairs]] over delta ∪ corpus
    * restricted to pairs with a delta member (spec-verified equivalence).
    */
  def incrementalLshPairs(delta: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          numSigs: Int = 16, rowsPerBand: Int = 4,
                          threshold: Double = 0.8,
                          maxBucket: Option[Int] = None): DataFrame =
    incrementalLshPairsIndexed(delta,
      bandRows(docSignatures(delta, idCol, textCol, numSigs),
        idCol, numSigs, rowsPerBand),
      corpus,
      bandRows(docSignatures(corpus, idCol, textCol, numSigs),
        idCol, numSigs, rowsPerBand),
      idCol, textCol, threshold, maxBucket)

  /** [[incrementalLshPairs]] against ALREADY-BUILT band rows for both
    * sides (`deltaBands`/`corpusBands`: id, band_id, key) — the form a
    * pipeline actually runs once the index is persisted: the corpus is
    * never re-hashed, only probed, and the caller can reuse the delta's
    * bands for its own index append without hashing twice
    * ([[graft.streaming.DedupStream]] does both). `corpus` itself is
    * still needed for exact verification, but only candidate members'
    * documents are ever shingled (semi-join pruned).
    */
  def incrementalLshPairsIndexed(delta: DataFrame, deltaBands: DataFrame,
                                 corpus: DataFrame, corpusBands: DataFrame,
                                 idCol: String, textCol: String,
                                 threshold: Double,
                                 maxBucket: Option[Int] = None): DataFrame = {
    val all = deltaBands.unionByName(corpusBands)
    val (probe, build) = maxBucket match {
      case Some(cap) =>
        val hot = all.groupBy(col("band_id"), col("key"))
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") > cap)
          .select(col("band_id"), col("key"))
        (deltaBands.join(hot, Seq("band_id", "key"), "left_anti"),
          all.join(hot, Seq("band_id", "key"), "left_anti"))
      case None => (deltaBands, all)
    }
    val cands = probe.as("a").join(build.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(least(col(s"a.$idCol"), col(s"b.$idCol")).as("d1"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("d2"))
      .distinct()
      // the candidate list feeds THREE branches (both member-id arms and
      // the verify join); lazy-checkpoint it so the band join runs once,
      // not three times. Near-dup candidates are a sliver of the corpus —
      // the same tiny-pin trade as the session-cached LSH pair stage
      .localCheckpoint(false)
    // verification only ever shingles candidate MEMBERS: the member-id
    // semi-join prunes the corpus before the explode, so this stage is
    // candidate-sized even when the corpus is 100 TB
    val memberIds = cands.select(col("d1").as(idCol))
      .union(cands.select(col("d2").as(idCol)))
      .distinct()
    val members = delta.select(col(idCol), col(textCol))
      .unionByName(corpus.select(col(idCol), col(textCol)))
      .join(memberIds, Seq(idCol), "left_semi")
      // three consumers (both shingle sides, the size projection) —
      // candidate-sized, so pin it rather than re-scan the corpus thrice
      .localCheckpoint(false)
    verifyCandidates(members, cands, idCol, textCol, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against their
    * members' shingle sets — the shared tail of [[minhashLshPairs]] and
    * [[incrementalLshPairsIndexed]] (one copy, so the spec-pinned
    * equivalence between the two cannot drift).
    */
  /** X162 — MinHash ESTIMATOR fidelity audit: for every LSH candidate
    * pair, the signature-agreement estimate (matching lanes / numSigs
    * — the Broder 1997 estimator) priced against the EXACT shingle
    * Jaccard, folded by agreement level. The x43 recall-audit genre
    * applied to the dedup sketch itself: before trusting a 16-lane
    * signature at 100 TB, measure what |est − true| actually is on
    * YOUR corpus (the binomial error of k lanes is theory; shingle
    * skew and short docs move it). Read beside x32's group-sketch
    * overlap: same estimator, audited here at pair grain against
    * ground truth.
    *
    * Candidates that share a band but zero shingles (an md5 band-key
    * collision — astronomically rare) drop out with the verify join;
    * the audit covers candidates sharing >= 1 shingle.
    *
    * ARITHMETIC: est_micro = ⌊1e6·lanes/numSigs⌋ exact; true jac is
    * the engine's round-6 double, micro'd via round(jac·1e6) (a
    * near-integer double — deterministic in both engines); the error
    * lanes are integer |est − true| folded per agreement level, so
    * ≤ numSigs+1 rows come out.
    *
    * SHAPE AT 100 TB: the signature table is the persisted LSH index
    * (localCheckpoint-pinned here, shared by the candidate and
    * agreement joins); everything after the band self-join is
    * candidate-density-sized.
    *
    * Output: (n_agree, est_jac_micro, n_pairs, avg_jac_micro,
    * avg_abs_err_micro, max_abs_err_micro), one row per observed
    * agreement level.
    */
  def minhashFidelity(docs: DataFrame, idCol: String, textCol: String,
                      numSigs: Int, rowsPerBand: Int,
                      prebuiltSigs: Option[DataFrame] = None): DataFrame = {
    // callers holding the session's persisted signature index pass it
    // in (x162 shares corpusSigs16); standalone callers build and pin
    val sigs = prebuiltSigs.getOrElse(
      docSignatures(docs, idCol, textCol, numSigs).localCheckpoint(false))
    val cands = lshCandidates(sigs, idCol, numSigs, rowsPerBand)
    val truth = verifyCandidates(docs.select(col(idCol), col(textCol)),
      cands, idCol, textCol, threshold = 0.0)
    val agree = (0 until numSigs)
      .map(i => when(col(s"a.sig$i") === col(s"b.sig$i"), 1L)
        .otherwise(0L)).reduce(_ + _)
    truth
      .join(sigs.as("a"), col("d1") === col(s"a.$idCol"))
      .join(sigs.as("b"), col("d2") === col(s"b.$idCol"))
      .select(agree.as("n_agree"),
        expr(s"CAST(CAST(round(jac * 1000000) AS BIGINT) AS BIGINT)")
          .as("jac_micro"))
      .withColumn("est_micro",
        expr(s"CAST(n_agree * 1000000 div $numSigs AS BIGINT)"))
      .withColumn("err", abs(col("est_micro") - col("jac_micro")))
      .groupBy(col("n_agree"))
      .agg(max(col("est_micro")).as("est_jac_micro"),
        count(lit(1)).as("n_pairs"),
        sum(col("jac_micro")).as("__j"),
        sum(col("err")).as("__e"),
        max(col("err")).as("max_abs_err_micro"))
      .select(col("n_agree"), col("est_jac_micro"), col("n_pairs"),
        expr("CAST(CAST(__j AS DECIMAL(38,0)) div n_pairs AS BIGINT)")
          .as("avg_jac_micro"),
        expr("CAST(CAST(__e AS DECIMAL(38,0)) div n_pairs AS BIGINT)")
          .as("avg_abs_err_micro"),
        col("max_abs_err_micro"))
  }

  private def verifyCandidates(members: DataFrame, cands: DataFrame,
                               idCol: String, textCol: String,
                               threshold: Double): DataFrame = {
    val sh = shingleTable(members, idCol, textCol)
    val n = shingleCounts(members, idCol, textCol)
    val inter = sh.as("sa")
      .join(cands, col("d1") === col(s"sa.$idCol"))
      .select(col("d1"), col("d2"), col("sa.s").as("s1"))
      .join(sh.as("sb"),
        col("d2") === col(s"sb.$idCol") && col("s1") === col("sb.s"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
    withJaccard(inter, n, idCol, threshold)
  }

  /** Positional k-token window fingerprints: one (doc_id, p, h) row per
    * start position p (0-based), h = md5 of the window's space-joined
    * tokens. The positional sibling of [[shingleTable]] (which
    * deliberately discards positions and duplicates for set semantics) —
    * substring-run detection needs BOTH kept. Scan-side: a posexplode
    * projection, zero shuffle.
    */
  def windowTable(docs: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame =
    docs.select(col(idCol),
        posexplode(shingles(tokens(col(textCol)), k)).as(Seq("p", "w")))
      .select(col(idCol), col("p"), md5(col("w")).as("h"))

  /** X41 — sequence-level exact substring dedup: maximal shared token
    * runs across document pairs, the "Deduplicating Training Data"
    * (Lee et al. 2022, arXiv:2107.06499) problem re-expressed
    * relationally. Their suffix array is a single-machine index; the
    * same spans fall out of a window-fingerprint join that Spark can
    * shard: two documents share an L-token span iff they share all
    * L-k+1 of its k-token windows at consecutive positions, so matched
    * window positions lie on a diagonal (pa - pb constant) and maximal
    * runs are the gaps-and-islands of each diagonal.
    *
    * Stages: [[windowTable]] (scan-side) → self-join on the window hash
    * (the ONE corpus-sized shuffle) → per-(pair, diagonal) islands via
    * `pa - row_number()` → one aggregate per island. The island window
    * function and the island aggregate both cluster on (d1, d2, diag),
    * so the aggregate reuses the window's exchange — run detection adds
    * no shuffle of its own (PlanShapeSpec-pinned).
    *
    * Output: (d1, d2, a_start, b_start, span_len) per maximal shared
    * run of span_len >= minSpan tokens; a whole-document duplicate
    * yields exactly one run covering the document (agrees with
    * [[exactDedup]] — spec-pinned), and a paragraph shared twice yields
    * one run per alignment (two diagonals).
    *
    * `maxWindowFreq` is the boilerplate-storm guard, same contract as
    * [[lshCandidates]]' maxBucket: a k-gram occurring B times corpus-wide
    * contributes O(B^2) matched pairs, so ubiquitous template windows
    * (the X34 common-ngram population) are dropped whole before the
    * join. The threshold counts OCCURRENCES, not distinct documents —
    * cheaper (map-side combine, no per-(h, doc) dedup shuffle) and
    * strictly safer as a storm guard (a window repeated within one
    * document is the same join blow-up). The hot-hash list is tiny by
    * construction, so it broadcasts into anti-joins on both sides. Runs
    * the dropped windows anchor are boilerplate by definition; genuinely
    * rare shared spans keep their other windows. At 100 TB this cap is
    * what bounds the join.
    */
  def substringRuns(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 6, minSpan: Int = 8,
                    maxWindowFreq: Option[Int] = None): DataFrame =
    substringRunsFrom(windowTable(docs, idCol, textCol, k), idCol, k,
      minSpan, maxWindowFreq)

  /** [[substringRuns]] over a PREPARED (id, p, h) window table — the
    * entry point for callers that share one [[windowTable]] pass (and
    * often a persisted one) across the whole substring family: the
    * window table is the only corpus-sized intermediate the family has,
    * so a session running x41 + x47 + x48 + x45 together computes the
    * scan + posexplode + md5 projection ONCE instead of four times.
    */
  def substringRunsFrom(wt: DataFrame, idCol: String, k: Int,
                        minSpan: Int,
                        maxWindowFreq: Option[Int] = None): DataFrame = {
    require(k >= 1, s"window size must be >= 1: $k")
    require(minSpan >= k, s"minSpan $minSpan below window size $k — every " +
      "single matched window would qualify; raise minSpan or shrink k")
    runsFromWindows(applyWindowCap(wt, maxWindowFreq), idCol, k, minSpan)
  }

  /** The corpus-wide `maxWindowFreq` hot-window cap over a prepared
    * window table — the shared front of [[substringRunsFrom]] and
    * [[substringRunsPrunedFrom]], so both operators (and the winnowing
    * fingerprint index the latter builds) see the SAME capped window
    * population and capped pruned output stays row-identical to the
    * exhaustive capped operator. When the caller hands a persisted
    * window table, the guard aggregation reads the pin instead of
    * recomputing the scan.
    */
  private def applyWindowCap(w: DataFrame,
                             maxWindowFreq: Option[Int]): DataFrame =
    maxWindowFreq match {
      case Some(cap) =>
        val hot = w.groupBy(col("h"))
          .agg(count(lit(1)).as("occ")).filter(col("occ") > cap)
          .select(col("h"))
        w.join(broadcast(hot), Seq("h"), "left_anti")
      case None => w
    }

  /** Matched positions → diagonal islands → maximal runs, over an
    * already-capped window table (the back half of [[substringRuns]]).
    */
  private def runsFromWindows(capped: DataFrame, idCol: String, k: Int,
                              minSpan: Int): DataFrame = {
    val m = capped.as("a").join(capped.as("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"),
        col("a.p").as("pa"), col("b.p").as("pb"))
    val byDiag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d1"), col("d2"), col("diag")).orderBy(col("pa"))
    m.withColumn("diag", col("pa") - col("pb"))
      .withColumn("island", col("pa") - row_number().over(byDiag))
      .groupBy(col("d1"), col("d2"), col("diag"), col("island"))
      .agg(min(col("pa")).as("a_start"), min(col("pb")).as("b_start"),
        (count(lit(1)) + lit(k - 1).cast("long")).as("span_len"))
      .filter(col("span_len") >= minSpan)
      .select(col("d1"), col("d2"), col("a_start"), col("b_start"),
        col("span_len"))
  }

  /** X47 — WINNOWING fingerprint selection (Schleimer, Wilkerson &
    * Aiken 2003 — the MOSS algorithm): slide a width-`w` window over
    * each document's positional k-gram hashes ([[windowTable]]) and
    * keep each window's minimum hash, ties to the RIGHTMOST position.
    * The selected (id, p, h) rows are the document's fingerprint
    * sketch: expected density 2/(w+1) of the full window table, with
    * the winnowing GUARANTEE that any shared token run of length >=
    * w + k - 1 still shares at least one selected fingerprint
    * (spec-pinned). This is the index-size dial for the substring-dedup
    * family: a [[substringRuns]]-style probe or the
    * [[graft.streaming.SubstringStream]] index can store only
    * fingerprints and still catch every long-enough span.
    *
    * The rightmost-tie argmin is expressed as a plain `min` over an
    * ENCODED string — h (fixed-width hex) concatenated with the
    * zero-padded DESCENDING position (10^9 - p) — so lexicographic min
    * = (smallest hash, then largest position), identical in any engine;
    * no struct-typed window aggregate needed. One exchange on the doc
    * id serves both window passes; partial trailing windows (which the
    * published algorithm does not emit) are dropped via the per-doc max
    * position.
    */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 6, w: Int = 4): DataFrame =
    winnowFrom(windowTable(docs, idCol, textCol, k), idCol, w)

  /** [[winnow]] over a prepared (id, p, h) window table — the shared-
    * window-table entry point (see [[substringRunsFrom]]).
    */
  def winnowFrom(wt: DataFrame, idCol: String, w: Int): DataFrame =
    winnowFromWindows(wt, idCol, w)

  /** Winnowing over a prepared (id, p, h) window table — split out so
    * [[substringRunsPruned]] can fingerprint the CAPPED window table.
    * With hot windows removed, w consecutive SURVIVING windows are w
    * consecutive rows of the per-doc frame, so the selection guarantee
    * transfers: any capped run of >= w surviving windows still shares a
    * selected fingerprint (the frame anchored at the run's first row
    * covers exactly its first w windows, and its min lies in the run).
    */
  private def winnowFromWindows(wt: DataFrame, idCol: String,
                                w: Int): DataFrame = {
    require(w >= 1, s"winnow width must be >= 1: $w")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col(idCol))
    val frame = Window.partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(Window.currentRow, w - 1)
    wt.withColumn("enc", concat(col("h"), lit("|"),
        lpad((lit(1000000000L) - col("p")).cast("string"), 10, "0")))
      .withColumn("mw", min(col("enc")).over(frame))
      .withColumn("maxp", max(col("p")).over(byDoc))
      .filter(col("p") <= col("maxp") - (w - 1))
      .select(col(idCol), col("mw")).distinct()
      .select(col(idCol),
        (lit(1000000000L) - expr("cast(substring(mw, 34, 10) as bigint)"))
          .cast("int").as("p"),
        expr("substring(mw, 1, 32)").as("h"))
  }

  /** X48 — TWO-TIER substring dedup, the 100 TB form the winnowing
    * guarantee buys: candidate doc pairs come from a self-join of the
    * 2/(w+1)-density [[winnow]] fingerprints (the only corpus-sized
    * shuffle touches the SKETCH, not the window table), then full
    * window verification runs restricted to candidate members only
    * (semi-join pruned, the [[incrementalLshPairsIndexed]] discipline).
    *
    * EXACTNESS, not approximation: the winnowing guarantee says any
    * shared run of >= w + k - 1 tokens shares a selected fingerprint,
    * so with `minSpan >= w + k - 1` (enforced loudly) every qualifying
    * pair is a candidate and the output EQUALS [[substringRuns]] row
    * for row — the driver's DuckDB gate checks this operator against
    * the exhaustive oracle, and the spec pins the equality directly.
    */
  def substringRunsPruned(docs: DataFrame, idCol: String, textCol: String,
                          k: Int = 6, minSpan: Int = 9, w: Int = 4,
                          maxWindowFreq: Option[Int] = None): DataFrame =
    substringRunsPrunedFrom(windowTable(docs, idCol, textCol, k), idCol,
      k, minSpan, w, maxWindowFreq)

  /** [[substringRunsPruned]] over a prepared (id, p, h) window table —
    * the shared-window-table entry point (see [[substringRunsFrom]]).
    */
  def substringRunsPrunedFrom(rawWt: DataFrame, idCol: String, k: Int,
                              minSpan: Int, w: Int,
                              maxWindowFreq: Option[Int] = None): DataFrame = {
    require(minSpan >= w + k - 1,
      s"minSpan $minSpan below the winnowing guarantee w + k - 1 = " +
        s"${w + k - 1} — a shorter shared span can miss the fingerprint " +
        "index; raise minSpan or shrink w")
    // the hot-window cap applies CORPUS-WIDE and BEFORE winnowing: the
    // fingerprint self-join below never sees a boilerplate-storm hash
    // (a hot window's fingerprint selected in B docs would be an O(B^2)
    // candidate blow-up — the very storm the cap exists for), and the
    // capped output stays row-identical to substringRuns(docs, cap)
    // because both stages read the same capped window population
    val wt = applyWindowCap(rawWt, maxWindowFreq)
    val fp = winnowFromWindows(wt, idCol, w)
    // candidate MEMBERS are what matters: any two members sharing a
    // qualifying span are fingerprint-collided by the guarantee, so
    // verifying all member pairs loses nothing and skips a pair filter
    val memberIds = fp.as("a").join(fp.as("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol")).distinct()
    runsFromWindows(wt.join(memberIds, Seq(idCol), "left_semi"),
      idCol, k, minSpan)
  }

  /** X45 — substring-run REMOVAL, the actionable half of
    * [[substringRuns]] and the practice the suffix-array paper
    * prescribes: for every shared run, the LESS-canonical document
    * (higher id, the runs' d2 side) drops the duplicated tokens; the
    * canonical copy survives verbatim. Overlapping spans from different
    * partners union per document. Output: one row per input document —
    * (id, clean_text, n_removed), untouched documents pass through
    * bit-identical (they are never re-tokenized, so odd whitespace
    * survives; only affected documents rebuild).
    *
    * Shape at 100 TB: [[substringRuns]] dominates; removal itself is
    * interval-explode (bounded by removed-token mass, a sliver of the
    * corpus), a semi-join prune of the corpus to affected documents
    * (the [[incrementalLshPairsIndexed]] member-prune discipline), one
    * posexplode + anti-ish marker join over affected docs only, and a
    * per-doc ordered rebuild. Unaffected documents cost one semi-join
    * probe and are never exploded.
    */
  def removeRuns(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 6, minSpan: Int = 8,
                 maxWindowFreq: Option[Int] = None): DataFrame =
    removeRunsFrom(docs, windowTable(docs, idCol, textCol, k), idCol,
      textCol, k, minSpan, maxWindowFreq)

  /** [[removeRuns]] with the run detection reading a prepared (id, p, h)
    * window table (see [[substringRunsFrom]]); `docs` is still needed
    * for the rebuild side. The caller is responsible for `wt` being the
    * window table OF `docs` at this `k` — a mismatched pair silently
    * removes the wrong spans.
    */
  def removeRunsFrom(docs: DataFrame, wt: DataFrame, idCol: String,
                     textCol: String, k: Int, minSpan: Int,
                     maxWindowFreq: Option[Int] = None): DataFrame = {
    val runs = substringRunsFrom(wt, idCol, k, minSpan, maxWindowFreq)
    val removed = runs.select(col("d2").as(idCol),
        explode(sequence(col("b_start").cast("long"),
          col("b_start").cast("long") + col("span_len") - 1)).as("p"))
      .distinct() // overlapping spans from different partners union
    removeAtPositions(docs, idCol, textCol, removed)
  }

  /** Shared rebuild tail of the span-removal family ([[removeRuns]],
    * [[decontaminate]]): drop the (idCol, p) token positions in
    * `removed` (0-based, distinct) from their documents. Affected docs
    * are semi-join pruned before the posexplode; untouched docs pass
    * through bit-identical (never re-tokenized).
    */
  private def removeAtPositions(docs: DataFrame, idCol: String,
                                textCol: String,
                                removed: DataFrame): DataFrame = {
    val affected = docs.select(col(idCol), col(textCol))
      .join(removed.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
    val rebuilt = affected
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("p", "w")))
      .join(removed.withColumn("rm", lit(true)),
        Seq(idCol, "p"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(IF(rm IS NULL, struct(p, w), NULL))), x -> x.w)"))
          .as("clean_text"),
        sum(when(col("rm"), 1L).otherwise(0L)).as("n_removed"))
    docs.select(col(idCol), col(textCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), col(textCol)).as("clean_text"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** X60 — eval-set decontamination with SPAN REMOVAL: the composition
    * of the X13 benchmark-overlap detector and the X45 interval-union
    * excision, the operator a training pipeline actually runs before
    * shipping data ("decontaminate this corpus against this eval
    * suite"). X13 only FLAGS contaminated docs; this removes exactly
    * the contaminated token spans: every corpus position covered by an
    * n-token shingle that occurs anywhere in the eval set is dropped,
    * covering intervals from overlapping matches unioned per document
    * (a >= n-token verbatim eval quote is excised whole, because each
    * of its length-n windows matches). Docs with no match pass through
    * bit-identical; a fully-contaminated doc comes back empty with its
    * token count in `n_removed` — the caller decides whether to keep
    * the husk.
    *
    * Callers exclude the eval docs themselves from `docs` (an eval doc
    * is 100% self-contaminated by construction).
    *
    * Shape at 100 TB: the eval side is a benchmark suite — tiny by
    * construction — so its distinct shingle set BROADCASTS into the
    * corpus scan (the X13 shape); corpus positional shingles are
    * row-local (native [[shingles]] + posexplode, no corpus shuffle),
    * matched positions are a sliver bounded by contaminated-token mass,
    * and the rebuild is the X45 semi-join-pruned tail: unaffected
    * documents cost one semi-join probe and are never exploded.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame =
    decontaminateAgainst(docs,
      evalShingleSet(evalDocs, textCol, n), idCol, textCol, n)

  /** The distinct n-token shingle set of an eval suite as a 1-column
    * (`s`) frame — the broadcastable artifact [[decontaminateAgainst]]
    * excises by, split out so the streaming twin
    * ([[graft.streaming.DecontaminateStream]]) can accumulate it
    * incrementally across batches.
    */
  def evalShingleSet(evalDocs: DataFrame, textCol: String,
                     n: Int): DataFrame =
    evalDocs
      .select(explode(array_distinct(shingles(tokens(col(textCol)), n))).as("s"))
      .distinct()

  /** The excision half of [[decontaminate]], against a PREPARED distinct
    * shingle set (column `s`, [[evalShingleSet]]'s layout).
    */
  def decontaminateAgainst(docs: DataFrame, evalSh: DataFrame,
                           idCol: String, textCol: String,
                           n: Int): DataFrame = {
    val pos = docs.select(col(idCol),
      posexplode(shingles(tokens(col(textCol)), n)).as(Seq("sp", "s")))
    val removed = pos.join(broadcast(evalSh), Seq("s"))
      .select(col(idCol),
        explode(sequence(col("sp").cast("long"),
          col("sp").cast("long") + (n - 1))).as("p"))
      .distinct() // overlapping eval matches union per document
    removeAtPositions(docs, idCol, textCol, removed)
  }

  /** `bits`-wide SimHash, one lane arithmetic for both widths: bit j
    * votes with the sign of the +1/-1 sum of bit (j%4) of md5 hex char
    * j/4 across the doc's shingles — `bits` conditional sums in ONE
    * aggregation (single shuffle of `bits` ints per doc). At the full
    * width, bit 63 assembles as Long.MinValue — the two's-complement
    * top bit — so the signature is a plain BIGINT whose XOR/popcount
    * semantics are identical in any engine; the positive weights sum
    * first (max 2^63-1, no overflow) and the sign bit lands last.
    */
  private def simhashBits(sh: DataFrame, idCol: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhash width $bits out of [1, 64]")
    val withHex = sh.withColumn("h", md5(col("s")))
    def bit(j: Int): Column =
      (shiftright(conv(substring(col("h"), j / 4 + 1, 1), 16, 10).cast("int"), j % 4) % 2)
        .cast("int")
    val votes = (0 until bits).map(j => sum(bit(j) * 2 - 1).as(s"v$j"))
    def weight(j: Int): Column = {
      val w = if (j == 63) Long.MinValue else 1L << j
      when(col(s"v$j") >= 0, lit(w)).otherwise(lit(0L))
    }
    withHex.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until bits).map(weight).reduce(_ + _).as("simhash"))
  }

  /** 16-bit SimHash (the x1 signature column) — [[simhashBits]] at 16. */
  def simhash16(sh: DataFrame, idCol: String): DataFrame =
    simhashBits(sh, idCol, 16)

  /** X79 — 64-bit SimHash (the production width: at 16 bits random
    * unrelated docs land within Hamming distance 3 about 1% of the
    * time — measured on this corpus — while at 64 bits the same event
    * is ~2e-15, so distance actually means near-duplication; Manku,
    * Jain & Sarma 2007 use 64 for all of the web). [[simhashBits]] at
    * the full width — the same lane family as [[simhash16]], whose
    * signature IS this one's low 16 bits (spec-pinned).
    */
  def simhash64(sh: DataFrame, idCol: String): DataFrame =
    simhashBits(sh, idCol, 64)

  /** X79 — all pairs within Hamming distance `maxDist` of each other's
    * 64-bit signature, by the PIGEONHOLE multi-index (Manku, Jain &
    * Sarma 2007, the Google web-dedup recipe): split the 64 bits into
    * maxDist+1 bands — two signatures within distance d have at most d
    * differing bands, so they agree EXACTLY on at least one band — then
    * equi-join per (band, key) and popcount-verify the sliver of
    * candidates. The prune is lossless by the pigeonhole argument; the
    * oracle runs the naive all-pairs popcount, re-proving it per run
    * (x48 discipline).
    *
    * Shape at 100 TB: the corpus never joins on itself — SIGNATURES do
    * (one BIGINT per doc). The banded self-join is the x1 LSH-bucket
    * shape: one hash exchange of (band, key, sig), candidates bounded
    * by band-bucket sizes (band width 64/(maxDist+1) bits is the knob
    * that scales buckets with corpus cardinality — the LshBits
    * discipline), verification is one row-local XOR+popcount, and the
    * cross-band duplicate collapse shuffles survivors only.
    *
    * Returns (d1, d2, dist), d1 < d2. `maxDist+1` must divide 64.
    */
  def hammingPairs(sig: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val banded = hammingBands(sig, idCol, maxDist)
    hammingPairsBetween(banded, banded, idCol, maxDist)
  }

  /** The banded signature index of [[hammingPairs]] — (idCol, simhash,
    * band, key) — split out so the streaming twin
    * ([[graft.streaming.SimhashStream]]) can persist it as its
    * accumulated state and probe new batches against it.
    */
  def hammingBands(sig: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val bands = maxDist + 1
    require(maxDist >= 0 && 64 % bands == 0,
      s"maxDist $maxDist: maxDist+1 must divide 64 (0, 1, 3, 7, 15, 31, 63)")
    val w = 64 / bands
    val mask = if (w == 64) -1L else (1L << w) - 1
    sig.select(col(idCol), col("simhash"),
      posexplode(array((0 until bands).map(b =>
        expr(s"shiftright(simhash, ${b * w}) & $mask")): _*))
        .as(Seq("band", "key")))
  }

  /** The join+verify half over PREPARED band frames ([[hammingBands]]'s
    * layout): equi-join probe×index per (band, key), popcount-verify,
    * normalize pair order to (least, greatest), collapse cross-band
    * duplicates. `hammingPairs` is the self-probe special case; the
    * streaming twin probes each delta against the accumulated index so
    * every pair emits exactly once — in the batch its LATER member
    * arrives.
    */
  def hammingPairsBetween(probe: DataFrame, index: DataFrame,
                          idCol: String, maxDist: Int): DataFrame = {
    val p = probe.select(col(idCol).as("pid"), col("simhash").as("psig"),
      col("band"), col("key"))
    val ix = index.select(col(idCol).as("iid"), col("simhash").as("isig"),
      col("band"), col("key"))
    p.join(ix, Seq("band", "key"))
      .filter(col("pid") =!= col("iid"))
      .select(least(col("pid"), col("iid")).as("d1"),
        greatest(col("pid"), col("iid")).as("d2"),
        expr("bit_count(psig ^ isig)").cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** X82 — dedup-TIER audit (the x43 recall-audit idea turned on the
    * dedup family): precision and recall of each approximate pair
    * source against exact ground-truth pairs, as exact integer ppm.
    * This is the number a pipeline owner actually tunes by — "what does
    * switching MinHash-LSH to SimHash-d3 cost in recall, and what junk
    * does it admit" — measured, not asserted.
    *
    * `methods` maps tier name → (d1, d2) pair frame; `truth` is the
    * exact pair list. All frames are pair-lists (near-dup slivers), so
    * every join/aggregate here is audit-sized — the corpus-scale cost
    * lives in the tiers themselves. An empty truth makes recall
    * undefined and fails loudly (the recallAudit contract); an empty
    * TIER is a legitimate measurement (precision reported 0).
    */
  def pairAudit(methods: Seq[(String, DataFrame)],
                truth: DataFrame): DataFrame = {
    require(methods.nonEmpty, "need at least one method to audit")
    require(methods.map(_._1).distinct.size == methods.size,
      "method names must be distinct")
    // pin BEFORE the emptiness probe: truth is the corpus-scale exact
    // pipeline — probing the un-pinned frame would run it once for the
    // probe and again for the audit
    val t = truth.select(col("d1"), col("d2")).localCheckpoint(false)
    require(!t.isEmpty,
      "pairAudit: exact pair list is empty — nothing to measure against")
    // one pass per tier: a left join with a match flag yields n_pairs
    // (all rows) and n_hits (matched rows) from a single execution of
    // the corpus-scale tier pipeline — two separate aggregates would run
    // the MinHash/Hamming join twice. The truth side is distinct pairs
    // (pinned above), so the left join cannot fan a tier row out.
    val tFlag = broadcast(t.distinct().withColumn("hit", lit(1)))
    val rows = methods.map { case (name, m) =>
      m.select(col("d1"), col("d2"))
        .join(tFlag, Seq("d1", "d2"), "left")
        .agg(count(lit(1)).as("n_pairs"), count(col("hit")).as("n_hits"))
        .select(lit(name).as("method"), col("n_pairs"), col("n_hits"))
    }.reduce(_ unionByName _)
    rows.crossJoin(broadcast(t.agg(count(lit(1)).as("n_truth"))))
      .select(col("method"), col("n_pairs"), col("n_hits"), col("n_truth"),
        expr("CASE WHEN n_pairs > 0 THEN n_hits * 1000000L div n_pairs " +
          "ELSE 0L END").as("precision_ppm"),
        expr("n_hits * 1000000L div n_truth").as("recall_ppm"))
  }

  /** Embedding near-dup: pairs with quantized-cosine >= threshold.
    * Quantization (floor(x*1000)) keeps the arithmetic exact-integer so
    * results are order- and engine-independent.
    *
    * All-pairs scoring is a compute kernel, not a relational op: a
    * broadcast-nested-loop join materializes O(N^2) joined rows (copying
    * both vectors into each) just so a projection can immediately reduce
    * them to one double. Instead the quantized block is broadcast once
    * (N x dim ints — the same memory contract as a broadcast hash join)
    * and each partition scores its rows against the block in a primitive
    * loop, emitting only near-threshold survivors. The final round/filter
    * happens in Spark expressions so scores stay bit-identical to the
    * declarative form. Scale path: this IS the per-block kernel — at
    * 100 TB feed it LSH/sign buckets ([[Similarity.signBucket]]) instead
    * of the whole corpus.
    *
    * The quantized projection is materialized ONCE (`localCheckpoint`) and
    * both consumers — the driver-collected block and the executor-side
    * mapPartitions scan — read that same materialization, so the
    * null-id/duplicate-id/cap guards validated on the block hold for
    * exactly the rows the kernel scores (two independent executions of a
    * nondeterministic input could diverge between validation and scan).
    *
    * @param maxBlockRows hard cap on the collected block: this function
    *   IS the per-block kernel, and the driver holding more than ~a
    *   million quantized vectors means the caller forgot to bucket.
    *   Failing loudly here beats an opaque driver OOM three stages later.
    */
  def embeddingDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, maxBlockRows: Int = 1 << 20): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // cap check FIRST, on a limit-bounded count of the bare id column —
    // a cheap scan that fails loudly BEFORE any heavy work. Checking
    // after the eager checkpoint below would quantize and cache the
    // entire over-cap corpus just to throw, defeating the guard. (Row
    // cardinality is stable across executions, unlike row values, so the
    // separate counting pass cannot disagree with the materialization.)
    require(emb.select(col(idCol)).limit(maxBlockRows + 1).count() <= maxBlockRows,
      s"embeddingDupPairs block exceeds $maxBlockRows rows — partition the corpus " +
        "(e.g. by Similarity.signBucket) and run this kernel per bucket")
    // one materialized projection feeds the collect AND the kernel scan
    // (block-sized by contract, so checkpointing it is cheap); truncates
    // lineage too, so the kernel re-reads materialized rows, not the scan
    val proj = emb.select(col(idCol).cast("long").as("id"),
        Similarity.quantize(col(vecCol)).as("qv"))
      .localCheckpoint()
    val q = proj.as[(Long, Array[Int])]
    // null ids (uncastable idCol values) fail with a message instead of
    // an encoder NPE mid-kernel
    val raw = proj.collect()
    val block = raw.map { r =>
      require(!r.isNullAt(0), s"embeddingDupPairs: '$idCol' has values not castable to long")
      (r.getLong(0), r.getSeq[Int](1).toArray)
    }.sortBy(_._1)
    for (i <- 1 until block.length)
      require(block(i)._1 != block(i - 1)._1,
        s"embeddingDupPairs: duplicate $idCol=${block(i)._1} — ids must be unique")
    val bc = spark.sparkContext.broadcast(block)
    // slack covers round(sim, 6): emit a slight superset, filter exactly below
    val slack = threshold - 1e-6
    val cands = q.mapPartitions { it =>
      val cs = bc.value
      val ids = cs.map(_._1)
      val norms = cs.map(c => dotLocal(c._2, c._2))
      it.flatMap { case (id, v) =>
        val n2a = dotLocal(v, v)
        val sqrtA = math.sqrt(n2a.toDouble)
        // block is id-sorted: score only partners with larger id (d1 < d2)
        var lo = java.util.Arrays.binarySearch(ids, id) match {
          case i if i >= 0 => i + 1
          case i           => -i - 1
        }
        val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
        while (lo < cs.length) {
          val d = dotLocal(v, cs(lo)._2)
          if (d.toDouble / (sqrtA * math.sqrt(norms(lo).toDouble)) >= slack)
            out += ((id, ids(lo), d, n2a, norms(lo)))
          lo += 1
        }
        out.result()
      }
    }.toDF("d1", "d2", "dot", "n2a", "n2b")
    cands.select(col("d1"), col("d2"),
        round(Similarity.cosine(col("dot"), col("n2a"), col("n2b")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  private def dotLocal(a: Array[Int], b: Array[Int]): Long = {
    var i = 0; var s = 0L
    while (i < a.length) { s += a(i).toLong * b(i); i += 1 }
    s
  }

  /** Embedding near-dup, 100 TB form: bucket each vector by its sign
    * pattern ([[Similarity.signBucket]], computable at scan/ingest time)
    * and score pairs ONLY within buckets via a bucket-equality self-join —
    * fully distributed, nothing ever collected to the driver, shuffle
    * keyed on the bucket id. The quadratic work is confined to individual
    * buckets exactly like the LSH band join confines shingle pairs.
    *
    * Recall contract (same as [[Similarity.lshTopK]]): a pair whose
    * members land in different sign buckets is missed — near-identical
    * vectors agree on nearly every coordinate's sign, so high-threshold
    * duplicates co-bucket with high probability; multi-probe or
    * fewer bits raise recall at more per-bucket cost. [[embeddingDupPairs]]
    * is the exact all-pairs twin for one bucket/block; this operator is
    * what replaces it when the corpus no longer fits a block.
    */
  def embeddingDupPairsBucketed(emb: DataFrame, idCol: String, vecCol: String,
                                threshold: Double, bits: Int = 16): DataFrame = {
    val q = emb.select(col(idCol).cast("long").as("id"),
        Similarity.quantize(col(vecCol)).as("qv"),
        Similarity.signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", Similarity.sqNorm(col("qv")))
    q.as("a").join(q.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        round(Similarity.cosine(
          Similarity.dot(col("a.qv"), col("b.qv")),
          col("a.n2"), col("b.n2")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** X95 — EDIT-DISTANCE verification of a candidate pair list: the
    * character-grain exact tier that sits behind a sketch prune
    * (MinHash bands, SimHash Hamming bands) the way [[verifyCandidates]]
    * sits behind LSH for set-Jaccard. Shingle Jaccard is blind to
    * word-ORDER edits and to sub-token typos; Levenshtein distance is
    * the standard (Navarro 2001, "A guided tour to approximate string
    * matching") exact measure for both, and both Spark and any ANSI-ish
    * engine ship it natively (`levenshtein`), codegen'd and row-local.
    *
    * Emits every candidate with its distance and a length-normalized
    * similarity — `(max_len - dist) * 1e6 / max_len`, exact-integer so
    * engines can't drift — plus the `confirmed` verdict at
    * `simThresholdPpm`. Candidates are emitted rather than filtered:
    * the rejected rows ARE the sketch tier's false positives, which is
    * what a dedup audit (x82 discipline) wants to see.
    *
    * 100 TB shape: the O(len^2) DP kernel runs once per CANDIDATE (a
    * corpus sliver by the sketch tier's contract), never per corpus
    * pair; texts reach it through two hash joins of the candidate list
    * against the corpus — pair-list-sized shuffles on id, with AQE free
    * to broadcast the candidate side when it is small. Nothing is
    * collected; nothing is quadratic in the corpus.
    */
  def editVerify(docs: DataFrame, cands: DataFrame, idCol: String,
                 textCol: String, simThresholdPpm: Long): DataFrame = {
    require(simThresholdPpm >= 0 && simThresholdPpm <= 1000000,
      s"simThresholdPpm $simThresholdPpm must be in [0, 1000000]")
    val t = docs.select(col(idCol), col(textCol))
    // The candidate list is BYTE-tiny (a corpus sliver) but each row
    // pays an O(len²) DP — AQE's byte-based coalescing packed the whole
    // verify stage into ONE partition and ran the Levenshtein kernel
    // single-threaded (round-21 measurement: 1.3 s for ~1.2 k pairs on
    // an idle 32-core host). Spread the pairs across the cluster's
    // cores before the (broadcast) text joins: defaultParallelism is
    // scale-adaptive (total executor cores), the shuffled rows are two
    // BIGINTs each, and downstream cost is per-PAIR, not per-byte.
    cands.select(col("d1"), col("d2"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .join(t.select(col(idCol).as("d1"), col(textCol).as("t1")), Seq("d1"))
      .join(t.select(col(idCol).as("d2"), col(textCol).as("t2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        levenshtein(col("t1"), col("t2")).cast("long").as("dist"),
        greatest(length(col("t1")), length(col("t2"))).cast("long")
          .as("max_len"))
      // two empty strings: distance 0 over length 0 is a perfect match,
      // not a division (ANSI mode would abort on the naive div)
      .withColumn("sim_ppm", expr(
        "CASE WHEN max_len = 0 THEN 1000000L " +
          "ELSE (max_len - dist) * 1000000L div max_len END"))
      .withColumn("confirmed", col("sim_ppm") >= simThresholdPpm)
  }

  /** X114 — Broder CONTAINMENT C(A,B) = |A∩B| / |A|: the directional
    * near-dup the resemblance tiers structurally miss — a small
    * template inside a big document has high containment but low
    * Jaccard, so band-LSH on whole-doc signatures never pairs them.
    * This is the boilerplate/template detector (shared nav bars,
    * license headers, form letters).
    *
    * The numerator counts DISCRIMINATIVE shared shingles only
    * (document frequency ≤ maxDf): the stop-shingle cap is both the
    * scale knob — ubiquitous shingles would join quadratically — and
    * standard practice (a shingle in half the corpus identifies no
    * template). Containment ppm is therefore a LOWER bound on the
    * uncapped value; denominators stay the full per-doc shingle
    * counts. All lanes exact integers; pairs surface only past a
    * min-shared floor.
    *
    * 100 TB shape: the join is shingle-keyed with per-key fan-out
    * capped at maxDf (≤ maxDf² pairs per shingle type); everything
    * after is pair-list-sized.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 6, maxDf: Int = 32, minShared: Int = 3,
                       thresholdPpm: Long = 500000L): DataFrame = {
    require(maxDf >= 2, s"maxDf $maxDf must be >= 2")
    require(minShared >= 1, s"minShared $minShared must be >= 1")
    val sh = shingleTable(docs, idCol, textCol, n)
    val sizes = shingleCounts(docs, idCol, textCol, n)
    val rare = sh.join(
      sh.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("s"), Seq("s"))
    val inter = rare.as("a").join(rare.as("b"),
        col("a.s") === col("b.s") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("i"))
      .filter(col("i") >= minShared)
    inter
      .join(sizes.select(col(idCol).as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sizes.select(col(idCol).as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("cont1_ppm", expr("i * 1000000 div n1"))
      .withColumn("cont2_ppm", expr("i * 1000000 div n2"))
      .withColumn("template",
        greatest(col("cont1_ppm"), col("cont2_ppm")) >= thresholdPpm)
      .select("d1", "d2", "i", "n1", "n2", "cont1_ppm", "cont2_ppm",
        "template")
  }

  /** X135 — soft deduplication weights (the SoftDeDup recipe, He et
    * al. 2024; also the D4/SlimPajama per-cluster downweighting): keep
    * EVERY document but weight each near-dup cluster member by
    * 1/cluster-size, so a passage duplicated 40× contributes the same
    * expected training mass as a unique one. The actionable
    * alternative to x9's keep-one canonical selection when duplicates
    * carry formatting/context diversity worth sampling across — the
    * sampler (x23/x31) consumes weight_ppm directly.
    *
    * SHAPE AT 100 TB: connected components over the (already bucketed)
    * near-dup pairs — cost scales with duplicate density (the x9
    * adjudicated iterative shape); cluster sizes are a component-grain
    * fold; the corpus-sized left join is key-partitioned with no
    * skew beyond the largest cluster. Singletons never enter the
    * pair table and default to weight 1.
    *
    * Output: (idCol, n_members, weight_ppm) DENSE over the corpus —
    * weight_ppm = 10⁶ div cluster size (exact integer div, identical
    * in any engine).
    */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame,
                       idCol: String): DataFrame = {
    val comps = Cluster.components(pairs)
      .select(col("id").as(idCol), col("component"))
    val sizes = comps.groupBy(col("component"))
      .agg(count(lit(1)).as("__n"))
    docs.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .join(sizes, Seq("component"), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(1L)).as("n_members"),
        expr("1000000 div coalesce(__n, CAST(1 AS BIGINT))")
          .as("weight_ppm"))
  }

  /** X139 — per-source near-dup participation: for each source, how
    * many of its documents sit in at least one verified near-dup pair
    * (either side), and that share in ppm — the data-card row that
    * answers "which source is self-copying?" and the targeting signal
    * for where x9/x135 deduplication actually bites. A document
    * participates iff it appears in ANY pair, so no component closure
    * is needed — the pair list's two id columns union directly. The
    * ppm product runs in DECIMAL(38,0) (the x125/x126 lane rule:
    * n_dup·10⁶ would pass BIGINT near 9·10¹² docs per source).
    *
    * SHAPE AT 100 TB: the pair table is duplicate-density-sized (never
    * corpus-scale); its distinct-id union is smaller still; one
    * key-partitioned left join onto the corpus and a source-grain
    * fold. Null sources are excluded (the x131 rule).
    *
    * Output: (src, n_docs, n_dup_docs, dup_ppm), one row per source.
    */
  /** X150 — the JOINT near-dup × quality-gate audit: one row per
    * (is_dup, passed) cell with document counts and corpus share. The
    * pipeline-ordering question the two single-axis audits cannot
    * answer: does the gate already remove the near-duplicates (dups
    * concentrated in passed=false → dedup after the gate is cheap), or
    * do duplicates sail through it (dups in passed=true → the dedup
    * stage is load-bearing and must not be skipped)? The x142 savings
    * number prices dedup; this is the number that says whether the
    * gate would have collected those savings anyway.
    *
    * SHAPE AT 100 TB: ONE scan-side gate projection over the corpus
    * (the x116/x144 gateSignals lane), a left join against the
    * duplicate-density-sized pair-member set, one 4-cell fold; the
    * share denominator rides a 1-row broadcast. Null-text documents
    * fail the gate closed (the x144 rule), identically in both
    * engines (Spark null-AND and DuckDB null-division both coalesce
    * to false).
    */
  def dupGateJoint(docs: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, qualityMin: Double,
                   dupMax: Double): DataFrame = {
    val members = pairs.select(col("d1").as(idCol))
      .union(pairs.select(col("d2").as(idCol))).distinct()
      .withColumn("__dup", lit(true))
    val gated = Curate.gateSignals(
        docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol),
        coalesce(Curate.gatePass(qualityMin, dupMax), lit(false))
          .as("passed"))
    val cells = gated.join(members, Seq(idCol), "left")
      .groupBy(coalesce(col("__dup"), lit(false)).as("is_dup"),
        col("passed"))
      .agg(count(lit(1)).as("n_docs"))
    val total = cells.agg(coalesce(sum(col("n_docs")), lit(0L)).as("__t"))
    cells.crossJoin(broadcast(total))
      .select(col("is_dup"), col("passed"), col("n_docs"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 div __t " +
          "AS BIGINT)").as("share_ppm"))
  }

  def sourceDupRate(docs: DataFrame, pairs: DataFrame, idCol: String,
                    srcCol: String): DataFrame = {
    val members = pairs.select(col("d1").as(idCol))
      .union(pairs.select(col("d2").as(idCol))).distinct()
      .withColumn("__dup", lit(1L))
    docs.select(col(idCol), col(srcCol).as("src"))
      .filter(col("src").isNotNull)
      .join(members, Seq(idCol), "left")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__dup")), lit(0L)).as("n_dup_docs"))
      .select(col("src"), col("n_docs"), col("n_dup_docs"),
        expr("CAST(CAST(n_dup_docs AS DECIMAL(38,0)) * 1000000 " +
          "div n_docs AS BIGINT)").as("dup_ppm"))
  }

  /** X140 — cross-source near-dup matrix: WHO copies WHOM. Each
    * verified near-dup pair is attributed to the unordered source pair
    * of its two members — the diagonal (src_a = src_b) is a source
    * self-copying, the off-diagonal is syndication/mirroring between
    * feeds. x139 says "this source participates in duplication"; the
    * matrix says against which other source, which is the difference
    * between dropping a feed and deduplicating a mirror pair. Pairs
    * with a null-source member are excluded (the x131 rule, applied by
    * the inner joins).
    *
    * SHAPE AT 100 TB: the pair table is duplicate-density-sized; two
    * key-partitioned joins attach member sources; the matrix fold is
    * at source-pair grain (≤ K², sources are dozens). Nothing
    * corpus-scale after the id→source join.
    *
    * Output: (src_a, src_b, n_pairs) with src_a <= src_b, one row per
    * observed source pair.
    */
  def crossSourceDupMatrix(docs: DataFrame, pairs: DataFrame,
                           idCol: String, srcCol: String): DataFrame = {
    val src = docs.filter(col(srcCol).isNotNull)
      .select(col(idCol), col(srcCol).as("__s"))
    pairs
      .join(src.select(col(idCol).as("d1"), col("__s").as("s1")),
        Seq("d1"))
      .join(src.select(col(idCol).as("d2"), col("__s").as("s2")),
        Seq("d2"))
      .groupBy(least(col("s1"), col("s2")).as("src_a"),
        greatest(col("s1"), col("s2")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** X141 — dup-cluster size histogram: how big are the near-dup
    * clusters. The shape of duplication decides the remedy — a corpus
    * whose mass sits in 2-doc clusters wants pair-level keep-one; one
    * 40,000-member template cluster wants the template removed at the
    * extractor. Connected components over the verified pairs, a
    * component-grain size fold, then a size-grain histogram; every
    * document NOT in any pair is a size-1 cluster (the singleton row
    * folds from the corpus count minus the member count — no second
    * corpus pass).
    *
    * Output: (cluster_size, n_clusters, n_docs, docs_ppm) — docs_ppm
    * the share of the corpus living at that cluster size, in a
    * DECIMAL(38,0) lane. Zero-cluster sizes are absent.
    */
  def dupClusterHistogram(docs: DataFrame,
                          pairs: DataFrame): DataFrame =
    histogramOf(Cluster.components(pairs)
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .select(col("cluster_size")), docs)

  /** X146 — EXACT-cluster size histogram: [[dupClusterHistogram]]'s
    * companion for the cheap tier — normalized-fingerprint group sizes
    * instead of near-dup components. Read beside x141 and the x145
    * overlap row, the three answer the tier question in full: how big
    * are the exact clusters, how big the fuzzy ones, and how much of
    * the second the first already covers. Null texts have no
    * fingerprint and fold into the singleton row.
    *
    * SHAPE AT 100 TB: ONE fingerprint-grain exchange (the x2 exact-
    * dedup shape) folded to size grain — no pair table, no closure.
    */
  def exactClusterHistogram(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    histogramOf(docs.filter(col(textCol).isNotNull)
      .select(md5(TextAnalysis.normalize(col(textCol))).as("__fp"))
      .groupBy(col("__fp")).agg(count(lit(1)).as("cluster_size"))
      .filter(col("cluster_size") > 1)
      .select(col("cluster_size")), docs)

  /** The shared size-grain histogram fold: `sizes` carries one
    * `cluster_size` row per multi-member cluster (every size >= 2 by
    * construction on both call paths); singletons derive from the
    * corpus count minus the member count — no second corpus pass.
    */
  private def histogramOf(sizes: DataFrame, docs: DataFrame): DataFrame = {
    val multi = sizes.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
    // ONE row each; the cross joins below are 1x1
    val total = docs.agg(count(lit(1)).as("__total"))
    val members = sizes.agg(
      coalesce(sum(col("cluster_size")), lit(0L)).as("__members"))
    val singleton = total.crossJoin(members)
      .select(lit(1L).as("cluster_size"),
        (col("__total") - col("__members")).as("n_clusters"),
        (col("__total") - col("__members")).as("n_docs"))
      .filter(col("n_clusters") > 0)
    multi.unionByName(singleton)
      .crossJoin(broadcast(total))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 " +
          "div __total AS BIGINT)").as("docs_ppm"))
  }

  /** X145 — dedup-tier overlap audit: how much of the NEAR-dup
    * problem the cheap EXACT tier already catches. Exact membership =
    * sharing a normalized fingerprint (the [[graft.ops.Curate
    * .gateSignals]] norm_fp seam) with at least one other document;
    * near membership = appearing in any verified LSH pair. The one-row
    * answer prices the pipeline choice: `exact_covers_near_ppm` near
    * 10⁶ says hash-dedup suffices and the MinHash stage is paying for
    * a sliver (`n_near_only`); a low value says the corpus's
    * duplication is genuinely fuzzy. Null texts are never exact
    * members (their fingerprint is null, and null is not a group).
    *
    * SHAPE AT 100 TB: one fingerprint-grain exchange (the x2 exact-
    * dedup shape), the duplicate-density pair union, two
    * key-partitioned membership joins, ONE output row.
    *
    * Output: (n_docs, n_exact, n_near, n_both, n_exact_only,
    * n_near_only, exact_covers_near_ppm).
    */
  def dedupTierOverlap(docs: DataFrame, pairs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val fp = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        md5(TextAnalysis.normalize(col(textCol))).as("__fp"))
    val dupFps = fp.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select(col("__fp"))
    val exactIds = fp.join(dupFps, Seq("__fp"))
      .select(col(idCol), lit(1L).as("__ex"))
    val nearIds = pairs.select(col("d1").as(idCol))
      .union(pairs.select(col("d2").as(idCol))).distinct()
      .withColumn("__nr", lit(1L))
    docs.select(col(idCol))
      .join(exactIds, Seq(idCol), "left")
      .join(nearIds, Seq(idCol), "left")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__ex")), lit(0L)).as("n_exact"),
        coalesce(sum(col("__nr")), lit(0L)).as("n_near"),
        coalesce(sum(when(col("__ex").isNotNull &&
          col("__nr").isNotNull, 1L)), lit(0L)).as("n_both"))
      .select(col("n_docs"), col("n_exact"), col("n_near"),
        col("n_both"),
        (col("n_exact") - col("n_both")).as("n_exact_only"),
        (col("n_near") - col("n_both")).as("n_near_only"),
        expr("CASE WHEN n_near = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST(CAST(n_both AS DECIMAL(38,0)) * 1000000 " +
          "div n_near AS BIGINT) END").as("exact_covers_near_ppm"))
  }

  /** X143 — pair-similarity histogram: the verified near-dup pairs
    * bucketed by Jaccard at centi grain, with the cumulative
    * at-or-above count — the THRESHOLD-SENSITIVITY curve. The 0.8 cut
    * is a konvention, not a law; this table prices moving it ("raising
    * to 0.9 keeps only n_at_or_above(90) pairs") and shows whether the
    * corpus's duplication is borderline (mass hugging the cut) or
    * structural (mass at 95–100). The bucket re-quantizes through the
    * jac lane's OWN 1e-6 grain — `round(jac·10⁶) div 10⁴` — because a
    * direct `floor(jac·100)` misbuckets exact centi boundaries that
    * are not double-representable (floor(0.57·100) = 56): the round
    * recovers the integer the pair verification meant, the integral
    * div then buckets exactly, and both steps are engine-identical for
    * positive values.
    *
    * SHAPE AT 100 TB: one fold over the duplicate-density pair table
    * to ≤ 101 bucket rows; the cumulative window runs over those
    * bucket rows only. Output: (jac_centi, n_pairs, n_at_or_above),
    * ordered naturally by bucket.
    */
  def pairSimilarityHistogram(pairs: DataFrame,
                              jacCol: String = "jac"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = pairs
      .withColumn("__jac_micro",
        round(col(jacCol) * 1000000).cast("long"))
      .groupBy(expr("__jac_micro div 10000").as("jac_centi"))
      .agg(count(lit(1)).as("n_pairs"))
    val w = Window.orderBy(col("jac_centi").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("n_at_or_above", sum(col("n_pairs")).over(w))
  }

  /** X142 — deduplication token savings, attributed per source: under
    * the x9 keep-one rule (the min-id member of each component is
    * canonical), how many TOKENS does each source lose — the number
    * that prices dedup in training-budget units rather than document
    * counts (a source shedding 40% of its documents but 2% of its
    * tokens was duplicating boilerplate stubs, not content). Null
    * sources are excluded (the x131 rule); null texts count 0 tokens.
    *
    * SHAPE AT 100 TB: components over the duplicate-density pair list,
    * a component-grain min fold picks canonicals, one key-partitioned
    * join flags removed docs, then a source-grain fold over one
    * corpus-side projection (whitespace token counts computed in the
    * scan, never materialized). `savings_ppm` uses a DECIMAL(38,0)
    * lane and is 0 for a source with zero tokens (both engines would
    * otherwise diverge on integral division by zero).
    *
    * Output: (src, n_docs, n_removed, tokens_total, tokens_removed,
    * savings_ppm), one row per source.
    */
  def dedupSavings(docs: DataFrame, pairs: DataFrame, idCol: String,
                   srcCol: String, textCol: String): DataFrame = {
    val comps = Cluster.components(pairs)
      .select(col("id").as(idCol), col("component"))
    val canon = comps.groupBy(col("component"))
      .agg(min(col(idCol)).as("__keep"))
    val removed = comps.join(canon, Seq("component"))
      .filter(col(idCol) =!= col("__keep"))
      .select(col(idCol), lit(1L).as("__rm"))
    docs.filter(col(srcCol).isNotNull)
      .select(col(idCol), col(srcCol).as("src"),
        coalesce(when(col(textCol).isNotNull,
          size(split(col(textCol), " ")).cast("long")), lit(0L))
          .as("__toks"))
      .join(removed, Seq(idCol), "left")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__rm")), lit(0L)).as("n_removed"),
        sum(col("__toks")).as("tokens_total"),
        coalesce(sum(when(col("__rm").isNotNull, col("__toks"))),
          lit(0L)).as("tokens_removed"))
      .select(col("src"), col("n_docs"), col("n_removed"),
        col("tokens_total"), col("tokens_removed"),
        expr("CASE WHEN tokens_total = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST(CAST(tokens_removed AS DECIMAL(38,0)) * 1000000 " +
          "div tokens_total AS BIGINT) END").as("savings_ppm"))
  }
}
