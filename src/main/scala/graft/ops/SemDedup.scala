package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** X36 — semantic deduplication, the SemDeDup recipe (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with a coarse k-means
  * quantizer, then WITHIN each cluster drop every vector that has a
  * more-canonical (lower-id) neighbor above a cosine threshold. Near-
  * duplicate *meaning* — paraphrases, template rewrites, translations of
  * boilerplate — that n-gram MinHash ([[Dedup]]) cannot see.
  *
  * The clusters are what make the operator tractable: candidate pairs
  * are confined to vectors that share a centroid, so the quadratic
  * blow-up is bounded by the largest cluster, not the corpus. That is
  * the published algorithm's design point, and it maps 1:1 onto Spark:
  * one shuffle on `list_id`, then a per-cluster self-join whose
  * partitions are cluster-sized. A cluster that outgrows the target
  * anyway can run its self-join blocked via `maxClusterRows` (see
  * [[semDedup]]'s parameter doc).
  *
  * Everything after centroid training is integer-exact and therefore
  * oracle-checkable: list assignment is the same expanded |q-c|^2 argmin
  * as [[Similarity.ivfTopK]], and the cosine gate `cos(a,b) > tau` is
  * evaluated as `dot > 0 AND dot^2 * 10^6 > tau_pm^2 * n2a * n2b` —
  * no sqrt, no float seam. The ratio tau_pm^2/10^6 is gcd-reduced and
  * the gate runs in pure LONG arithmetic whenever both row norms sit
  * under a precomputed cap (Cauchy-Schwarz bounds dot^2 by n2a*n2b, so
  * the cap rules out overflow); DECIMAL(38) is the exact fallback for
  * extreme-norm rows only. Per-pair cost matters more here than
  * anywhere — the pair count IS the operator's cost center — and
  * decimal ops are ~20x a long compare (BigDecimal objects inside
  * codegen). DuckDB mirrors the unreduced comparison in HUGEINT
  * (equivalent: both sides scale by the same positive gcd).
  *
  * Output: every input id with its cluster, the number of more-canonical
  * in-cluster duplicates, and the keep flag — the SemDeDup keep-set is
  * `is_kept = 1`.
  */
object SemDedup {

  /** Centroids of the most recent [[semDedup]] call — the same
    * oracle-inlining contract as [[Similarity.lastIvfCentroids]]
    * (graft.Verify runs queries first, dumps oracle SQL after, same JVM).
    */
  @volatile private[graft] var lastCentroids: Option[Array[Array[Int]]] = None

  /** `maxClusterRows`: when set, clusters above the cap run their
    * self-join BLOCKED — members split into m = ceil(size/cap)
    * sub-shards by an id hash, every row replicates to the m shard
    * pairs containing its shard, and the join keys on (cluster, shard
    * pair). A row carries every key containing its shard, so a raw key
    * match alone would count same-shard pairs m times; the post-join
    * `{sa, sb} == {lo, hi}` filter keeps exactly the one key that IS
    * the pair's own shard set, making every pair count once — the
    * equality-with-unblocked property is spec-pinned (and the spec
    * caught precisely this double-count in review). Cost: m-fold
    * replication of oversized-cluster rows buys join partitions bounded
    * by ~2·cap rows — the standard triangle-block trade when a skewed
    * cluster would otherwise be one giant task.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               nlist: Int, tauPermille: Long,
               centroids: Option[Array[Array[Int]]] = None,
               trainSample: Int = 65536,
               maxClusterRows: Option[Int] = None): DataFrame = {
    require(tauPermille >= 0 && tauPermille <= 1000,
      s"tauPermille must be in [0, 1000]: $tauPermille")
    require(maxClusterRows.forall(_ >= 1),
      s"maxClusterRows must be >= 1: $maxClusterRows")
    require(centroids.forall(_.length == nlist),
      s"centroids.length ${centroids.map(_.length).getOrElse(-1)} != nlist " +
        s"$nlist — the supplied quantizer must match the requested cluster " +
        "count (cluster size bounds the quadratic pair stage)")
    val cents = centroids.getOrElse(
      Similarity.trainCoarseCentroids(
        Similarity.collectTrainingSample(emb, vecCol, trainSample), nlist))
    lastCentroids = Some(cents)
    // loud validity gate on the integer domain: DotLong accumulates in
    // LONG, so a row whose components could overflow the n2 sum would
    // poison every comparison downstream SILENTLY (a wrapped n2 can look
    // small and take the fast path). max|q_i|^2 * dim <= Long.Max rules
    // that out, and Cauchy-Schwarz then bounds every pair dot by the row
    // norms. Rows beyond the bound fail the query with a message, never
    // misclassify — |quantized| up to ~1.2e8 (raw |x| ~ 120k) passes.
    val maxAbs = array_max(transform(col("q"), x => abs(x.cast("long"))))
    val compOk = maxAbs * maxAbs <=
      expr(s"${Long.MaxValue}L div size(q)")
    def guarded(c: Column): Column =
      when(assert_true(compOk,
        concat(lit(s"semDedup: |quantized component| too large for exact " +
          s"long arithmetic in $vecCol of row "),
          col(idCol).cast("string"))).isNull,
        c)
    val assigned = Similarity.assignLists(emb, idCol, vecCol, cents)
      .withColumn("n2", guarded(col("n2")))

    val dec = DecimalType(38, 0)
    val (aSide, bSide, pairKeys) = maxClusterRows match {
      case None =>
        (assigned.select(col("list_id"), col(idCol).as("id_a"),
           col("q").as("qa"), col("n2").as("n2a")),
         assigned.select(col("list_id"), col(idCol).as("id_b"),
           col("q").as("qb"), col("n2").as("n2b")),
         Seq("list_id"))
      case Some(cap) =>
        val sizes = assigned.groupBy(col("list_id"))
          .agg(count(lit(1)).as("__n"))
        val sharded = assigned.join(broadcast(sizes), "list_id")
          .withColumn("__m", expr(s"cast((__n + ${cap - 1}) div $cap as int)"))
          .withColumn("__s", pmod(xxhash64(col(idCol)), col("__m")).cast("int"))
          .withColumn("__t", explode(sequence(lit(0), col("__m") - 1)))
          .withColumn("__lo", least(col("__s"), col("__t")))
          .withColumn("__hi", greatest(col("__s"), col("__t")))
        (sharded.select(col("list_id"), col("__lo"), col("__hi"),
           col("__s").as("__sa"),
           col(idCol).as("id_a"), col("q").as("qa"), col("n2").as("n2a")),
         sharded.select(col("list_id"), col("__lo"), col("__hi"),
           col("__s").as("__sb"),
           col(idCol).as("id_b"), col("q").as("qb"), col("n2").as("n2b")),
         Seq("list_id", "__lo", "__hi"))
    }
    val d = Similarity.dot(col("qa"), col("qb"))
    // gcd-reduce tau_pm^2 / 10^6 so the gate usually runs in pure LONG
    // arithmetic: with num/den reduced, Cauchy-Schwarz gives
    // dot^2 <= n2a*n2b, so whenever n2a, n2b <= L with
    // L = sqrt(Long.Max / max(num, den)) every product below fits a
    // long. Decimal (exact but ~20x slower per pair — BigDecimal objects
    // inside codegen) is the fallback for extreme-norm vectors; on
    // unit-ish embeddings quantized at 10^3 the fast path always takes.
    // The decimal triple products themselves fit DECIMAL(38) only below
    // decCap ~ 1e16 — beyond THAT the row errors out loudly (a decimal
    // overflow would return null and silently drop the pair instead).
    val g = BigInt(tauPermille * tauPermille).gcd(BigInt(1000000L)).toLong
    val num = tauPermille * tauPermille / g
    val den = 1000000L / g
    val normCap = math.sqrt(Long.MaxValue.toDouble / math.max(num, den)).toLong - 1
    // num*n2a*n2b and d^2*den must stay under 10^38 (Decimal(38,0)):
    // with n2a, n2b <= decCap both are <= max(num, den) * decCap^2
    val decCap =
      (math.sqrt(1e38 / math.max(num, den).toDouble) * 0.999999).toLong
    val longGate =
      d * d * lit(den) > lit(num) * col("n2a") * col("n2b")
    val decGate =
      d.cast(dec) * d.cast(dec) * lit(den).cast(dec) >
        lit(num).cast(dec) * col("n2a").cast(dec) * col("n2b").cast(dec)
    val overTau = d > lit(0L) &&
      when(col("n2a") <= normCap && col("n2b") <= normCap, longGate)
        .when(assert_true(col("n2a") <= decCap && col("n2b") <= decCap,
          lit(s"semDedup: row norm exceeds the exact DECIMAL(38) range " +
            s"($decCap); quantized norms this large are not supported"))
          .isNull, decGate)
    // blocked mode: a row carries EVERY key containing its shard, so two
    // same-shard rows would meet under all m of them — the key must be
    // exactly the pair's own shard set for the match to count once
    val exactlyOnce =
      if (maxClusterRows.isEmpty) lit(true)
      else least(col("__sa"), col("__sb")) === col("__lo") &&
        greatest(col("__sa"), col("__sb")) === col("__hi")
    val dups = aSide.join(bSide, pairKeys)
      .filter(col("id_b") < col("id_a") && exactlyOnce && overTau)
      .groupBy(col("id_a").as(idCol))
      .agg(count(lit(1)).as("n_dup_lower"))

    // gate list_id ITSELF on the assignment path: the final projection
    // prunes n2, and a singleton-cluster row never reaches the pair
    // stage, so without this the overflow assert could be optimized away
    // for exactly the rows whose misassignment it exists to prevent —
    // every output row now forces the check
    assigned.select(col(idCol), guarded(col("list_id")).as("list_id"))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol), col("list_id"),
        coalesce(col("n_dup_lower"), lit(0L)).as("n_dup_lower"),
        when(col("n_dup_lower").isNull, 1).otherwise(0).as("is_kept"))
  }

  /** X117 — CROSS-corpus SEMANTIC decontamination: drop every corpus
    * vector whose cosine against ANY eval-suite vector reaches `tauPpm`
    * micro-units. The embedding-space complement of the lexical gates
    * (x13 shingles / x74 Bloom / x87 paragraphs): a paraphrased or
    * re-worded eval item shares no 8-gram with its source but still
    * sits next to it in embedding space — the [[semDedup]] argument
    * (Abbas et al. 2023) pointed ACROSS corpora, at the train-vs-eval
    * boundary where contamination audits actually run.
    *
    * Shape at 100 TB: the eval suite is BOUNDED (the x74 argument), so
    * its quantized block broadcasts into the corpus scan and the corpus
    * NEVER shuffles vectors — per corpus row one codegen'd [[Similarity.dot]]
    * pass over the eval block, then a map-side-combined max; the only
    * exchange carries (id, sim_ppm) partials. The corpora are disjoint
    * by contract (the x60 split); the join predicate defensively
    * excludes an id present on both sides rather than letting a
    * violation score 10^6 against itself.
    *
    * Integer-exact: quantized dot and norms are exact ints, the cosine
    * is one IEEE-correctly-rounded double, and `floor(cos·10^6)` lands
    * the comparison in exact BIGINT micro-units — bit-identical in any
    * engine (the x78 lane discipline). `nearest_eval` ties break to the
    * smallest eval id. Returns (idCol, max_sim_ppm, nearest_eval,
    * verdict) DENSE over the corpus.
    */
  def semanticDecon(corpus: DataFrame, evalEmb: DataFrame, idCol: String,
                    vecCol: String, tauPpm: Long): DataFrame = {
    // pin: the emptiness probe and the broadcast must see one
    // materialization (the x87 nondeterministic-ref argument)
    val ev = evalEmb.select(col(idCol).as("eval_id"),
        Similarity.quantize(col(vecCol)).as("eq"))
      .localCheckpoint(false)
    require(!ev.isEmpty,
      "semanticDecon: eval side is empty — nothing to gate against")
    semanticDeconAgainst(corpus, ev, idCol, vecCol, tauPpm)
  }

  /** Sentinel `max_sim_ppm` emitted when the accumulated eval set is
    * empty (streaming cold start): below any real cosine ppm, so it can
    * never read as a similarity.
    */
  val NoEvalSentinelPpm: Long = -2000000L

  /** The gate half of [[semanticDecon]], against a PREPARED
    * (eval_id, eq) QUANTIZED eval frame — split out so the streaming
    * twin ([[graft.streaming.SemDeconStream]]) can feed its accumulated
    * state directly (the [[graft.ops.Dolma.paragraphDecontaminateAgainst]]
    * contract). An EMPTY eval frame emits every corpus row as `keep`
    * with [[NoEvalSentinelPpm]] and a null nearest_eval — the streaming
    * cold start, where the batch wrapper's loud require would be wrong.
    */
  /** Cardinality cap on the force-broadcast eval block: ~300 B per
    * quantized row keeps 10⁶ rows ≈ 300 MB — a real (if chunky)
    * broadcast, where an unbounded "eval" frame would OOM the driver
    * with no message. The x83/x89 discipline: the bounded-eval
    * contract is ASSERTED (one cheap count on the already-pinned
    * frame), not assumed. A corpus-scale decon target belongs in the
    * lexical tiers (x13/x74/x87) or sharded eval passes, not here.
    */
  val MaxEvalRows: Long = 1000000L

  def semanticDeconAgainst(corpus: DataFrame, evalPrepared: DataFrame,
                           idCol: String, vecCol: String,
                           tauPpm: Long,
                           maxEvalRows: Long = MaxEvalRows): DataFrame = {
    require(tauPpm >= 1 && tauPpm <= 1000000,
      s"tauPpm $tauPpm out of [1, 1000000]")
    val c = corpus.select(col(idCol),
        Similarity.quantize(col(vecCol)).as("q"))
      .withColumn("n2", Similarity.sqNorm(col("q")))
    val ev = evalPrepared.select(col("eval_id"), col("eq"))
      .withColumn("en2", Similarity.sqNorm(col("eq")))
    val nEval = ev.count()
    require(nEval <= maxEvalRows,
      s"semanticDecon: eval side has $nEval rows, over the broadcast " +
        s"cap $maxEvalRows — the bounded-eval contract is violated; " +
        "gate lexically (x13/x74/x87) or shard the eval set instead " +
        "of broadcasting a corpus")
    if (nEval == 0L)
      return c.select(col(idCol),
        lit(NoEvalSentinelPpm).as("max_sim_ppm"),
        lit(null).cast("long").as("nearest_eval"),
        lit("keep").as("verdict"))
    val cPinned = c.localCheckpoint(false) // the scored join and the
    // density left-join below must read ONE materialization
    val scored = cPinned.join(broadcast(ev), col("eval_id") =!= col(idCol))
      .select(col(idCol), col("eval_id"),
        floor(Similarity.cosine(
          Similarity.dot(col("q"), col("eq")), col("n2"), col("en2"))
          * 1000000).cast("long").as("sim_ppm"))
    val best = scored.groupBy(col(idCol))
      .agg(max(struct(col("sim_ppm"), (-col("eval_id")).as("nege"))).as("m"))
    // DENSE over the corpus even when the disjointness contract is
    // violated (a corpus row sharing the single eval row's id matches
    // nothing under the defensive predicate) or the id is null — such
    // rows come back through the left join with the cold-start
    // sentinel instead of silently vanishing from the ledger
    cPinned.select(col(idCol)).join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("m.sim_ppm"), lit(NoEvalSentinelPpm))
          .as("max_sim_ppm"),
        (-col("m.nege")).as("nearest_eval"),
        when(coalesce(col("m.sim_ppm"), lit(NoEvalSentinelPpm)) >= tauPpm,
          "drop").otherwise("keep").as("verdict"))
  }
}
