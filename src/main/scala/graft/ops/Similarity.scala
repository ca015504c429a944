package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X2 — similarity search over an embedding column (SURVEY §2.8).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k, query-set broadcast against
  *    the corpus — the correctness baseline. Cost is |Q| x |corpus| dot
  *    products with NO shuffle of the corpus (queries broadcast, per-query
  *    top-k via window on the scored pairs).
  *  - [[lshTopK]]: sign-random-projection buckets (16 bits from the
  *    leading dimensions) prune the corpus to one bucket per query before
  *    scoring — the 100 TB path: the bucket id is computed scan-side, the
  *    join is bucket-equality (hash-partitionable), and only candidates
  *    are scored. Recall versus brute force is asserted in ScalaTest.
  *
  * All scoring uses floor(x*1000) integer quantization: dot products and
  * norms are exact integers (dim 64, |x|<=~2000 => well inside 2^53), so
  * scores are bit-identical regardless of summation order or engine —
  * the property that makes the DuckDB oracle byte-match. (Int8/int16
  * quantization is also the production-realistic memory layout.)
  */
object Similarity {

  /** floor(x * 1000) quantized copy of the embedding, stored as
    * `array<int>` — |x| <= ~2000 fits easily, and the narrower rows halve
    * the bytes materialized per joined pair in all-pairs scoring.
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("int"))

  /** Exact integer squared norm of a quantized vector (native codegen'd
    * loop — computed once per row, not per pair).
    */
  def sqNorm(q: Column): Column =
    graft.functions.VectorOps.dot_long(q, q)

  /** Exact integer dot product of two quantized vectors — the per-pair hot
    * path, a native `DotLong` expression instead of interpreted
    * `aggregate(zip_with(...))` (see graft.functions.DotLong).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot_long(a, b)

  /** Guarded: a ZERO VECTOR has squared norm 0 and the unguarded
    * divide is an ANSI DIVIDE_BY_ZERO crashing every ANN/margin op on
    * the first degenerate embedding (the x144 gateSignals class);
    * cosine against the zero vector is mathematically undefined, so
    * null is the one value ANSI and legacy modes agree on. Null sims
    * sort LAST under every top-k window here (desc ordering), so a
    * zero vector can never displace a real neighbor, and bitextMargin's
    * cmicro >= 0 filter drops its null rows before the margin division.
    *
    * Cosine from quantized ints: dot / (sqrt(n2a) * sqrt(n2b)) — the
    * association is fixed and must match any external verifier's SQL.
    */
  def cosine(dotCol: Column, n2a: Column, n2b: Column): Column =
    when(n2a > 0 && n2b > 0,
      dotCol.cast("double") / (sqrt(n2a) * sqrt(n2b)))

  private def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), quantize(col(vecCol)).as("q"))
      .withColumn("n2", sqNorm(col("q")))

  /** Exact top-k: every query row against the full corpus.
    * Ties broken by candidate id for determinism.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val corpus = prepared(emb, idCol, vecCol)
    val qs = prepared(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "qid").withColumnRenamed("q", "qq")
      .withColumnRenamed("n2", "qn2")
    val scored = corpus.join(broadcast(qs), col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** X71 — contrastive HARD-NEGATIVE mining: per query vector, the
    * top-k most-cosine-similar corpus vectors carrying a DIFFERENT
    * label — the standard training-pair generator for embedding models
    * (the hardest negatives are the near-misses, not random draws).
    * Same shape as [[bruteForceTopK]] — queries broadcast into the
    * corpus scan (the corpus is never shuffled), the label-mismatch
    * predicate rides the same broadcast join, and the per-query top-k
    * is a rank window over the scored pairs only. Scoring is the same
    * floor(x*1000) integer-quantized cosine, so the DuckDB oracle
    * byte-matches. At 100 TB the scale path is the same as x2's: swap
    * the brute-force candidate set for an ANN tier's and keep the
    * label-mismatch filter + window unchanged.
    */
  /** X78 — margin-based bitext mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix parallel-corpus recipe): for every source-side
    * vector, the best target-side candidate by RATIO MARGIN — cosine
    * normalized by the mean cosine of each side's k nearest neighbors
    * in the other side:
    *   margin(x,y) = cos(x,y) / ((Σ_{z∈NNk(x)} cos(x,z)
    *                            + Σ_{z∈NNk(y)} cos(z,y)) / 2k).
    * Plain cosine thresholds fail on hubness (some vectors are near
    * everything); the margin rescales per-vector, which is the whole
    * point of the recipe.
    *
    * EXACT INTEGER formulation: per-pair cosine lands as
    * `floor(cos·10^6)` micro-units (cos itself is deterministic — the
    * dot and norms are exact ints and IEEE sqrt/divide are correctly
    * rounded), NN sums are then exact BIGINT sums, and the margin is one
    * integral division `cmicro·2k·10^6 div (sa+sb)` — ppm of the ratio,
    * bit-identical in any engine. Anti-correlated pairs (cmicro < 0)
    * are dropped before the division (they are never bitext, and
    * negative integral division rounds differently across engines);
    * degenerate queries whose NN sums are ≤ 0 drop with them.
    *
    * Shape at 100 TB: ONE scored pair table drives everything — the
    * (smaller) source side broadcasts into the target scan (the x2
    * shape, target never shuffled), both NN sums are rank windows over
    * that same pair table, and the sums rejoin it as two broadcast
    * side-tables (side-cardinality rows). Brute-force pairing is the
    * sf-scale baseline; at production scale the pair table is an ANN
    * tier's candidate list (x51's refine contract) and every stage
    * downstream is unchanged.
    *
    * Returns (aid, bid, margin_ppm): the top-1 target per source vector
    * by margin (ties to the smaller bid).
    */
  def bitextMargin(a: DataFrame, b: DataFrame, idCol: String,
                   vecCol: String, k: Int): DataFrame = {
    val pa = prepared(a, idCol, vecCol)
      .select(col(idCol).as("aid"), col("q").as("qa"), col("n2").as("na"))
    val pb = prepared(b, idCol, vecCol)
      .select(col(idCol).as("bid"), col("q").as("qb"), col("n2").as("nb"))
    val pairs = pb.join(broadcast(pa))
      .select(col("aid"), col("bid"),
        floor(cosine(dot(col("qa"), col("qb")), col("na"), col("nb"))
          * 1000000L).cast("long").as("cmicro"))
      // one scored-pair table feeds both NN-sum windows AND the margin
      // join: pin it so the pair scoring runs once, not three times
      // (blocks release with the RDD once the query's consumers are GC'd)
      .localCheckpoint(false)
    val wa = Window.partitionBy(col("aid"))
      .orderBy(col("cmicro").desc, col("bid"))
    val sa = pairs.withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= k)
      .groupBy(col("aid")).agg(sum(col("cmicro")).as("sa"))
    val wb = Window.partitionBy(col("bid"))
      .orderBy(col("cmicro").desc, col("aid"))
    val sb = pairs.withColumn("rn", row_number().over(wb))
      .filter(col("rn") <= k)
      .groupBy(col("bid")).agg(sum(col("cmicro")).as("sb"))
    val margins = pairs
      .join(broadcast(sa), Seq("aid")).join(broadcast(sb), Seq("bid"))
      .filter(col("cmicro") >= 0L && col("sa") + col("sb") > 0L)
      .select(col("aid"), col("bid"),
        expr(s"cmicro * ${2L * k}L * 1000000L div (sa + sb)").as("margin_ppm"))
    val top = Window.partitionBy(col("aid"))
      .orderBy(col("margin_ppm").desc, col("bid"))
    margins.withColumn("rn", row_number().over(top))
      .filter(col("rn") === 1)
      .select(col("aid"), col("bid"), col("margin_ppm"))
  }

  def hardNegatives(emb: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val corpus = emb.select(col(idCol), col(labelCol),
        quantize(col(vecCol)).as("q"))
      .withColumn("n2", sqNorm(col("q")))
    val qs = queries.select(col(idCol).as("qid"),
        col(labelCol).as("qlabel"), quantize(col(vecCol)).as("qq"))
      .withColumn("qn2", sqNorm(col("qq")))
    val scored = corpus.join(broadcast(qs),
        col("qid") =!= col(idCol) && col("qlabel") =!= col(labelCol))
      .select(col("qid"), col(idCol).as("cid"), col(labelCol).as("clabel"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** 16-bit sign bucket over the leading dimensions: bit j set iff
    * vec[j] >= 0. Deterministic, computable at scan time, and cheap
    * enough to store alongside the vector at ingest.
    */
  def signBucket(vec: Column, bits: Int = 16): Column =
    (0 until bits).map(j =>
      when(element_at(vec, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** X119 — EXACT integer Gram/covariance table of an embedding
    * column: for every coordinate pair i ≤ j (1-based), the exact
    * integer lanes (n, g = Σ q_i·q_j, s_i, s_j) and the sample
    * covariance cov = (g·n − s_i·s_j)/n² as the one round-6 double.
    * The d(d+1)/2-row second-moment summary every embedding
    * post-processing step starts from (whitening, PCA, the x119 ABTT
    * below) — and a corpus-QA artifact in its own right (anisotropy
    * shows up as a dominant diagonal block).
    *
    * Shape at 100 TB: the nested coordinate explode emits d²/2 cells
    * per row INSIDE the scan stage, and the single exchange carries
    * d(d+1)/2 partial-sum rows per map task (map-side combine) — never
    * row-count-sized. EXACTNESS BOUND, asserted IN-PLAN (the x83/x89
    * discipline): the cov numerator g·n − s_i·s_j reaches ~10⁶·n², so
    * past [[CovMaxRows]] rows the BIGINT lane would wrap SILENTLY —
    * the query aborts loudly instead (past that, shard the corpus and
    * merge moment tables, which sum exactly).
    */
  /** Row bound keeping g·n (≤ 10⁶·n²) inside BIGINT — the SINGLE-PASS
    * [[covarianceTable]] bound, where the cov numerator is computed in
    * BIGINT. The sharded path ([[covarianceMoments]] +
    * [[mergeMoments]]) has no such product: its bound is the raw-lane
    * one, [[MomentLaneMaxRows]].
    */
  val CovMaxRows: Long = 3000000L

  /** Row bound keeping the RAW moment lanes exact in BIGINT:
    * |g| ≤ 10⁶·n (each quantized product ≤ 10³·10³), so n ≤ 9·10¹²
    * keeps |g| ≤ 9·10¹⁸ < 2⁶³. The bound for the sharded/merged path —
    * 3000× the single-pass cap, i.e. ~10¹² embeddings of corpus.
    */
  val MomentLaneMaxRows: Long = 9000000000000L

  def covarianceTable(emb: DataFrame, vecCol: String): DataFrame = {
    val e = emb.filter(col(vecCol).isNotNull)
      .select(quantize(col(vecCol)).as("q"))
    val cells = e
      .select(posexplode(col("q")).as(Seq("i0", "vi")), col("q"))
      .select(col("i0"), col("vi"),
        posexplode(col("q")).as(Seq("j0", "vj")))
      .filter(col("j0") >= col("i0"))
      .groupBy((col("i0") + 1).cast("long").as("i"),
        (col("j0") + 1).cast("long").as("j"))
      .agg(sum(col("vi").cast("long") * col("vj")).as("g"))
    val sums = e.select(posexplode(col("q")).as(Seq("p0", "v")))
      .groupBy((col("p0") + 1).cast("long").as("p"))
      .agg(sum(col("v").cast("long")).as("s"), count(lit(1)).as("n"))
    cells
      .join(sums.select(col("p").as("i"), col("s").as("s_i"), col("n")),
        Seq("i"))
      .join(sums.select(col("p").as("j"), col("s").as("s_j")), Seq("j"))
      .select(col("i"), col("j"),
        // in-plan exactness guard, repeated on BOTH n and cov: a
        // consumer that selects only (i, j, cov) column-prunes the n
        // CASE away, so the cov copy is what guarantees a wrap-scale
        // corpus aborts instead of training on garbage no matter
        // which columns the consumer keeps
        covGuard(CovMaxRows, "covarianceTable: row count exceeds the " +
          s"BIGINT-exact bound $CovMaxRows — use covarianceMoments" +
          "(shardCol) + mergeMoments (exact lane merge, DECIMAL " +
          "numerator) instead", "BIGINT", col("n")).as("n"),
        col("g"), col("s_i"), col("s_j"),
        covGuard(CovMaxRows, "covarianceTable: row count exceeds the " +
          s"BIGINT-exact bound $CovMaxRows — use covarianceMoments" +
          "(shardCol) + mergeMoments (exact lane merge, DECIMAL " +
          "numerator) instead", "DOUBLE",
          round((col("g") * col("n") - col("s_i") * col("s_j"))
            .cast("double") / (col("n") * col("n")), 6)).as("cov"))
  }

  /** The prunable-guard fix (round-15 review): a raise_error CASE keyed
    * on `n` that wraps the GUARDED COLUMN'S OWN value, so the abort
    * survives Catalyst column pruning on every consumed column instead
    * of living only in `n` (a consumer selecting only cov used to prune
    * the guard away and read wrapped lanes silently).
    */
  private def covGuard(bound: Long, msg: String, castTo: String,
                       value: Column): Column =
    when(col("n") > bound,
      expr(s"CAST(raise_error('${msg.replace("'", "")}') AS $castTo)"))
      .otherwise(value)

  /** X119 continuation past [[CovMaxRows]] — PER-SHARD exact moment
    * lanes: for every (shard, coordinate pair i ≤ j), the exact BIGINT
    * lanes (n, g = Σ q_i·q_j, s_i, s_j). The same cell-grain exchange
    * as [[covarianceTable]], keyed additionally by `shardCol` — still
    * d(d+1)/2 partial rows per map task per shard, never
    * row-count-sized. NO cov column here: per-shard covariance does
    * not merge, but the raw lanes SUM EXACTLY (the HLL
    * pointwise-max-merge contract of [[Sketch]], in additive form), so
    * a corpus of any size shards by any column, computes moments per
    * shard, and folds them with [[mergeMoments]].
    *
    * Per-shard exactness guard in-plan: the g lane wraps past
    * [[MomentLaneMaxRows]] rows in one shard (|g| ≤ 10⁶·n), so an
    * oversized shard aborts loudly instead of summing garbage.
    */
  def covarianceMoments(emb: DataFrame, vecCol: String,
                        shardCol: Column): DataFrame = {
    val e = emb.filter(col(vecCol).isNotNull)
      .select(shardCol.as("shard"), quantize(col(vecCol)).as("q"))
    val cells = e
      .select(col("shard"), posexplode(col("q")).as(Seq("i0", "vi")),
        col("q"))
      .select(col("shard"), col("i0"), col("vi"),
        posexplode(col("q")).as(Seq("j0", "vj")))
      .filter(col("j0") >= col("i0"))
      .groupBy(col("shard"), (col("i0") + 1).cast("long").as("i"),
        (col("j0") + 1).cast("long").as("j"))
      .agg(sum(col("vi").cast("long") * col("vj")).as("g"))
    val sums = e.select(col("shard"), posexplode(col("q")).as(Seq("p0", "v")))
      .groupBy(col("shard"), (col("p0") + 1).cast("long").as("p"))
      .agg(sum(col("v").cast("long")).as("s"), count(lit(1)).as("n"))
    cells
      .join(sums.select(col("shard"), col("p").as("i"),
        col("s").as("s_i"), col("n")), Seq("shard", "i"))
      .join(sums.select(col("shard"), col("p").as("j"),
        col("s").as("s_j")), Seq("shard", "j"))
      .select(col("shard"), col("i"), col("j"),
        expr(s"""CASE WHEN n > $MomentLaneMaxRows THEN
                |  CAST(raise_error('covarianceMoments: shard exceeds
                | the lane-exact bound $MomentLaneMaxRows rows —
                | shard finer') AS BIGINT)
                |ELSE n END""".stripMargin.replace("\n", "")).as("n"),
        col("g"), col("s_i"), col("s_j"))
  }

  /** X119 — the exact merge fold over [[covarianceMoments]] outputs:
    * lanes (n, g, s_i, s_j) sum exactly per cell, and the covariance
    * is recomputed from the MERGED lanes with a DECIMAL(38,0)
    * numerator — g·n ≤ 10⁶·n² stays exact to n ~ 9·10¹² (≤ 8.1·10³¹,
    * far inside 38 digits), so the merged table has NO [[CovMaxRows]]
    * cap, only the lane bound [[MomentLaneMaxRows]] on the merged row
    * count (guarded in-plan). Output schema is identical to
    * [[covarianceTable]] (i, j, n, g, s_i, s_j, cov) and at any n
    * where both paths are defined the values are bit-identical —
    * merge(shards) ≡ single-pass, which the `x119_cov_merged` oracle
    * row pins at test SF. [[abtt]] and [[isotropy]] train from a
    * merged table via their `cov` parameter.
    */
  def mergeMoments(moments: DataFrame): DataFrame = {
    val m = moments.groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("g")).as("g"),
        sum(col("s_i")).as("s_i"), sum(col("s_j")).as("s_j"))
    m.select(col("i"), col("j"),
      covGuard(MomentLaneMaxRows, "mergeMoments: merged row count " +
        s"exceeds the lane-exact bound $MomentLaneMaxRows", "BIGINT",
        col("n")).as("n"),
      col("g"), col("s_i"), col("s_j"),
      // the guard repeats on cov (the prunable-guard fix): the merged
      // path is exactly the one marketed as uncapped, so a consumer
      // selecting only (i, j, cov) must still abort past the lane bound
      covGuard(MomentLaneMaxRows, "mergeMoments: merged row count " +
        s"exceeds the lane-exact bound $MomentLaneMaxRows", "DOUBLE",
        round((col("g").cast("decimal(38,0)") * col("n")
            - col("s_i").cast("decimal(38,0)") * col("s_j")).cast("double")
          / (col("n").cast("double") * col("n").cast("double")), 6))
        .as("cov"))
  }

  /** The quantized top principal component of the most recent [[abtt]]
    * run — (micro-unit vector, its squared norm), kept for the oracle
    * to inline as literals (the [[lastIvfCentroids]] contract).
    */
  @volatile private[graft] var lastAbttPc: Option[(Array[Long], Long)] = None

  /** X119 — "All-but-the-top" embedding post-processing (Mu &
    * Viswanath 2018): embedding sets are anisotropic — a nonzero mean
    * plus a few dominant directions carry most of the variance and
    * wash out cosine contrast; removing them measurably improves
    * similarity tasks. This is the AUDIT/projection pass: per vector,
    * its exact projection score on the top principal component of the
    * centered covariance, and the cosine between the centered vector
    * and that component.
    *
    * Training is DRIVER-LOCAL on a bounded artifact (the IVF-codebook
    * contract): the d(d+1)/2 exact covariance lanes collect (d = 64 →
    * 2080 rows), 200 deterministic power-iteration sweeps from the
    * fixed all-ones start extract the top eigenvector, and the vector
    * re-enters the plan as ONE micro-unit integer literal. The
    * per-vector pass is then row-local exact arithmetic — centered
    * coordinates in n-scaled units (qc_i = q_i·n − s_i, integers, no
    * rational mean), score = qc·v exact BIGINT, and the cosine one
    * round-6 double — so the oracle replays it bit-for-bit from the
    * inlined literal. Eigen-ness (Rayleigh dominance, residual) is
    * spec-pinned; the oracle pins the distributed projection.
    *
    * Returns (idCol, pc1_score, cos_pc1) DENSE over the input.
    */
  /** X122 — the deterministic ±1 JL sign: +1 iff the first hex digit
    * of md5("jl|i|j") is odd (i = input dim, j = output dim, both
    * 1-based). A pure function of the dimension pair — no trained
    * state, no RNG — so Spark inlines it as literals and the oracle
    * re-derives it from SQL md5, and any engine reproduces the
    * projection bit-for-bit.
    */
  def jlSign(i: Int, j: Int): Int = {
    val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"jl|$i|$j")
    if ((Character.digit(h.charAt(0), 16) & 1) == 1) 1 else -1
  }

  /** X122 — Johnson-Lindenstrauss random sign projection (Achlioptas
    * 2003's database-friendly ±1 form of the JL lemma): project the
    * quantized d-dim embedding to `dOut` dims through the
    * [[jlSign]] matrix. Output is EXPLODED (idCol, dim, y) rows with
    * y = Σ_i q_i·s_ij exact BIGINT (the 1/√dOut normalization stays
    * symbolic — consumers compare distances, where a constant factor
    * cancels). The cheap dimension-reduction tier in front of any ANN
    * index: row-local projection at the scan, zero shuffle, zero
    * trained state, E[‖y‖²] = dOut·‖q‖².
    */
  /** The per-output-dim exact projection columns over a quantized
    * vector column `__q` — one zip_with/aggregate per output dim over
    * an array LITERAL of signs (a dIn-wide element_at chain per dim
    * would put dIn·dOut extract nodes in the plan and dominate wall
    * time with codegen compilation, not data work — measured 6 s →
    * sub-second at dIn=64, dOut=16 on 2k vectors). Width guard
    * IN-PLAN: zip_with null-pads a short vector and the aggregate
    * would emit NULL while the oracle's q[i] indexing computes a
    * partial sum — a silent engine/oracle divergence; abort loudly
    * instead (the x83/x89 discipline). Shared by [[jlProject]]
    * (exploded rows) and [[jlTopK]] (array form).
    */
  private def jlYExprs(dIn: Int, dOut: Int): Seq[Column] = {
    require(dIn >= 1 && dIn <= 4096, s"dIn $dIn out of [1, 4096]")
    require(dOut >= 1 && dOut <= dIn, s"dOut $dOut out of [1, $dIn]")
    (1 to dOut).map { j =>
      val signsSql = (1 to dIn).map(i => jlSign(i, j))
        .mkString("array(", ", ", ")")
      expr(s"CASE WHEN size(__q) = $dIn THEN " +
        s"aggregate(zip_with(__q, $signsSql, " +
        "(x, s) -> CAST(x AS BIGINT) * s), 0L, (a, x) -> a + x) " +
        s"ELSE CAST(raise_error('jlProject: vector width <> $dIn') " +
        "AS BIGINT) END")
    }
  }

  def jlProject(emb: DataFrame, idCol: String, vecCol: String,
                dIn: Int, dOut: Int): DataFrame = {
    val ys = jlYExprs(dIn, dOut).zipWithIndex.map { case (y, j0) =>
      struct(lit((j0 + 1).toLong).as("dim"), y.as("y"))
    }
    emb.filter(col(vecCol).isNotNull)
      .select(col(idCol), quantize(col(vecCol)).as("__q"))
      .select(col(idCol), explode(array(ys: _*)).as("p"))
      .select(col(idCol), col("p.dim").as("dim"), col("p.y").as("y"))
  }

  /** X122→ANN composition: the JL sign projection fronting the exact
    * re-rank — the tier the projection exists for. Corpus and queries
    * project to `dOut` dims (row-local at the scan, exact BIGINT,
    * zero trained state); the coarse cut keeps the `candR` nearest
    * candidates per query by projected squared L2 distance (exact
    * integer, ties to the lower cid — the distance the JL lemma
    * preserves within ~1/√dOut); [[refineExact]] then rescores those
    * candidates with the exact quantized cosine.
    *
    * Shape at 100 TB: projected queries broadcast into the projected
    * corpus scan (corpus never shuffles — the x2 shape), with per-pair
    * cost dOut instead of dIn multiplies and a corpus layout dIn/dOut
    * × smaller if only projections are persisted; the candidate list
    * is |Q|·candR rows (audit-sized) and the refine stage is the
    * standard recipe. Every lane exact integer → fully
    * oracle-checkable with a STATIC oracle (the sign matrix is a pure
    * md5 function — no trained state to inline, unlike IVF/PQ).
    * Recall priced by the x43 audit row alongside the other tiers.
    */
  /** The coarse tier of [[jlTopK]] alone: per query, the `candR`
    * nearest corpus rows by exact projected L2, as (qid, cid, rank).
    * Exposed so a sweep over several candR values at ONE projection
    * width computes the projected-distance scan once and derives each
    * arm by a rank-prefix filter (rank is cutoff-independent: the
    * window runs before any filter).
    */
  def jlCandidates(emb: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, dIn: Int, dOut: Int,
                   candR: Int): DataFrame = {
    // exactness bound for the coarse lane: |y| ≤ 2·10⁶·dIn, so the
    // summed squared diff ≤ dOut·(4·10⁶·dIn)² must stay inside BIGINT
    require(BigInt(16) * 1000000000000L * dIn * dIn * dOut <=
      BigInt(Long.MaxValue),
      s"jlCandidates: dIn=$dIn, dOut=$dOut overflows the exact projected " +
        "distance lane (need 16e12·dIn²·dOut <= 2^63)")
    val ys = jlYExprs(dIn, dOut)
    def projected(df: DataFrame, outId: String): DataFrame =
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol), quantize(col(vecCol)).as("__q"))
        .select(col(idCol).as(outId), array(ys: _*).as(s"__y_$outId"))
    val corpus = projected(emb, "cid")
    val qs = projected(queries, "qid")
    val scored = corpus.join(broadcast(qs), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("aggregate(zip_with(__y_cid, __y_qid, " +
          "(a, b) -> (a - b) * (a - b)), 0L, (s, x) -> s + x)")
          .as("pdist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("pdist"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= candR).select(col("qid"), col("cid"), col("rank"))
  }

  def jlTopK(emb: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, dIn: Int, dOut: Int,
             candR: Int): DataFrame = {
    require(candR >= k, s"candR $candR < k $k — the coarse cut would " +
      "truncate the exact re-rank")
    val cands = jlCandidates(emb, queries, idCol, vecCol, dIn, dOut, candR)
    refineExact(emb, queries, idCol, vecCol, k, cands)
  }

  /** X122 — per-pair JL distortion audit on a deterministic pair set
    * (consecutive ids): distortion_ppm = ‖y_a − y_b‖²·10⁶ div
    * (dOut·‖q_a − q_b‖²) — exactly 10⁶ in expectation by the JL lemma,
    * with spread ~1/√dOut. Every lane exact BIGINT (squared distances
    * of integer vectors); identical-vector pairs (orig² = 0) are
    * dropped — distortion of a zero distance is undefined. Audit-sized:
    * one row per pair.
    */
  def jlDistortion(emb: DataFrame, idCol: String, vecCol: String,
                   dIn: Int, dOut: Int): DataFrame = {
    // exactness bound for the ppm lane: proj2 <= dOut*(2000*dIn)^2 and
    // proj2*10^6 must stay inside BIGINT — at the projection's maximal
    // geometry (4096x4096) it would wrap silently, so refuse loudly
    require(BigInt(4000000L) * dIn * dIn * dOut * 1000000L <=
      BigInt(Long.MaxValue),
      s"jlDistortion: dIn=$dIn, dOut=$dOut overflows the exact ppm " +
        "lane (need 4e6*dIn^2*dOut*1e6 <= 2^63)")
    val base = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol), quantize(col(vecCol)).as("q"))
    val pairsO = base.as("a").join(base.as("b"),
        col("b." + idCol) === col("a." + idCol) + 1)
      .select(col("a." + idCol).as("id_a"), col("b." + idCol).as("id_b"),
        sqNorm(zip_with(col("a.q"), col("b.q"),
          (x, y) => (x - y).cast("int"))).as("orig2"))
    // ‖y_a − y_b‖² from the exploded projection joined per (pair, dim)
    val yp = jlProject(emb, idCol, vecCol, dIn, dOut)
    val diff2 = yp.as("ya").join(yp.as("yb"),
        col("yb." + idCol) === col("ya." + idCol) + 1
          && col("yb.dim") === col("ya.dim"))
      .groupBy(col("ya." + idCol).as("id_a"))
      .agg(sum((col("ya.y") - col("yb.y")) * (col("ya.y") - col("yb.y")))
        .as("proj2"))
    pairsO.join(diff2, Seq("id_a"))
      .filter(col("orig2") > 0)
      .select(col("id_a"), col("id_b"), col("orig2"), col("proj2"),
        expr(s"proj2 * 1000000 div (${dOut}L * orig2)")
          .as("distortion_ppm"))
  }

  /** X125 — symmetric per-vector INT8 scalar quantization audit: the
    * standard 4× embedding-storage compression (one scale per vector,
    * codes in [−127, 127]) priced per vector. scale = maxabs/127;
    * code_i = round(127·q_i/maxabs) computed as EXACT integer
    * round-half-up on nonnegative lanes with the sign reapplied —
    * `(2·127·|q_i| + maxabs) div (2·maxabs)` — so codes are
    * bit-identical in any engine (integral div on nonnegative operands
    * is floor in both Spark and DuckDB; signed div would diverge).
    * The reconstruction error multiplies through by 127² to stay
    * integral: err_num = Σ (127·q_i − sign_i·code_i·maxabs)², and
    * err_ppm = err_num·10⁶ div (127²·‖q‖²) — the squared-L2 relative
    * error in exact BIGINT lanes end to end.
    *
    * Shape at 100 TB: one row-local projection at the scan — zero
    * shuffle, zero trained state (the scale is per-row). Exactness
    * (the TIGHT bound, round-15 review fix — the old analysis summed
    * worst-case 127·q_i products and was ~10⁶× pessimistic): each
    * lane's residue 127·q_i − sign_i·code_i·maxabs is the
    * round-to-nearest remainder of 127·|q_i| against maxabs, so
    * |residue| ≤ maxabs/2. [[quantize]] does NOT clamp (q_i =
    * floor(1000·x) can reach INT range for corrupt inputs), so the
    * in-plan guard enforces maxabs ≤ [[Int8MaxAbs]] = 2·10⁶ (|x| ≤
    * 2000 — generous for any real embedding); under it residues are
    * ≤ 10⁶, squared terms ≤ 10¹², and err_num ≤ d·10¹² ≈ 4.1·10¹⁵ at
    * d = 4096 — BIGINT-exact to d ~ 9·10⁶. The guard is what makes
    * the bound a contract instead of a hope (the x83/x89 discipline).
    *
    * Returns (idCol, maxabs, err_num, err_ppm) DENSE over non-null
    * vectors; an all-zero vector quantizes exactly (err 0).
    */
  val Int8MaxAbs: Long = 2000000L

  def int8Audit(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol), quantize(col(vecCol)).as("q"))
      .withColumn("maxabs",
        expr("aggregate(q, 0L, (m, x) -> greatest(m, abs(CAST(x AS BIGINT))))"))
    base
      .withColumn("maxabs",
        expr(s"""CASE WHEN maxabs > $Int8MaxAbs THEN
                |  CAST(raise_error('int8Audit: |q| beyond the exact
                | error-lane envelope $Int8MaxAbs') AS BIGINT)
                |ELSE maxabs END""".stripMargin.replace("\n", "")))
      .withColumn("err_num",
        expr("""CASE WHEN maxabs = 0 THEN 0L ELSE
                |aggregate(q, 0L, (a, x) -> a +
                |  (127 * CAST(x AS BIGINT) - CAST(sign(x) AS BIGINT) *
                |    ((254 * abs(CAST(x AS BIGINT)) + maxabs)
                |      div (2 * maxabs)) * maxabs)
                |  * (127 * CAST(x AS BIGINT) - CAST(sign(x) AS BIGINT) *
                |    ((254 * abs(CAST(x AS BIGINT)) + maxabs)
                |      div (2 * maxabs)) * maxabs))
                |END""".stripMargin.replace("\n", " ")))
      .withColumn("n2", sqNorm(col("q")))
      // the ppm ratio multiplies err_num by 10⁶ and n2 by 127² — both
      // can pass BIGINT at the envelope, so the ratio lanes are
      // DECIMAL(38,0) (exact; the result is ppm-sized and cast back)
      .select(col(idCol), col("maxabs"), col("err_num"),
        expr("CASE WHEN n2 = 0 THEN 0L ELSE " +
          "CAST((CAST(err_num AS DECIMAL(38,0)) * 1000000) div " +
          "(16129 * CAST(n2 AS DECIMAL(38,0))) AS BIGINT) END")
          .as("err_ppm"))
  }

  /** Driver-local top-PC training shared by [[abtt]] and [[isotropy]]:
    * collect the exact covariance lanes (d² bounded artifact), 200
    * deterministic power sweeps from the fixed all-ones start. Returns
    * (micro-unit vector, its squared norm, coordinate sums, n, d);
    * publishes [[lastAbttPc]]. Deterministic, so two queries training
    * independently in one session produce the identical literal.
    */
  private def trainTopPc(emb: DataFrame, vecCol: String,
                         cov: Option[DataFrame])
      : (Array[Long], Long, Array[Long], Long, Int) = {
    val (vq, vq2, sArr, n, d, _) = trainTopPcRows(emb, vecCol, cov)
    (vq, vq2, sArr, n, d)
  }

  /** `cov` overrides the covariance source: pass a [[mergeMoments]]
    * table (same schema) to train past the [[CovMaxRows]] single-pass
    * cap — the driver-side fold below is double arithmetic, so the
    * lanes only need to be exact, not BIGINT-product-safe.
    */
  private def trainTopPcRows(emb: DataFrame, vecCol: String,
                             cov: Option[DataFrame] = None)
      : (Array[Long], Long, Array[Long], Long, Int,
         Array[org.apache.spark.sql.Row]) = {
    val covRows = cov.getOrElse(covarianceTable(emb, vecCol)).collect()
    require(covRows.nonEmpty, "abtt: empty embedding input")
    val d = covRows.map(_.getLong(1)).max.toInt
    val n = covRows.head.getLong(2)
    val c = Array.ofDim[Double](d, d)
    val sArr = new Array[Long](d)
    covRows.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      val cov = (r.getLong(3).toDouble * n -
        r.getLong(4).toDouble * r.getLong(5)) / (n.toDouble * n)
      c(i)(j) = cov; c(j)(i) = cov
      if (i == j) sArr(i) = r.getLong(4)
    }
    // deterministic power iteration: fixed start, fixed sweep count
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var it = 0
    while (it < 200) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "abtt: degenerate covariance (zero top eigenvalue)")
      v = w.map(_ / nrm)
      it += 1
    }
    val vq = v.map(x => math.floor(x * 1e6).toLong)
    val vq2 = vq.map(x => x * x).sum
    lastAbttPc = Some((vq, vq2))
    (vq, vq2, sArr, n, d, covRows)
  }

  /** X121 — corpus ANISOTROPY summary: trace of the centered
    * covariance (exact integer numerator over n²), the top
    * eigenvalue's Rayleigh quotient along the trained component, and
    * the anisotropy ratio λ₁·d/trace (1 = perfectly isotropic, d = all
    * variance on one axis) — the one-row diagnostic that says whether
    * [[abtt]] is worth running on a corpus at all (Mu & Viswanath
    * 2018's motivation; Ethayarajh 2019 measures the same effect).
    *
    * λ₁ follows the PSI/zipf micro-unit discipline: each covariance
    * cell's contribution v_i·C_ij·v_j is rounded to ONE micro-unit
    * BIGINT row-locally (a fixed-parenthesization double product of
    * exact integer lanes — IEEE-identical in any engine) and the sum
    * is exact integer — no float ever crosses a partition. The trace
    * numerator is exact BIGINT end to end.
    */
  def isotropy(emb: DataFrame, vecCol: String,
               cov: Option[DataFrame] = None): DataFrame = {
    val (vq, vq2, _, n, d, covRows) = trainTopPcRows(emb, vecCol, cov)
    val vLit = typedLit(vq.toSeq)
    // the training collect already holds every cell — re-enter it as a
    // local frame instead of paying a second corpus-wide explode scan
    val spark = emb.sparkSession
    val covLocal = spark.createDataFrame(
      spark.sparkContext.parallelize(covRows.toSeq, 1),
      covRows.head.schema)
    // cell lanes in DECIMAL(38,0): trained from merged moments the
    // g·n product passes BIGINT right past CovMaxRows — the merge
    // path's whole point — and a Long lane would wrap/throw. The
    // micro-unit rounding reads the SAME integer value through the
    // decimal→double cast, so the test-SF output is bit-identical.
    val cnum = col("g").cast("decimal(38,0)") * col("n") -
      col("s_i").cast("decimal(38,0)") * col("s_j")
    val vi = element_at(vLit, col("i").cast("int")).cast("double")
    val vj = element_at(vLit, col("j").cast("int")).cast("double")
    val mult = when(col("i") === col("j"), lit(1.0)).otherwise(lit(2.0))
    // n² as a DOUBLE product: the Long n*n wraps past n ~ 3e9
    val n2d = n.toDouble * n.toDouble
    val rq = round(cnum.cast("double") * vi * vj * mult /
      lit(vq2.toDouble) / lit(n2d) * lit(1000000.0))
      .cast("long")
    covLocal.agg(
        sum(when(col("i") === col("j"), cnum)
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__tn"),
        sum(rq).as("l1_micro"))
      .select(lit(n).as("n"), lit(d.toLong).as("d"),
        // trace_num stays a BIGINT output column: cast back GUARDED —
        // a corpus whose exact trace passes 2^63 aborts loudly instead
        // of wrapping (the x83/x89 discipline)
        expr(s"""CASE WHEN abs(__tn) > ${Long.MaxValue}BD THEN
                |  CAST(raise_error('isotropy: trace_num exceeds BIGINT
                | — report the DECIMAL lane instead') AS BIGINT)
                |ELSE CAST(__tn AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("trace_num"),
        col("l1_micro"))
      .select(col("n"), col("d"), col("trace_num"), col("l1_micro"),
        expr(s"round(CAST(trace_num AS DOUBLE) / $n2d, 6)")
          .as("trace"),
        expr("round(CAST(l1_micro AS DOUBLE) / 1000000.0, 6)")
          .as("lambda1"),
        expr(
          s"""CASE WHEN trace_num = 0 THEN CAST(0 AS DOUBLE)
             |ELSE round(CAST(l1_micro AS DOUBLE) / 1000000.0 * $d
             |  / (CAST(trace_num AS DOUBLE) / $n2d), 6)
             |END""".stripMargin).as("anisotropy"))
  }

  def abtt(emb: DataFrame, idCol: String, vecCol: String,
           cov: Option[DataFrame] = None): DataFrame = {
    val (vq, vq2, sArr, n, _) = trainTopPc(emb, vecCol, cov)
    // PROJECTION exactness envelope (distinct from the training one):
    // the n-scaled centered coordinate qc_i = q_i·n − s_i reaches
    // 2·maxabs·n, so qc2 = Σ qc_i² needs d·(2·maxabs·n)² ≤ 2^63 and
    // pc1_score needs d·2·maxabs·n·10⁶ ≤ 2^63. Enforced IN-PLAN per
    // row against the driver-derived |q_i| bound (zero extra corpus
    // scans — the x83/x89 raise_error discipline; conservative floor
    // chain): a row past the bound aborts loudly — rescale the vectors
    // or project in floats from moment-trained components; the integer
    // replay contract cannot hold there.
    val dDim = math.max(vq.length, 1)
    val nSafe = math.max(n, 1L)
    val qBound = math.min(
      BigInt(Long.MaxValue / dDim).bigInteger.sqrt().longValueExact() /
        (2L * nSafe),
      (BigInt(Long.MaxValue) /
        (BigInt(dDim) * 2 * nSafe * 1000000L)).toLong)
    val vLit = typedLit(vq.toSeq)
    val sLit = typedLit(sArr.toSeq)
    val q = quantize(col(vecCol))
    // centered in n-scaled integer units: qc_i = q_i*n - s_i
    val qc = zip_with(q, sLit,
      (qi, si) => qi.cast("long") * lit(n) - si)
    // width + lane guards in-plan (the jlProject rationale: a short
    // vector null-pads through zip_with and emits NULL where the
    // oracle's positional indexing computes a partial sum; an
    // over-wide coordinate would wrap the exact lanes silently)
    val d = vq.length
    def guarded(aggSql: String): String =
      s"CASE WHEN __w <> $d THEN " +
        s"CAST(raise_error('abtt: vector width <> $d') AS BIGINT) " +
        s"WHEN __m > $qBound THEN " +
        "CAST(raise_error('abtt: exact projection lanes exceed BIGINT " +
        s"at n=$n, d=$d (|q_i| bound $qBound) — rescale the vectors " +
        "or project in floats from moment-trained components') " +
        s"AS BIGINT) ELSE $aggSql END"
    emb.filter(col(vecCol).isNotNull)
      .select(col(idCol), qc.as("qc"), size(q).as("__w"),
        aggregate(q, lit(0L),
          (m, x) => greatest(m, abs(x.cast("long")))).as("__m"))
      .select(col(idCol),
        expr(guarded("aggregate(zip_with(qc, " +
          vq.mkString("array(", "L, ", "L)") +
          ", (x, y) -> x * y), 0L, (a, x) -> a + x)")).as("pc1_score"),
        expr(guarded(
          "aggregate(transform(qc, x -> x * x), 0L, (a, x) -> a + x)"))
          .as("qc2"))
      .select(col(idCol), col("pc1_score"),
        expr(s"""CASE WHEN qc2 = 0 THEN CAST(0 AS DOUBLE)
                |ELSE round(CAST(pc1_score AS DOUBLE)
                |  / (sqrt(qc2) * sqrt(${vq.map(x => x * x).sum})), 6)
                |END""".stripMargin).as("cos_pc1"))
  }

  /** Quantized centroids of the most recently trained IVF coarse
    * quantizer. Kept so the oracle SQL can inline them as literals:
    * `graft.Verify` runs every query first and dumps `oracleSql`
    * afterwards in the same JVM, so by dump time the centroids trained on
    * the driver's own sfDir are available (they are data-dependent and
    * cannot be baked in statically).
    */
  @volatile private[graft] var lastIvfCentroids: Option[Array[Array[Int]]] = None

  /** IVF-style ANN: a KMeans coarse quantizer (nlist centroids, fixed
    * seed) partitions the corpus into inverted lists; each query probes
    * its `nprobe` nearest centroids and scores only those lists.
    *
    * The scale shape: the quantizer trains DRIVER-LOCALLY on a bounded
    * sample (the standard IVF recipe — FAISS trains its coarse quantizer
    * on a sample too) and the centroids broadcast as literals, so
    * training costs zero cluster passes. The corpus is scanned once to
    * attach its list id via a row-local argmin over the centroid array
    * (a column you would persist at ingest); probe selection is likewise
    * row-local (array_sort + slice, no window shuffle); the candidate
    * join is an equi-join on list id — corpus rows shuffle at most once,
    * and only nprobe/nlist-ish of the corpus is scored per query.
    *
    * List ASSIGNMENT is integer-exact: centroids are quantized with the
    * same floor(x*1000) rule as the vectors and the squared distance is
    * computed as `n2 - 2*dot(q, qc) + |qc|^2` — all integer arithmetic,
    * so the argmin (ties broken by list id) is bit-identical in any
    * engine. That makes the whole IVF path oracle-checkable even though
    * it is approximate w.r.t. brute force (recall asserted in ScalaTest;
    * measured by the x43 audit: recall@5 ~0.74 at sf0.01, nprobe 4/8).
    */
  /** One driver-local collect of the bounded training sample — shared by
    * every trainer so a session training several quantizers over the same
    * corpus scans and transfers it once.
    */
  def collectTrainingSample(emb: DataFrame, vecCol: String,
                            trainSample: Int = 65536): Array[Array[Double]] =
    emb.select(transform(col(vecCol), _.cast("double")))
      .limit(trainSample).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Train the IVF coarse quantizer (driver-local, deterministic) on a
    * collected sample and return its quantized centroids.
    */
  def trainCoarseCentroids(sample: Array[Array[Double]], nlist: Int): Array[Array[Int]] =
    localKMeans(sample, nlist, iters = 10, seed = 42L)
      .map(_.map(x => math.floor(x * 1000).toInt))

  /** Per-row array of struct(dist, list_id) against each quantized
    * centroid literal; dist is the exact integer |q - qc|^2 (expanded
    * form — the n2/|qc|^2 terms are precomputed, dot is the native
    * DotLong loop).
    */
  private def centroidDistStructs(cents: Array[Array[Int]])(
      q: Column, n2: Column): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(v => v.toLong * v).sum
      struct(
        (n2 - lit(2L) * dot(q, typedLit(c.toSeq)) + lit(c2)).as("dist"),
        lit(i).as("list_id"))
    }: _*)

  /** Quantized corpus with its inverted-list id attached:
    * `(idCol, q, n2, list_id)` — the row-local integer-exact argmin
    * against the centroids (ties to the lower list id), shared by
    * [[ivfTopK]]'s corpus side, [[SemDedup.semDedup]]'s clustering
    * stage, and [[KMeansOp]]'s rounds. A column you would persist at
    * ingest in a real pipeline. Runs the native fused-loop
    * [[graft.functions.CentroidArgmin]] — the struct-array twin goes
    * quadratic in codegen size with nlist.
    */
  def assignLists(emb: DataFrame, idCol: String, vecCol: String,
                  cents: Array[Array[Int]]): DataFrame =
    prepared(emb, idCol, vecCol)
      .withColumn("list_id",
        graft.functions.VectorOps.centroid_argmin(col("q"), cents)
          .getField("list_id"))

  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              trainSample: Int = 65536): DataFrame = {
    val qCents = trainCoarseCentroids(
      collectTrainingSample(emb, vecCol, trainSample), nlist)
    lastIvfCentroids = Some(qCents)
    val distStructs = centroidDistStructs(qCents) _

    // corpus side: attach inverted-list id once
    val corpus = assignLists(emb, idCol, vecCol, qCents)

    // query side: nprobe nearest centroids, row-local (sorted by
    // (dist, list_id), same ordering the old window form used)
    val qs = prepared(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "qid").withColumnRenamed("q", "qq")
      .withColumnRenamed("n2", "qn2")
    val probes = qs
      .select(col("qid"), col("qq"), col("qn2"),
        explode(slice(array_sort(distStructs(col("qq"), col("qn2"))), 1, nprobe))
          .as("probe"))
      .select(col("qid"), col("qq"), col("qn2"), col("probe.list_id").as("list_id"))

    val scored = corpus.join(broadcast(probes), Seq("list_id"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sub-quantizer codebooks of the most recently trained PQ encoder —
    * same oracle-inlining contract as [[lastIvfCentroids]]:
    * `lastPqCodebook.get(m)(j)` = quantized centroid `j` of subspace `m`.
    */
  @volatile private[graft] var lastPqCodebook: Option[Array[Array[Array[Int]]]] = None

  /** Product-quantization ANN (compressed-domain exhaustive search): the
    * vector is split into `numSub` subspaces, each sub-vector is replaced
    * by the id of its nearest sub-centroid (`codes` per subspace, trained
    * driver-locally on a bounded sample like [[ivfTopK]]'s quantizer), and
    * a query scores a corpus row by table lookup — `adc = sum_m
    * qtab_m[code_m]` where `qtab_m[j] = <q_sub_m, centroid_mj>` is
    * precomputed once per query.
    *
    * The scale story is COMPRESSION, not pruning: corpus rows carry
    * `numSub` small ints (4 codes here ~ 4 bytes) instead of the full
    * vector (64 x 4 bytes), so the exhaustive scan touches 64x less data
    * and the per-pair cost is `numSub` array lookups instead of a
    * dim-wide dot product. Queries broadcast with their lookup tables;
    * the corpus never shuffles (the deliberate BroadcastNestedLoopJoin is
    * the scan); per-query top-k goes through the same rank window as the
    * other ANN paths (WindowGroupLimit keeps k rows per task). Compose
    * with [[ivfTopK]]'s inverted lists for IVF-PQ when pruning is also
    * wanted.
    *
    * Everything after training is integer-exact: code ASSIGNMENT is the
    * same expanded-|x-c|^2 argmin as IVF (ties to the lower code id) and
    * ADC scores are integer sums, so assignment, scoring, and ranking
    * (ties by candidate id) are bit-identical in any engine — fully
    * oracle-checkable even though ADC is approximate w.r.t. true cosine
    * (recall asserted in ScalaTest; measured by the x43 audit: recall@5
    * ~0.66 at sf0.01, 16x64 codebook).
    */
  /** Train the PQ sub-quantizer codebooks driver-locally on a bounded
    * sample (deterministic: fixed seeds per subspace). In a real pipeline
    * this is a persisted artifact trained once per corpus version —
    * callers that run several PQ queries should train once and pass the
    * codebook in (see [[pqTopK]]'s `codebook` parameter).
    */
  def trainPqCodebook(emb: DataFrame, vecCol: String, numSub: Int, codes: Int,
                      trainSample: Int = 65536): Array[Array[Array[Int]]] = {
    val train = collectTrainingSample(emb, vecCol, trainSample)
    val dim = train(0).length
    require(dim % numSub == 0, s"dim $dim not divisible by $numSub subspaces")
    val sub = dim / numSub
    Array.tabulate(numSub) { mi =>
      localKMeans(train.map(_.slice(mi * sub, (mi + 1) * sub)), codes,
        iters = 10, seed = 42L + mi)
        .map(_.map(x => math.floor(x * 1000).toInt))
    }
  }

  def pqTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, numSub: Int = 4, codes: Int = 16,
             trainSample: Int = 65536,
             codebook: Option[Array[Array[Array[Int]]]] = None): DataFrame = {
    val cb = codebook.getOrElse(
      trainPqCodebook(emb, vecCol, numSub, codes, trainSample))
    require(cb.length == numSub && cb.forall(_.length == codes),
      s"codebook shape ${cb.length}x${cb.headOption.fold(0)(_.length)} != ${numSub}x$codes")
    lastPqCodebook = Some(cb)

    // corpus: encode once via the native PqEncode argmin, keep ONLY the
    // codes (the compressed layout you would persist at ingest)
    val coded = emb.select(col(idCol),
      graft.functions.VectorOps.pq_encode(
        quantize(col(vecCol)), cb).as("codes"))

    // queries: flat ADC lookup table per query row (native PqTable —
    // entry m*codes+j is <sv_m, centroid_mj>)
    val qtabs = queries.select(col(idCol).as("qid"),
      graft.functions.VectorOps.pq_table(
        quantize(col(vecCol)), cb).as("qtab"))

    val scored = coded.crossJoin(broadcast(qtabs))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        (0 until numSub).map(mi =>
          element_at(col("qtab"),
            lit(mi * codes) + element_at(col("codes"), mi + 1) + 1))
          .reduce(_ + _).as("adc"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Trained (coarse centroids, residual codebook) of the most recent
    * IVF-PQ run — oracle-inlining contract as above.
    */
  @volatile private[graft] var lastIvfPq: Option[(Array[Array[Int]], Array[Array[Array[Int]]])] = None

  /** Train the residual PQ codebook for IVF-PQ: assign each sample vector
    * to its coarse list (same integer argmin the corpus uses), subtract
    * the list centroid, and k-means each residual subspace. Deterministic
    * like the other trainers.
    */
  def trainResidualCodebook(sample: Array[Array[Double]],
                            coarse: Array[Array[Int]], numSub: Int,
                            codes: Int): Array[Array[Array[Int]]] = {
    val train = sample
    val dim = train(0).length
    require(dim % numSub == 0, s"dim $dim not divisible by $numSub subspaces")
    val sub = dim / numSub
    // integer residuals: floor-quantize the vector (the corpus rule),
    // argmin by exact integer distance (ties to the lower list id),
    // subtract the quantized centroid
    val residuals = train.map { v =>
      val q = v.map(x => math.floor(x * 1000).toInt)
      var best = 0; var bestD = Long.MaxValue
      var li = 0
      while (li < coarse.length) {
        val c = coarse(li)
        var d = 0L; var i = 0
        while (i < dim) { val t = (q(i) - c(i)).toLong; d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = li }
        li += 1
      }
      val c = coarse(best)
      Array.tabulate(dim)(i => (q(i) - c(i)).toDouble)
    }
    Array.tabulate(numSub) { mi =>
      localKMeans(residuals.map(_.slice(mi * sub, (mi + 1) * sub)), codes,
        iters = 10, seed = 4242L + mi)
        // residuals are already in quantized units — round, don't rescale
        .map(_.map(x => math.floor(x).toInt))
    }
  }

  /** IVF-PQ — the composed FAISS recipe: the coarse quantizer prunes
    * (each query scores only its `nprobe` nearest inverted lists, exactly
    * [[ivfTopK]]'s shape) and residual PQ compresses (corpus rows carry
    * one list id + `numSub` codes; scoring is table lookup, exactly
    * [[pqTopK]]'s shape — but over residuals `x - centroid(list)`, which
    * are much smaller than the vectors, so the same codebook budget
    * quantizes far more finely).
    *
    * Candidates are ranked by approximate squared L2 distance
    * `||q - c_list - pq(r)||^2 = ||qr||^2 - 2*sum_m qtab_m[code] +
    * sum_m |cent_m,code|^2` where `qr = q - c_list` is the query's
    * residual AGAINST THE PROBED LIST (computed per (query, probe) by the
    * native [[graft.functions.VecSubCentroid]]). All terms are exact
    * integers, ties break to the lower candidate id — fully
    * oracle-checkable, recall asserted in ScalaTest (measured by the
    * x43 audit: recall@5 ~0.52 at sf0.01 — the compounded coarse-prune
    * + residual-ADC trade).
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int, nlist: Int = 8, nprobe: Int = 4,
                numSub: Int = 16, codes: Int = 64, trainSample: Int = 65536,
                trained: Option[(Array[Array[Int]], Array[Array[Array[Int]]])] = None)
      : DataFrame = {
    val (coarse, cb) = trained.getOrElse {
      val sample = collectTrainingSample(emb, vecCol, trainSample)
      val cc = trainCoarseCentroids(sample, nlist)
      (cc, trainResidualCodebook(sample, cc, numSub, codes))
    }
    lastIvfPq = Some((coarse, cb))
    val vo = graft.functions.VectorOps

    // coarse distance structs for the PROBE side (nprobe sorted slice
    // needs the whole array; the query set is tiny so the declarative
    // tree is fine there)
    def distStructs(q: Column, n2: Column): Column =
      array(coarse.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(v => v.toLong * v).sum
        struct(
          (n2 - lit(2L) * dot(q, typedLit(c.toSeq)) + lit(c2)).as("dist"),
          lit(i).as("list_id"))
      }: _*)

    // flat |cent_m,code|^2 literal for the distance correction term
    val c2Flat = cb.flatMap(_.map(c => c.map(v => v.toLong * v).sum)).toSeq

    // corpus: one list id + numSub residual codes per row — the
    // compressed inverted-file layout you would persist at ingest
    // (native fused-loop assignment: this runs once per corpus row)
    val corpus = assignLists(emb, idCol, vecCol, coarse)
      .withColumn("codes",
        vo.pq_encode(vo.vec_sub_centroid(col("q"), col("list_id"), coarse), cb))
      .select(col(idCol), col("list_id"), col("codes"))

    // queries: nprobe nearest lists, then per probed list the residual's
    // ADC table and squared norm
    val qs = prepared(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "qid").withColumnRenamed("q", "qq")
      .withColumnRenamed("n2", "qn2")
    val probes = qs
      .select(col("qid"), col("qq"),
        explode(slice(array_sort(distStructs(col("qq"), col("qn2"))), 1, nprobe))
          .as("probe"))
      .withColumn("list_id", col("probe.list_id"))
      .withColumn("qr", vo.vec_sub_centroid(col("qq"), col("list_id"), coarse))
      .select(col("qid"), col("list_id"),
        vo.pq_table(col("qr"), cb).as("qtab"),
        dot(col("qr"), col("qr")).as("qrn2"))

    val scored = corpus.join(broadcast(probes), Seq("list_id"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        (col("qrn2")
          - lit(2L) * (0 until numSub).map(mi =>
              element_at(col("qtab"),
                lit(mi * codes) + element_at(col("codes"), mi + 1) + 1))
            .reduce(_ + _)
          + (0 until numSub).map(mi =>
              element_at(typedLit(c2Flat),
                lit(mi * codes) + element_at(col("codes"), mi + 1) + 1))
            .reduce(_ + _)).as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** EXACT RE-RANK (refine) stage — the standard FAISS recipe for
    * recovering recall from a compressed-domain search: take the top-R
    * candidates an approximate tier produced (`cands`: (qid, cid) rows,
    * R per query), join back the RAW vectors, score them exactly, and
    * keep the true top-k of each candidate set. ADC compression error
    * then cannot cost recall — only candidate GENERATION can (coarse
    * pruning that never surfaced a true neighbor), so recall@k equals
    * the candidate lists' coverage of the exact top-k.
    *
    * Shape at 100 TB: the candidate list is queries × R rows —
    * audit-sized, so it BROADCASTS into the corpus scan twice (once to
    * fetch candidate vectors, once for the query vectors); the corpus
    * is scanned, never shuffled, and only |Q| · R exact dot products run
    * (vs |Q| · corpus for brute force). Works over any candidate source
    * ([[ivfPqTopK]], [[pqTopK]], [[lshMultiProbeTopK]]).
    *
    * Scoring is the same quantized-integer cosine as [[bruteForceTopK]]
    * (ties to the lower candidate id), so the refined ranking is
    * bit-identical in any engine — fully oracle-checkable. Measured by
    * the x43 audit at sf0.01: ivf_pq_refine (nprobe 6/8, R = 50)
    * recall@5 = 0.90 vs 0.52 for raw IVF-PQ ADC at nprobe 4.
    */
  def refineExact(emb: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, cands: DataFrame): DataFrame = {
    val corpus = prepared(emb, idCol, vecCol)
    val qs = prepared(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "qid").withColumnRenamed("q", "qq")
      .withColumnRenamed("n2", "qn2")
    val pairs = cands.select(col("qid"), col("cid"))
    val scored = corpus.withColumnRenamed(idCol, "cid")
      .join(broadcast(pairs), Seq("cid"))
      .join(broadcast(qs), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** MULTI-PROBE sign-LSH (Lv et al. 2007's multi-probe idea applied to
    * the sign-bucket tier): each query probes every bucket within
    * Hamming distance `probeDist` of its own — the buckets a near
    * neighbor most likely fell into when a marginal dimension flipped
    * its sign. probeDist 0 is [[lshTopK]]; each +1 widens candidate
    * coverage by C(bits, d) buckets of the 2^bits total.
    *
    * The shape is unchanged from [[lshTopK]]: the probe set explodes
    * QUERY-side (queries × Σ C(bits, d) rows — tiny, broadcast), the
    * corpus keeps exactly one scan-side bucket id and shuffles never;
    * each corpus row lives in one bucket so no candidate dedup is
    * needed. Measured by the x43 audit at sf0.01 (6 bits, random
    * embeddings): probeDist 2 lifts recall@5 from 0.08 to 0.56 while
    * scoring ~22/64 of the corpus per query — a real recovery, but at
    * this dimensionality the sign-bucket family stays a cost-first
    * tier: when recall matters at a comparable scan fraction, use
    * [[ivfTopK]] (0.74) or [[refineExact]] over [[ivfPqTopK]] (0.90).
    */
  def lshMultiProbeTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, bits: Int = 16,
                        probeDist: Int = 2): DataFrame = {
    require(bits >= 1 && bits <= 24, s"bits must be in [1, 24]: $bits")
    // probeDist caps at 4: the probe set is Σ C(bits, d) masks PER QUERY
    // and must stay inside the 'tiny, broadcast' shape — at bits=24,
    // d<=4 is 12,951 masks; beyond that the probe explosion approaches
    // the full 2^bits bucket space and the tier stops being a prune
    require(probeDist >= 0 && probeDist <= math.min(bits, 4),
      s"probeDist must be in [0, ${math.min(bits, 4)}]: $probeDist")
    // masks generated combinatorially (choose d of bits positions for
    // d <= probeDist) — never a 2^bits scan
    val masks: Seq[Long] = {
      def choose(start: Int, remaining: Int): Seq[Long] =
        if (remaining == 0) Seq(0L)
        else (start to bits - remaining).flatMap { p =>
          choose(p + 1, remaining - 1).map(m => m | (1L << p))
        }
      (0 to probeDist).flatMap(d => choose(0, d))
    }
    val corpus = emb.select(col(idCol), quantize(col(vecCol)).as("q"),
        signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", sqNorm(col("q")))
    val qs = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"),
        signBucket(col(vecCol), bits).as("qbucket"))
      .withColumn("qn2", sqNorm(col("qq")))
    val probes = qs
      .select(col("qid"), col("qq"), col("qn2"), col("qbucket"),
        explode(typedLit(masks)).as("mask"))
      .select(col("qid"), col("qq"), col("qn2"),
        col("qbucket").bitwiseXOR(col("mask")).as("bucket"))
    val scored = corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic driver-local Lloyd's with k-means++ seeding — the
    * coarse-quantizer trainer for [[ivfTopK]]. O(sample x nlist x dim)
    * per iteration on the driver; never touches the cluster.
    */
  private[ops] def localKMeans(vecs: Array[Array[Double]], k: Int, iters: Int,
                               seed: Long): Array[Array[Double]] = {
    require(vecs.nonEmpty && vecs.length >= k, s"need >= $k training vectors")
    val dim = vecs(0).length
    val rnd = new java.util.Random(seed)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val cents = Array.ofDim[Array[Double]](k)
    cents(0) = vecs(rnd.nextInt(vecs.length)).clone()
    val d2 = Array.fill(vecs.length)(Double.MaxValue)
    for (c <- 1 until k) {
      var i = 0
      while (i < vecs.length) {
        val d = sq(vecs(i), cents(c - 1)); if (d < d2(i)) d2(i) = d; i += 1
      }
      var r = rnd.nextDouble() * d2.sum
      var idx = 0
      while (idx < vecs.length - 1 && r > d2(idx)) { r -= d2(idx); idx += 1 }
      cents(c) = vecs(idx).clone()
    }
    val assign = Array.fill(vecs.length)(0)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < vecs.length) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val d = sq(vecs(i), cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best; i += 1
      }
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0)
      i = 0
      while (i < vecs.length) {
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += vecs(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        // empty cluster keeps its previous centroid
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
    }
    cents
  }

  /** Bucketed ANN: score only corpus vectors in the query's sign bucket.
    * Recall < 1 by construction; the bucket join replaces the cross
    * product, which is what survives a 100x corpus scale-up. The x43
    * audit measures recall@5 ~0.08 at sf0.01 with 6 bits on random
    * embeddings — sign-bucketing is the cheapest and the most
    * aggressive tier; [[lshMultiProbeTopK]] is the same shape with the
    * recall recovery dial (0.56 at probeDist 2).
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 16): DataFrame = {
    val corpus = emb.select(col(idCol), quantize(col(vecCol)).as("q"),
        signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", sqNorm(col("q")))
    val qs = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"),
        signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("qn2", sqNorm(col("qq")))
    val scored = corpus.join(broadcast(qs), Seq("bucket"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** X43 — ANN recall audit: measure each approximate method's recall@k
    * against the exact top-k on the SAME corpus and queries, turning the
    * recall trade the ANN docstrings describe into a tracked number.
    * Inputs are (method name, top-k result) pairs and the exact top-k —
    * each carrying (qid, cid) rows. Per method: hits = |approx ∩ exact|
    * via a left-semi join; recall_ppm = hits · 10^6 div |exact| — exact
    * integer arithmetic, no float seam, so the audit itself is
    * oracle-checkable end to end.
    *
    * Shape at 100 TB: each intersection is a semi join of two top-k
    * lists (queries × k rows — audit-sized, not corpus-sized; AQE
    * broadcasts them); the method pipelines behind the inputs keep their
    * own plans. Callers should pin (localCheckpoint) the exact list so
    * the brute-force pass runs once, not once per method.
    */
  def recallAudit(methods: Seq[(String, DataFrame)],
                  exact: DataFrame): DataFrame = {
    require(methods.nonEmpty, "need at least one method to audit")
    // an empty exact list makes recall undefined — Spark's integer div
    // would yield NULL where DuckDB's // raises, so refuse loudly instead
    // of letting the engines diverge on a degenerate audit
    require(!exact.isEmpty,
      "recallAudit: exact top-k list is empty — nothing to measure against")
    val truth = exact.select(col("qid"), col("cid"))
    val hits = methods.map { case (name, df) =>
      df.select(col("qid"), col("cid"))
        .join(truth, Seq("qid", "cid"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(name).as("method"), col("n_hits"))
    }.reduce(_ unionByName _)
    hits.crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
      .select(col("method"), col("n_hits"), col("n_truth"),
        expr("n_hits * 1000000 div n_truth").as("recall_ppm"))
  }
}
