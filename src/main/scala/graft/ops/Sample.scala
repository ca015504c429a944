package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X6 — deterministic hash sampling for training-data pipelines.
  *
  * `rand()`-based sampling is nondeterministic across retries and engines;
  * here a row is kept iff the first 8 hex chars of md5(key ++ seed) fall
  * below floor(fraction * 2^32) — fixed-width lowercase hex compares
  * lexicographically = numerically, so the predicate is reproducible in
  * any engine with md5 (the DuckDB oracle runs the identical expression),
  * stable under retries/replays, and consistent across shards with no
  * coordination: a pure scan-side filter that pushes work to zero at
  * 100 TB (rejected rows never leave the scan).
  */
object Sample {

  /** 8-hex-char threshold for a [0,1) fraction. */
  def threshold(fraction: Double): String = {
    require(fraction >= 0 && fraction < 1, s"fraction must be in [0,1): $fraction")
    f"${math.floor(fraction * 4294967296.0).toLong}%08x"
  }

  /** The shared reproducibility primitive: first 8 hex chars of
    * md5(key ++ seed). Non-private so [[Curate]] assigns splits/quotas
    * off the IDENTICAL expression (the oracles and the split-stability
    * guarantee both depend on the two never diverging).
    */
  private[ops] def bucket(keyCol: Column, seed: String): Column =
    substring(md5(concat(keyCol.cast("string"), lit(seed))), 1, 8)

  /** Uniform deterministic sample. */
  def uniform(df: DataFrame, keyCol: String, fraction: Double,
              seed: String = ""): DataFrame =
    df.filter(bucket(col(keyCol), seed) < lit(threshold(fraction)))

  /** Weighted deterministic Bernoulli sample: row kept with probability
    * `fraction * weight / maxWeight` — documents weighted by length,
    * domains by trust score, etc. The comparison is EXACT integer
    * arithmetic (`hash * maxWeight < fraction * 2^32 * weight`, both
    * sides bigint), so unlike the float `u^(1/w)` reservoir-key trick it
    * is bit-reproducible in any engine. Still a pure scan-side filter:
    * rejected rows never leave the scan.
    *
    * `maxWeight` is a corpus constant the caller supplies (at 100 TB you
    * know your weight cap; deriving it would cost an extra aggregate
    * pass). Weights above it keep the row always — clamped, not an error.
    */
  def weighted(df: DataFrame, keyCol: String, weightCol: String,
               fraction: Double, maxWeight: Long,
               seed: String = ""): DataFrame = {
    require(fraction >= 0 && fraction < 1, s"fraction must be in [0,1): $fraction")
    require(maxWeight >= 1, s"maxWeight must be >= 1: $maxWeight")
    val hv = conv(bucket(col(keyCol), seed), 16, 10).cast("bigint")
    val bound = lit(math.floor(fraction * 4294967296.0).toLong) *
      least(col(weightCol).cast("bigint"), lit(maxWeight))
    df.filter(hv * lit(maxWeight) < bound)
  }

  /** X31 — deterministic MIXTURE sampling: downsample each listed domain
    * so the kept corpus matches target mixture proportions (the
    * source-mixing step of every multi-corpus training set). Target
    * weights are integer PARTS-PER-MILLION; the achievable total is
    * maximized (T = min_d floor(n_d·10^6 / w_d) — the scarcest domain is
    * kept whole and every other domain Bernoulli-downsamples toward its
    * share). Unlisted domains are dropped.
    *
    * Determinism: per-domain keep-cuts are computed ONCE in exact BigInt
    * arithmetic — cut_d = floor(2^32·w_d·T / (10^6·n_d)) — and compared
    * against the 32-bit md5 bucket as plain BIGINTs, so any engine
    * reproduces the row set bit-for-bit (the DuckDB oracle re-derives the
    * same cuts in HUGEINT). Proportions are Bernoulli-approximate, counts
    * are not coordinated — which is exactly what makes the filter a pure
    * scan-side predicate with no shuffle at 100 TB.
    *
    * The per-domain count aggregate is domain-cardinality-sized (a dim
    * table, collected once — same bounded-driver contract as the IVF
    * trainer); at scale you run it once per corpus version and reuse.
    *
    * LOUD CARDINALITY GUARD: the per-domain keep-cuts compile into an
    * OR-chain predicate over every listed domain — the intended use is
    * dozens-to-hundreds of curated sources. Web-domain cardinality
    * (millions of hosts) would blow up the driver map AND walk off the
    * same linear-codegen JIT cliff the centroid-literal work documented,
    * so past [[MaxDomains]] the call fails with a message instead of
    * degrading silently (bucket the long tail into a catch-all source,
    * or pre-aggregate domains upstream).
    */
  val MaxDomains = 10000

  def mixture(df: DataFrame, keyCol: String, domainCol: String,
              weightsPpm: Map[String, Long], seed: String = ""): DataFrame = {
    require(weightsPpm.nonEmpty, "need at least one domain weight")
    require(weightsPpm.size <= MaxDomains,
      s"mixture() compiles a per-domain predicate: ${weightsPpm.size} domains " +
        s"exceeds the $MaxDomains cap — use mixtureJoined() (weights as a " +
        "broadcast dim table, identical cuts) or bucket the long tail into " +
        "a catch-all source upstream")
    require(weightsPpm.values.forall(_ > 0), s"weights must be > 0: $weightsPpm")
    val domains = weightsPpm.keys.toSeq.sorted
    val counts = df.filter(col(domainCol).isin(domains: _*))
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = domains.filter(d => counts.getOrElse(d, 0L) > 0L)
    require(present.nonEmpty, s"no listed domain present in $domainCol")
    val t = present.map(d => BigInt(counts(d)) * 1000000L / weightsPpm(d)).min
    val cuts = present.map { d =>
      d -> (BigInt(4294967296L) * weightsPpm(d) * t /
        (BigInt(1000000L) * counts(d))).toLong
    }.toMap
    val hv = conv(bucket(col(keyCol), seed), 16, 10).cast("bigint")
    val pred = present.map { d =>
      col(domainCol) === d &&
        (if (cuts(d) >= 4294967296L) lit(true) else hv < lit(cuts(d)))
    }.reduce(_ || _)
    df.filter(pred)
  }

  /** X55 — the JOIN-BASED mixture form, [[mixture]]'s scalable sibling
    * for web-domain cardinality: target weights arrive as a DIM TABLE
    * (`weights`: one row per listed domain with an integer `w_ppm`
    * column) instead of a driver map, the keep-cuts derive fully
    * DISTRIBUTED in DECIMAL(38,0) arithmetic (the HUGEINT twin of the
    * driver's BigInt — T = min_d floor(n_d·10^6 / w_d), cut_d =
    * floor(2^32·w_d·T / (10^6·n_d)); every intermediate is <= ~4·10^33,
    * well inside 38 digits), and rows keep via a BROADCAST equi-join on
    * the domain-cardinality cut table. No OR-chain predicate, no driver
    * map, no [[MaxDomains]] cap — the corpus still never shuffles (the
    * cut table broadcasts; at cardinality where even that table won't
    * broadcast, bucket the long tail upstream as [[mixture]]'s guard
    * message says).
    *
    * Bit-identical to [[mixture]] on the same weights/seed (spec-pinned
    * and oracle-checked against the identical HUGEINT SQL), with two
    * deliberate contract differences: unlisted domains drop via the
    * inner join rather than a compiled predicate, and a corpus with NO
    * listed domain present yields an empty result instead of a driver
    * `require` (there is no driver-side count map to inspect).
    */
  def mixtureJoined(df: DataFrame, keyCol: String, domainCol: String,
                    weights: DataFrame, seed: String = ""): DataFrame = {
    // a repeated domain row would silently DUPLICATE every kept corpus
    // row of that domain through the cut join — fail loudly instead
    // (one dim-table-sized probe, the embeddingDupPairs guard style)
    val dup = weights.groupBy(col(domainCol)).agg(count(lit(1)).as("k"))
      .filter(col("k") > 1).select(col(domainCol)).limit(1).collect()
    require(dup.isEmpty,
      s"domain '${dup.headOption.map(_.get(0)).getOrElse("")}' appears " +
        "more than once in the weights dim table — each listed domain " +
        "must have exactly one w_ppm row")
    val w = weights.select(col(domainCol),
      col("w_ppm").cast("decimal(38,0)").as("w"))
    val counts = df.join(w.select(col(domainCol)), Seq(domainCol), "left_semi")
      .groupBy(col(domainCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
    val cw = counts.join(w, Seq(domainCol))
    // T is one row; `div` on decimals is Spark's exact integral quotient
    val t = cw.agg(min(expr(
      "CAST(n * 1000000 AS DECIMAL(38,0)) div w")).as("t"))
    val cuts = cw.crossJoin(broadcast(t))
      .select(col(domainCol), expr(
        """CAST(CAST(4294967296 AS DECIMAL(38,0)) * w
          |  * CAST(t AS DECIMAL(38,0)) AS DECIMAL(38,0))
          |div CAST(1000000 * n AS DECIMAL(38,0))""".stripMargin).as("cut"))
    val hv = conv(bucket(col(keyCol), seed), 16, 10).cast("bigint")
    df.join(broadcast(cuts), Seq(domainCol))
      .filter(col("cut") >= lit(4294967296L) || hv < col("cut"))
      .drop("cut")
  }

  /** X40 — temperature-flattened mixture weights: target share of domain
    * d ∝ n_d^alpha (alpha in permille; 1000 = natural proportions, 0 =
    * uniform, ~300 = the multilingual-balancing flattening XLM-R made
    * standard). Feed the result to [[mixture]]: high-resource domains
    * downsample toward the flattened share, the scarcest binding domain
    * stays whole.
    *
    * DRIVER-SIDE derivation on the domain-count dim table — deliberately
    * not SQL: `pow` is not an IEEE-core op (libm implementations differ
    * in the last ulp), so deriving weights inside two engines could
    * disagree. Derived once, the integer ppm weights are engine-neutral
    * and inline into the oracle like the IVF centroids do. alpha = 1000
    * returns weights exactly proportional to counts, making every domain
    * binding in [[mixture]] (the whole corpus is kept) — spec-pinned.
    */
  def temperatureWeightsPpm(counts: Map[String, Long],
                            alphaPermille: Long): Map[String, Long] = {
    require(alphaPermille >= 0 && alphaPermille <= 1000,
      s"alphaPermille must be in [0, 1000]: $alphaPermille")
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      s"counts must be non-empty and positive: $counts")
    require(counts.size <= MaxDomains,
      s"temperatureWeightsPpm feeds mixture()'s per-domain predicate: " +
        s"${counts.size} domains exceeds the $MaxDomains cap")
    if (alphaPermille == 1000L) counts // exact: weights ∝ counts, so every
    else {                             // domain binds and nothing is dropped
      val a = alphaPermille / 1000.0
      val pows = counts.map { case (d, n) => d -> math.pow(n.toDouble, a) }
      val mx = pows.values.max
      pows.map { case (d, p) =>
        d -> math.max(1L, math.round(p / mx * 1000000.0))
      }
    }
  }

  /** X57 — TOKEN-BUDGET sampling: keep documents in deterministic hash
    * order until a token budget fills — the "give me 1B tokens" op every
    * training run starts with, where the unit that matters is tokens,
    * not documents. A document is kept iff the total tokens of all
    * documents BEFORE it (in md5(key||seed) order, ties by key) is
    * still under the budget — the greedy prefix, so the kept set always
    * includes the budget-crossing document and is stable under
    * re-execution, retries, and engine choice.
    *
    * THE PREFIX SUM IS TWO-PASS, NEVER GLOBAL: a single unpartitioned
    * running-sum window would funnel the corpus through one task. The
    * hash order is exploited instead — rows are grouped by their first
    * two hash hex chars (256 contiguous ranges of the order), per-group
    * token subtotals make a 256-row table whose own running sum gives
    * each group's starting offset (driver-trivial), and the within-group
    * running sum is a window PARTITIONED BY the group. cum_before =
    * group offset + within-group prefix. The DuckDB oracle is the
    * NAIVE global-window form, so the driver's hash gate re-proves the
    * distributed decomposition equal to the spec every round (the x48
    * discipline).
    *
    * Output: (keyCol, n_tokens, cum_before) for kept documents.
    */
  def tokenBudget(df: DataFrame, keyCol: String, textCol: String,
                  budgetTokens: Long, seed: String = ""): DataFrame = {
    require(budgetTokens >= 1, s"budget must be >= 1: $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol),
        md5(concat(col(keyCol).cast("string"), lit(seed))).as("h"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("grp", substring(col("h"), 1, 2))
    val offsets = base.groupBy(col("grp"))
      .agg(sum(col("n_tokens")).as("gtot"))
      .withColumn("goff", coalesce(
        sum(col("gtot")).over(Window.orderBy(col("grp"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("grp"), col("goff"))
    val inGrp = Window.partitionBy(col("grp"))
      .orderBy(col("h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq("grp"))
      .withColumn("cum_before",
        col("goff") + coalesce(sum(col("n_tokens")).over(inGrp), lit(0L)))
      .filter(col("cum_before") < budgetTokens)
      .select(col(keyCol), col("n_tokens"), col("cum_before"))
  }

  /** X70 — deterministic EPOCH SHUFFLE: the training-order pass every
    * run does after curation — assign each document a shard and a dense
    * 0-based position within the shard, both pure functions of
    * (key, seed), so the training order is reproducible across retries,
    * engines, and re-runs, and changes completely with the seed (the
    * next epoch is `seed+1`). Shard = the document's 2-hex md5 prefix
    * mod numShards; within-shard order = the md5 order itself.
    *
    * THE RANK IS TWO-PASS, NEVER PER-SHARD-GLOBAL (the [[tokenBudget]]
    * decomposition): a row_number window partitioned by shard alone
    * would funnel corpus/numShards rows through one task — 1.5 TB per
    * task at 100 TB with 64 shards. Instead rows group by their 2-hex
    * prefix (256 contiguous ranges of the md5 order, each belonging to
    * exactly one shard), per-group counts make a 256-row offset table
    * (running sum within shard, ordered by prefix — driver-trivial),
    * and the within-group rank is a window PARTITIONED BY the prefix.
    * pos = group offset + within-group rank. The DuckDB oracle is the
    * NAIVE per-shard global window, so the hash gate re-proves the
    * decomposition equal to the spec every round (the x48 discipline).
    *
    * Output: (keyCol, shard, pos); positions are dense 0..n_s-1 within
    * each shard. Writing `partitionBy(shard)` + `sortWithinPartitions
    * (pos)` then streams each shard in order with no global sort.
    */
  def epochShuffle(df: DataFrame, keyCol: String, numShards: Int,
                   seed: String = ""): DataFrame = {
    require(numShards >= 1 && numShards <= 256,
      s"numShards must be in [1, 256] (shards are 2-hex-prefix unions): " +
        s"$numShards")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol),
        md5(concat(col(keyCol).cast("string"), lit(seed))).as("h"))
      .withColumn("grp", substring(col("h"), 1, 2))
      .withColumn("shard",
        (conv(col("grp"), 16, 10).cast("int") % numShards).cast("int"))
    val offsets = base.groupBy(col("shard"), col("grp"))
      .agg(count(lit(1)).as("gc"))
      .withColumn("goff", coalesce(
        sum(col("gc")).over(Window.partitionBy(col("shard"))
          .orderBy(col("grp"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("grp"), col("goff"))
    val inGrp = Window.partitionBy(col("grp"))
      .orderBy(col("h"), col(keyCol))
    base.join(broadcast(offsets), Seq("grp"))
      .withColumn("pos",
        col("goff") + row_number().over(inGrp).cast("long") - 1L)
      .select(col(keyCol), col("shard"), col("pos"))
  }

  /** Stratified deterministic sample: per-stratum fractions with a default
    * for unlisted strata. The threshold is a row-local CASE — still a pure
    * scan-side filter.
    */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 fractions: Map[String, Double], default: Double,
                 seed: String = ""): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(default))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(threshold(f))).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), seed) < thr)
  }

  /** X127 — word-frequency subsampling (Mikolov et al. 2013's word2vec
    * recipe): each token OCCURRENCE of word w survives with probability
    * p(w) = min(1, √(t/f(w)) + t/f(w)), f(w) = corpus frequency ratio —
    * the standard high-frequency damping for embedding-training corpora
    * (stopword occurrences mostly drop, rare words always keep,
    * expectation-preserving in between). `tPpm` is the t threshold in
    * parts-per-million (the classic t = 10⁻⁵ is tPpm = 10).
    *
    * DETERMINISTIC per occurrence: the keep decision hashes
    * (doc_id|position|seed) through the [[bucket]] md5 convention
    * against an integer cut per word — `round(p·2³²)` where p is ONE
    * fixed-parenthesization double from exact BIGINT lanes (IEEE sqrt
    * and divide are correctly rounded), so any engine reproduces the
    * kept set bit-for-bit, and re-runs are stable (the reservoir-free
    * analogue of [[weighted]]).
    *
    * Shape at 100 TB: the corpus pays the token explode twice — once
    * to build the vocabulary-sized cut table, once as the probe side
    * of the word-keyed join (a caller running several passes persists
    * the token table upstream); the corpus-total scalar folds from the
    * vocabulary table (vocab-sized, NOT a third corpus pass) and rides
    * a 1-row broadcast; the per-doc regroup is the second keyed
    * exchange. No single-partition stage. Returns (idCol, n_tokens,
    * n_kept, sub_text) DENSE over non-null-text input — a doc whose
    * every occurrence dropped keeps an empty sub_text rather than
    * vanishing (null-text docs are excluded, the x126 rule).
    */
  /** (idCol, pos, w) token occurrences of a space-tokenized corpus —
    * the probe grain [[freqSubsample]] and its streaming twin share.
    */
  private[graft] def tokenize(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("w"))

  def freqSubsample(docs: DataFrame, idCol: String, textCol: String,
                    tPpm: Long, seed: String = ""): DataFrame = {
    val toks = tokenize(docs, idCol, textCol)
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // vocab-sized; feeds the total fold AND
    // the cut projection — pin so the corpus explode backing it runs
    // once, not twice
    subsampleTokens(toks, idCol, counts, tPpm, seed)
  }

  /** The word2vec keep decision + per-doc reassembly over an
    * already-built (w, c) frequency table — the kernel the streaming
    * twin calls with ACCUMULATED counts (one code path, so its "single
    * batch equals the batch operator" contract cannot drift). The
    * corpus total folds from the vocab-sized table, never a third
    * corpus pass.
    */
  private[graft] def subsampleTokens(toks: DataFrame, idCol: String,
                                     counts: DataFrame, tPpm: Long,
                                     seed: String): DataFrame = {
    require(tPpm >= 1 && tPpm <= 1000000, s"tPpm $tPpm out of [1, 1e6]")
    val totals = counts.agg(sum(col("c")).as("total"))
    val cuts = counts.crossJoin(broadcast(totals))
      // ONE fixed-parenthesization double: r = (tPpm·total)/(1e6·c),
      // p = least(1, sqrt(r) + r), cut = round(p·2^32) — replayed
      // verbatim by the oracle SQL
      .select(col("w"), expr(
        s"""CAST(round(least(CAST(1.0 AS DOUBLE),
           |  sqrt(CAST($tPpm * total AS DOUBLE)
           |    / CAST(1000000 * c AS DOUBLE))
           |  + CAST($tPpm * total AS DOUBLE)
           |    / CAST(1000000 * c AS DOUBLE))
           |* 4294967296.0) AS BIGINT)""".stripMargin.replace("\n", " "))
        .as("cut"))
    val hv = conv(bucket(concat(col(idCol).cast("string"), lit("|"),
      col("pos"), lit("|")), seed), 16, 10).cast("bigint")
    toks.join(cuts, Seq("w"))
      .withColumn("keep", hv < col("cut"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("w"))))),
          x => x.getField("w")), " ").as("sub_text"))
  }
}
