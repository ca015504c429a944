package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X94 — PII detection, masking, and the mask-or-drop policy: the Dolma
  * toolkit's PII step (Soldaini et al. 2024, §2.3: regex taggers for
  * email addresses, phone numbers, and IP addresses; documents with few
  * hits are masked in place, documents above a hit threshold are dropped
  * outright, on the theory that PII-dense pages are scrapes of directories
  * or logs rather than prose worth keeping).
  *
  * X7's scrubber (`TextAnalysis.scrub`) replaces emails/URLs blindly;
  * this operator is the POLICY form: per-category counts first, then a
  * verdict (`keep` / `mask` / `drop`) driven by the counts, and masked
  * text only for surviving documents. The reference pump has no text
  * operators at all (its payloads are opaque JSON — `data_adapter.go`),
  * so this whole family is north-star surface, not reference surface.
  *
  * 100 TB design: everything here is a row-local projection over the scan
  * — regex extraction, counting, masking, and the verdict CASE all happen
  * inside one whole-stage-codegen'd stage with ZERO shuffle and nothing
  * driver-side. The corpus-level [[summary]] adds one map-side-combined
  * aggregation whose exchange carries a single row per partition. Regex
  * patterns deliberately avoid lookaround and backreferences so they run
  * identically on Java regex (Spark), RE2 (DuckDB), and any other engine
  * auditing the corpus.
  */
object Pii {

  /** Email — same class shape as [[TextAnalysis.EmailPattern]] (kept
    * separate so the two families can evolve independently).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: 3-3-4 digit groups, dash or dot separated.
    * Word-bounded so order-ids like `12345-678-9012x` don't half-match.
    */
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Dotted-quad IPv4. Range validity (each octet <= 255) is NOT checked
    * — the Dolma tagger doesn't either, and the lookahead-free form is
    * what keeps the pattern portable across regex engines.
    */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken = "<IP>"

  /** Count matches of one pattern — `regexp_extract_all` + `size`, both
    * codegen'd; returns 0 (not null) on no match for non-null text.
    */
  private def hits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Masked text: emails first (an email can contain digit runs but a
    * masked `<EMAIL>` token cannot, so later patterns see clean text),
    * then IPv4 BEFORE phone — the dotted phone variant `415.555.0199`
    * is also a syntactic dotted-quad prefix, and fixing the order is
    * what makes the output deterministic rather than engine-dependent.
    */
  def mask(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Per-document PII scan: per-category counts + total. Pure scan-side
    * projection — the shape that runs at any corpus size.
    */
  def scan(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scanned(docs, textCol).drop(textCol)

  /** [[scan]] with the text column carried through — the single-pass
    * base [[policy]] builds on (recomputing the counts in a second pass
    * or, worse, joining scan output back to the corpus would double the
    * corpus work for nothing).
    */
  private def scanned(docs: DataFrame, textCol: String): DataFrame = {
    val reserved = Set("n_email", "n_phone", "n_ip", "n_pii")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"Pii scan: input already carries reserved output column(s) " +
        s"${clash.mkString(", ")} — rename or drop them first")
    val t = col(textCol)
    // counts mirror [[mask]]'s category-priority order (email -> IP ->
    // phone): each later category counts on text with the EARLIER
    // categories already masked, so a phone- or IP-shaped substring
    // inside an email address (415-555-0199@x.com) is attributed to
    // exactly one category and can never flip the verdict to `drop`
    // for text mask() would have rendered fully clean
    val em = regexp_replace(t, EmailPattern, EmailToken)
    // every input column rides through (the gateSignals discipline) so
    // callers like [[riskPiiJoint]] keep their quasi-identifiers;
    // [[policy]]'s fixed projection is unchanged by the extra columns
    docs.select(docs.columns.map(col).toSeq ++ Seq(
      hits(t, EmailPattern).cast("long").as("n_email"),
      hits(regexp_replace(em, Ipv4Pattern, IpToken), PhonePattern)
        .cast("long").as("n_phone"),
      hits(em, Ipv4Pattern).cast("long").as("n_ip")): _*)
      .withColumn("n_pii", col("n_email") + col("n_phone") + col("n_ip"))
  }

  /** The policy: `drop` above `maxPii` total hits, `mask` for 1..maxPii,
    * `keep` for clean documents. Masked text is produced only for
    * surviving rows (dropped rows carry NULL — at 100 TB the drop branch
    * never pays the triple-regex rewrite). One projection over the scan,
    * zero shuffle, zero joins.
    */
  def policy(docs: DataFrame, idCol: String, textCol: String,
             maxPii: Int): DataFrame = {
    require(maxPii >= 1, "maxPii must be >= 1 (0 would drop any hit)")
    scanned(docs, textCol)
      .select(col(idCol), col("n_email"), col("n_phone"), col("n_ip"),
        col("n_pii"),
        when(col("n_pii") > maxPii, "drop")
          .when(col("n_pii") > 0, "mask")
          .otherwise("keep").as("verdict"),
        when(col("n_pii") > maxPii, lit(null).cast("string"))
          .when(col("n_pii") > 0, mask(col(textCol)))
          .otherwise(col(textCol)).as("out_text"))
  }

  /** X134 — k-anonymity risk audit (Sweeney 2002): group the corpus by
    * a QUASI-IDENTIFIER tuple (the columns that jointly re-identify —
    * language, source, a coarse length bucket) and flag equivalence
    * classes smaller than k: a row in a size-1 class is uniquely
    * re-identifiable from its quasi-identifiers alone, before any PII
    * token appears in the text. The audit complements [[scan]]/
    * [[policy]] (which find EXPLICIT identifiers): releasing a
    * "scrubbed" corpus whose metadata still partitions users into
    * singleton classes is the textbook re-identification failure.
    *
    * SHAPE AT 100 TB: one quasi-identifier-grain exchange with
    * map-side combine (the class table is bounded by the attribute
    * cross product, not the corpus), then a class-grain projection.
    * Suppression-cost accounting (how many rows must drop to reach k)
    * is a sum over the at-risk classes — no second corpus pass.
    *
    * Output: one row per equivalence class — the quasi-identifier
    * columns, class size `k_size`, `at_risk` (k_size < k), plus the
    * corpus-level suppression count broadcast onto every row (the
    * datacard number: rows lost if at-risk classes are dropped).
    */
  def kAnonymity(docs: DataFrame, quasiIds: Seq[String],
                 k: Long): DataFrame =
    kAnonymityOf(classCounts(docs, quasiIds), quasiIds, k)

  /** The ADDITIVE lane of [[kAnonymity]]: per-equivalence-class row
    * counts. Counts from disjoint batches merge by pure addition on the
    * quasi-identifier tuple (null attribute values group as their own
    * class, identically in every engine), so one code path serves the
    * batch operator and [[graft.streaming.KAnonymityStream]]'s
    * accumulated ledger — the GateAttributionStream seam discipline.
    */
  private[graft] def classCounts(docs: DataFrame,
                                 quasiIds: Seq[String]): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(!quasiIds.contains("k_size"),
      "'k_size' is the class-count output column — rename that " +
        "quasi-identifier")
    docs.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("k_size"))
  }

  /** The DERIVED projection of [[kAnonymity]] over a class-count table
    * (from [[classCounts]] or a streaming ledger): at-risk flags plus
    * the corpus-level suppression count broadcast onto every row. The
    * class table is attribute-cross-product-sized, so the 1-row cross
    * join broadcasts.
    */
  private[graft] def kAnonymityOf(classes: DataFrame, quasiIds: Seq[String],
                                  k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val flagged = classes
      .select(quasiIds.map(col) :+ col("k_size"): _*)
      .withColumn("at_risk", col("k_size") < k)
    val suppressed = flagged.filter(col("at_risk"))
      .agg(coalesce(sum(col("k_size")), lit(0L)).as("n_suppressed"))
    flagged.crossJoin(broadcast(suppressed))
  }

  /** X147 — the k-anonymity SWEEP: suppression cost as a FUNCTION of k
    * (one row per candidate k), the datacard curve behind [[kAnonymity]]'s
    * single-k audit — "how much corpus do we lose at k=2 vs 5 vs 10"
    * is the number that decides the release threshold, and computing it
    * per-k with separate audits would rescan the corpus once per k.
    *
    * SHAPE AT 100 TB: the corpus is folded ONCE through the shared
    * [[classCounts]] exchange; the sweep is a broadcast cross join of
    * the class-grain table (attribute-cross-product-sized) against the
    * tiny k list plus one more class-grain fold — no second corpus
    * pass, whatever the k count. The ppm lane is DECIMAL-exact
    * (floor division, the repo ppm discipline); its denominator is the
    * total row count, structurally >= 1 whenever any class row exists.
    */
  def kAnonymitySweep(docs: DataFrame, quasiIds: Seq[String],
                      ks: Seq[Long]): DataFrame =
    sweepOf(classCounts(docs, quasiIds), ks)

  /** The sweep PROJECTION over any class-count table — shared by
    * [[kAnonymitySweep]] and the streaming twin's accumulated-ledger
    * accessor ([[graft.streaming.KAnonymityStream.sweep]]), the same
    * one-kernel seam as [[kAnonymityOf]]. Output schema is fixed
    * regardless of the quasi-identifier tuple.
    */
  private[graft] def sweepOf(classes: DataFrame,
                             ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty, "need at least one k to sweep")
    ks.foreach(k => require(k >= 2, s"every k must be >= 2: $k"))
    val spark = classes.sparkSession
    val kDf = spark.createDataset(ks)(
      org.apache.spark.sql.Encoders.scalaLong).toDF("k")
    classes.crossJoin(broadcast(kDf))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"),
        count_if(col("k_size") < col("k")).as("n_at_risk"),
        sum(when(col("k_size") < col("k"), col("k_size"))
          .otherwise(0L)).as("n_suppressed"),
        sum(col("k_size")).as("n_docs"))
      .select(col("k"), col("n_classes"), col("n_at_risk"),
        col("n_suppressed"),
        expr("CAST(CAST(n_suppressed AS DECIMAL(38,0)) * 1000000 " +
          "div n_docs AS BIGINT)").as("suppressed_ppm"))
  }

  /** X148 — the GENERALIZATION sweep: suppression cost at a fixed k as
    * a function of quasi-identifier COARSENESS (the other axis of the
    * release tradeoff — [[kAnonymitySweep]] varies the threshold, this
    * varies the attribute granularity, the first generalization move of
    * Sweeney's k-anonymity model: widen the bucket until enough classes
    * reach k). One row per candidate bucket width: how many classes,
    * how many at risk, how many rows would drop.
    *
    * SHAPE AT 100 TB: the corpus is folded ONCE at the FINEST bucket;
    * every coarser class table is a ROLLUP of that class-grain table
    * (bucket `b` = finest-bucket div (b/b0), and class counts are
    * additive under coarsening), so the sweep costs one corpus exchange
    * plus `buckets.size - 1` class-grain folds — never a second corpus
    * pass. This is why the bucket list must be multiples of its head.
    */
  def kAnonymityGeneralize(docs: DataFrame, quasiIds: Seq[String],
                           lenCol: String, buckets: Seq[Long],
                           k: Long): DataFrame = {
    require(buckets.nonEmpty, "need at least one bucket width")
    val b0 = buckets.head // generalizeOf enforces the rest of the contract
    // integral div throughout: `/` on longs is DOUBLE division in
    // Spark, and floor-through-double drifts at large lengths. The
    // finest class table is PINNED: every bucket branch folds from
    // this one materialization (class-grain, cross-product-bounded),
    // so the corpus is exchanged once however long the bucket list —
    // without the pin each union branch re-plans its own corpus scan
    // (exchange reuse across union branches is best-effort, not
    // guaranteed)
    val finest = classCounts(
      docs.withColumn("__lb",
        expr(s"CAST($lenCol AS BIGINT) div $b0")),
      quasiIds :+ "__lb").localCheckpoint(false)
    generalizeOf(finest, quasiIds, "__lb", b0, buckets, k)
  }

  /** The generalization-curve PROJECTION over a FINEST-bucket class
    * table — the rollup half of [[kAnonymityGeneralize]], split out so
    * the streaming twin's accumulated ledger gets the x148 curve
    * through the SAME kernel ([[graft.streaming.KAnonymityStream.generalize]]
    * — the [[sweepOf]]/[[kAnonymityOf]] seam discipline). `lbCol` holds
    * the finest bucket index (length div `b0`); every requested bucket
    * must be a multiple of `b0` because coarser tables are class-grain
    * ROLLUPS of the finest, never a rescan.
    */
  private[graft] def generalizeOf(finest: DataFrame, quasiIds: Seq[String],
                                  lbCol: String, b0: Long,
                                  buckets: Seq[Long], k: Long): DataFrame = {
    require(buckets.nonEmpty, "need at least one bucket width")
    require(b0 >= 1, s"finest bucket width must be >= 1: $b0")
    require(k >= 2, s"k must be >= 2: $k")
    buckets.foreach(b => require(b % b0 == 0,
      s"bucket $b is not a multiple of the finest bucket $b0 — the " +
        "coarser class tables roll up from the finest, which needs " +
        "aligned boundaries"))
    buckets.map { b =>
      finest
        .groupBy((quasiIds.map(col) :+
          expr(s"`$lbCol` div ${b / b0}").as("__cb")): _*)
        .agg(sum(col("k_size")).as("k_size"))
        .agg(count(lit(1)).as("n_classes"),
          count_if(col("k_size") < k).as("n_at_risk"),
          coalesce(sum(when(col("k_size") < k, col("k_size"))
            .otherwise(0L)), lit(0L)).as("n_suppressed"),
          coalesce(sum(col("k_size")), lit(0L)).as("n_docs"))
        .select(lit(b).as("bucket"), col("n_classes"), col("n_at_risk"),
          col("n_suppressed"), col("n_docs"))
    }.reduce(_.unionByName(_))
      .select(col("bucket"), col("n_classes"), col("n_at_risk"),
        col("n_suppressed"),
        // n_docs = 0 only for an empty corpus: no rows, no risk — 0 ppm
        when(col("n_docs") > 0,
          expr("CAST(CAST(n_suppressed AS DECIMAL(38,0)) * 1000000 " +
            "div n_docs AS BIGINT)")).otherwise(0L).as("suppressed_ppm"))
  }

  /** X149 — the JOINT re-identifiability × explicit-PII audit: one row
    * per (at_risk, verdict) cell with document counts and corpus share.
    * The release question the two single-axis audits cannot answer:
    * do the uniquely re-identifiable rows (quasi-identifier class
    * below k) COINCIDE with the PII-dense ones (the mask/drop set)?
    * If yes, the drop policy already covers the k-anonymity exposure;
    * if the at-risk mass sits in `keep`, the corpus leaks through
    * metadata that no amount of text scrubbing touches.
    *
    * SHAPE AT 100 TB: two corpus-side stages — the classCounts
    * exchange (class-grain output) and ONE scan-side projection
    * computing the verdict with the quasi-identifiers riding along —
    * joined on the quasi-identifier tuple (class table is
    * cross-product-bounded; AQE broadcasts it when it fits), then one
    * cell-grain fold. The share denominator rides the same fold via a
    * 1-row broadcast (the kAnonymityOf pattern).
    */
  def riskPiiJoint(docs: DataFrame, quasiIds: Seq[String],
                   textCol: String, k: Long, maxPii: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    require(maxPii >= 1, "maxPii must be >= 1 (0 would drop any hit)")
    val classes = classCounts(docs.select(quasiIds.map(col): _*), quasiIds)
      .withColumn("at_risk", col("k_size") < k)
      .drop("k_size")
    val verdicts = withVerdict(
        docs.select((quasiIds :+ textCol).map(col): _*), textCol, maxPii)
      .select((quasiIds :+ "verdict").map(col): _*)
    // null-safe equality on every quasi-identifier: [[kAnonymity]]
    // groups null attribute values as their own class, and a plain
    // inner join would silently DROP those documents from the cells
    // (null keys never match) — callers following the x131 null rule
    // filter upstream, but the op must not lose rows either way
    val joinCond = quasiIds.map(q =>
      verdicts(q) <=> classes(q)).reduce(_ && _)
    val cells = verdicts.join(classes, joinCond)
      .groupBy(col("at_risk"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"))
    val total = cells.agg(coalesce(sum(col("n_docs")), lit(0L)).as("__t"))
    cells.crossJoin(broadcast(total))
      .select(col("at_risk"), col("verdict"), col("n_docs"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 div __t " +
          "AS BIGINT)").as("share_ppm"))
  }

  /** Corpus-level PII report: per-verdict document counts and category
    * totals — the datacard row a release audit wants. One row per
    * verdict; the exchange carries at most 3 verdict-grain partial rows
    * per partition.
    *
    * HOT-PATH SHAPE: a typed `mapPartitions` fold with PRIVATELY
    * compiled patterns, not the [[scanned]] projection. The projection
    * form ran the three regexes through the shared
    * RegExpReplace/RegExpExtractAll call sites that every other regex
    * query in a long-lived session also warms — and its measured
    * behavior was BIMODAL across JVMs (0.35 s vs 0.78 s stable levels
    * at sf0.1, round-19 campaign): the same megamorphic-deopt class the
    * round-18 x4/x50 fix eliminated by giving the hot loop its own
    * monomorphic call sites. The counts and the masking-priority
    * attribution (email first, then IPv4, then phone — each later
    * category counted on text with the earlier ones already masked)
    * are IDENTICAL to [[policy]]'s, oracle-checked; per-document
    * outputs still come from [[policy]].
    */
  def summary(docs: DataFrame, idCol: String, textCol: String,
              maxPii: Int): DataFrame = {
    require(maxPii >= 1, "maxPii must be >= 1 (0 would drop any hit)")
    val spark = docs.sparkSession
    import spark.implicits._
    val partials = docs.select(col(textCol).cast("string")).as[String]
      .mapPartitions { it =>
        val email = java.util.regex.Pattern.compile(EmailPattern)
        val ipv4 = java.util.regex.Pattern.compile(Ipv4Pattern)
        val phone = java.util.regex.Pattern.compile(PhonePattern)
        // count non-overlapping matches and mask them in one pass —
        // regexp_extract_all + regexp_replace semantics, one Matcher
        def countMask(p: java.util.regex.Pattern, s: String,
                      token: String): (Long, String) = {
          val m = p.matcher(s)
          if (!m.find()) (0L, s) // common case: no hit, no rewrite
          else {
            var n = 0L
            val sb = new java.lang.StringBuilder(s.length)
            do { n += 1; m.appendReplacement(sb, token) } while (m.find())
            m.appendTail(sb)
            (n, sb.toString)
          }
        }
        // verdict-grain partials: [n_docs, n_email, n_phone, n_ip]
        val acc = scala.collection.mutable.HashMap.empty[String, Array[Long]]
        it.foreach { t =>
          var nEmail = 0L; var nPhone = 0L; var nIp = 0L
          if (t != null) {
            val (ne, em) = countMask(email, t, EmailToken)
            val (ni, emIp) = countMask(ipv4, em, IpToken)
            val (np, _) = countMask(phone, emIp, PhoneToken)
            nEmail = ne; nIp = ni; nPhone = np
          }
          val nPii = nEmail + nPhone + nIp
          // null text: the projection form yields null counts and the
          // CASE's otherwise-branch — a `keep` row whose null counts
          // vanish under sum(); adding zeros is the same total
          val verdict =
            if (nPii > maxPii) "drop" else if (nPii > 0) "mask" else "keep"
          val a = acc.getOrElseUpdate(verdict, new Array[Long](4))
          a(0) += 1; a(1) += nEmail; a(2) += nPhone; a(3) += nIp
        }
        acc.iterator.map { case (v, a) => (v, a(0), a(1), a(2), a(3)) }
      }.toDF("verdict", "n_docs", "n_email", "n_phone", "n_ip")
    partials.groupBy(col("verdict"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_email")).as("n_email"),
        sum(col("n_phone")).as("n_phone"),
        sum(col("n_ip")).as("n_ip"))
  }

  /** [[policy]]'s verdict column carried ALONGSIDE the caller's own
    * columns (the gateSignals discipline) — shared by [[riskPiiJoint]]
    * and the diversity audits below, so the verdict semantics cannot
    * drift between them.
    */
  private[graft] def withVerdict(docs: DataFrame, textCol: String,
                                 maxPii: Int): DataFrame = {
    require(maxPii >= 1, "maxPii must be >= 1 (0 would drop any hit)")
    scanned(docs, textCol)
      .withColumn("verdict",
        when(col("n_pii") > maxPii, "drop")
          .when(col("n_pii") > 0, "mask")
          .otherwise("keep"))
      .drop("n_email", "n_phone", "n_ip", "n_pii")
  }

  /** The (quasi-identifier tuple, sensitive value) class-value ledger —
    * the ONE corpus exchange behind [[lDiversity]] and [[tCloseness]]:
    * class sizes, per-class value multiplicities, and the corpus-global
    * sensitive distribution are all class-grain ROLLUPS of it (the
    * [[classCounts]] seam, one attribute wider). NULL sensitive values
    * group as their own value — the x134 null discipline, identical in
    * both engines because it is groupBy-null, never count(DISTINCT).
    */
  private[graft] def sensitiveClassCounts(docs: DataFrame,
                                          quasiIds: Seq[String],
                                          sensitiveCol: String): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(!quasiIds.contains(sensitiveCol),
      s"'$sensitiveCol' cannot be both a quasi-identifier and the " +
        "sensitive attribute — diversity of a grouping column is 1 by " +
        "construction")
    val reserved = Set("sv_count", "k_size", "n_sv")
    val clash = (quasiIds :+ sensitiveCol).filter(reserved.contains)
    require(clash.isEmpty,
      s"reserved output column(s) used as input: ${clash.mkString(", ")}" +
        " — rename them first")
    docs.groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("sv_count"))
  }

  /** X151 — DISTINCT l-DIVERSITY sweep (Machanavajjhala et al., "l-
    * Diversity: Privacy Beyond k-Anonymity", 2006): a k-anonymous
    * class whose members all SHARE one sensitive value still leaks
    * that value for everyone in it — k-anonymity bounds
    * re-identification, not attribute disclosure. One row per
    * candidate l: how many equivalence classes carry fewer than l
    * distinct sensitive values, and how much corpus sits in them
    * (the release decision's other curve, beside x147's k sweep).
    *
    * SHAPE AT 100 TB: one corpus exchange ([[sensitiveClassCounts]]),
    * then class-grain rollups and a broadcast cross join against the
    * tiny l list — the [[sweepOf]] pattern; DECIMAL-exact ppm.
    */
  def lDiversity(docs: DataFrame, quasiIds: Seq[String],
                 sensitiveCol: String, ls: Seq[Long]): DataFrame =
    lDiversityOf(sensitiveClassCounts(docs, quasiIds, sensitiveCol),
      quasiIds, ls)

  /** The l-diversity sweep PROJECTION over any class-value ledger
    * (`quasiIds` columns + sensitive + `sv_count`) — shared by
    * [[lDiversity]] and the streaming twin's accumulated-ledger
    * accessor ([[graft.streaming.KAnonymityStream.lDiversity]]), the
    * [[sweepOf]] seam discipline.
    */
  private[graft] def lDiversityOf(svc: DataFrame, quasiIds: Seq[String],
                                  ls: Seq[Long]): DataFrame = {
    require(ls.nonEmpty, "need at least one l to sweep")
    ls.foreach(l => require(l >= 2, s"every l must be >= 2: $l"))
    val spark = svc.sparkSession
    val cls = svc.groupBy(quasiIds.map(col): _*)
      .agg(sum(col("sv_count")).as("k_size"), count(lit(1)).as("n_sv"))
    val lDf = spark.createDataset(ls)(
      org.apache.spark.sql.Encoders.scalaLong).toDF("l")
    cls.crossJoin(broadcast(lDf))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        count_if(col("n_sv") < col("l")).as("n_low_div"),
        sum(when(col("n_sv") < col("l"), col("k_size"))
          .otherwise(0L)).as("n_docs_low"),
        sum(col("k_size")).as("n_docs"))
      .select(col("l"), col("n_classes"), col("n_low_div"),
        col("n_docs_low"),
        expr("CAST(CAST(n_docs_low AS DECIMAL(38,0)) * 1000000 " +
          "div n_docs AS BIGINT)").as("low_div_ppm"))
  }

  /** X152 — t-CLOSENESS audit (Li, Li & Venkatasubramanian, "t-
    * Closeness: Privacy Beyond k-Anonymity and l-Diversity", 2007):
    * even a diverse class leaks when its sensitive DISTRIBUTION skews
    * far from the corpus-global one. Distance is the Earth Mover's
    * Distance under uniform ground distance — for categorical
    * attributes that is total variation: emd = sum_v |p_class(v) -
    * p_global(v)| / 2 — computed INTEGER-EXACT in ppm (the repo ppm
    * discipline): emd_ppm = floor(1e6 * sum_v |cnt_v*N - g_v*n_c| /
    * (2*n_c*N)), all DECIMAL(38,0) lanes, no float sums.
    *
    * Output: one row per equivalence class — the quasi-identifier
    * columns, class size `k_size`, `emd_ppm`, and `breach`
    * (emd_ppm > tPpm).
    *
    * SHAPE AT 100 TB: one corpus exchange ([[sensitiveClassCounts]],
    * pinned so its three rollup lanes share the materialization); the
    * grid is classes x sensitive values — class-grain times a tiny
    * value set — with the global side BROADCAST, and the class-value
    * join NULL-SAFE per attribute (the x149 lesson: null
    * quasi-identifiers and null sensitive values are real classes).
    */
  def tCloseness(docs: DataFrame, quasiIds: Seq[String],
                 sensitiveCol: String, tPpm: Long): DataFrame =
    tClosenessOf(sensitiveClassCounts(docs, quasiIds, sensitiveCol),
      quasiIds, sensitiveCol, tPpm)

  /** The t-closeness PROJECTION over any class-value ledger — the
    * [[lDiversityOf]] seam for the EMD audit; shared with the
    * streaming twin ([[graft.streaming.KAnonymityStream.tCloseness]]).
    */
  private[graft] def tClosenessOf(ledger: DataFrame, quasiIds: Seq[String],
                                  sensitiveCol: String,
                                  tPpm: Long): DataFrame = {
    require(tPpm >= 0 && tPpm <= 1000000L,
      s"tPpm is a ppm threshold in [0, 1000000]: $tPpm")
    val svc = ledger.localCheckpoint(false)
    val classes = svc.groupBy(quasiIds.map(col): _*)
      .agg(sum(col("sv_count")).as("n_c"))
    val global = svc.groupBy(col(sensitiveCol))
      .agg(sum(col("sv_count")).as("g"))
    val total = global.agg(coalesce(sum(col("g")), lit(0L)).as("n_total"))
    val grid = classes.crossJoin(broadcast(global))
      .crossJoin(broadcast(total))
    // the ledger re-enters the plan here (grid is classes x global,
    // BOTH rollups of it) — re-alias its join columns to fresh names
    // so the three lineages cannot collide in the join condition
    val probe = svc.select((quasiIds :+ sensitiveCol)
      .map(c => col(c).as(s"__r_$c")) :+ col("sv_count").as("__r_cnt"): _*)
    val joinCond = (quasiIds :+ sensitiveCol)
      .map(c => grid(c) <=> probe(s"__r_$c")).reduce(_ && _)
    val gridCols = quasiIds.map(grid(_)) ++
      Seq(grid("n_c"), grid("g"), grid("n_total"))
    val cv = grid.join(probe, joinCond, "left")
      .select(gridCols :+
        coalesce(probe("__r_cnt"), lit(0L)).as("cnt"): _*)
    cv.groupBy((quasiIds.map(col) :+ col("n_c") :+ col("n_total")): _*)
      .agg(sum(abs(expr("CAST(cnt AS DECIMAL(38,0)) * n_total - " +
        "CAST(g AS DECIMAL(38,0)) * n_c"))).as("emd_num"))
      .select(quasiIds.map(col) ++ Seq(
        col("n_c").as("k_size"),
        expr("CAST(emd_num * 1000000 div " +
          "(2 * CAST(n_c AS DECIMAL(38,0)) * n_total) AS BIGINT)")
          .as("emd_ppm")): _*)
      .withColumn("breach", col("emd_ppm") > tPpm)
  }
}
