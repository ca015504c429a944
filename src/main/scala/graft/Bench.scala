package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON result line on stdout.
  *
  * Each query is forced through the `noop` sink — a full materialization
  * of every output row/column — rather than `count()`, which would let
  * Catalyst prune exactly the expressions being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warm-up outside the timed region (parquet footer reads,
    // codegen compiler init); real per-query cost is what's measured.
    graft.engine.Tables.events(spark, sfDir).limit(1).collect()
    // Each query runs four times; the reported value is the MEDIAN OF
    // THE WARM RE-RUNS (the cold first run excluded): the round-17
    // bimodality experiment pinned the sub-second queries' spread to
    // the C2 JIT ramp — fresh-JVM runs decay smoothly 1.5 s -> 0.6 ->
    // 0.35 over ~6 executions (flat from run 2 under
    // -XX:TieredStopAtLevel=1, so the ramp IS tiered compilation, not
    // contention), which means a median that includes the cold run
    // lands mid-ramp and moves with whatever ran before the query.
    // Three warm runs put the median one step further down the ramp
    // and damp it; the cold total is still reported alongside.
    // Re-runs stop once the wall budget is spent so large SFs still
    // finish inside an external timeout (the median then covers
    // however many warm runs completed, or falls back to the cold run).
    // Overridable for diagnosis runs (the bimodality experiment wants
    // 8+ runs of a few queries); the driver never sets it.
    val runsPerQuery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "4").toInt
    // Queries with a MEASURED warm ramp deeper than the default three
    // re-runs get more, so their median lands at (or near) the plateau
    // instead of at a ramp position that varies with compile-thread
    // luck. Round-18 experiment, 9 runs x 2 JVMs after the typed-encoder
    // rewrite removed the mid-bench deopt: x4_ppm_decode still decays
    // 0.45 -> 0.26 over 8 warm runs (the render+decode lambdas' own
    // ramp); everything else flattens by run 3. Per-query counts are
    // honest in the artifact via run_counts.
    val deepRampRuns = Map("x4_ppm_decode" -> math.max(runsPerQuery, 9))
    // Sized so the FULL map re-runs: 128 queries at sf0.1 cost ~200 s
    // cold + ~2x150 s warm re-runs; the old 300 s budget expired
    // mid-map in round 11, silently downgrading 34 late-alphabet
    // queries to single COLD runs — which looked like a uniform 1.55x
    // regression and put training-heavy queries (x59_agreement) at
    // their cold cost instead of their warm median. Overridable for
    // local iteration; run_counts in the output is the audit trail.
    val wallBudgetNanos =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SECS", "1200").toDouble * 1e9
    val benchStart = System.nanoTime()
    // Local-iteration filter (same contract as Verify's): the driver
    // never sets it, so driver benches always cover every query.
    // Correctness-only rows (SparkEntry.benchExcluded — the
    // driver-block embedding-dedup comparison kernel) are dropped from
    // the roster unless explicitly named via SPARK_GRAFT_ONLY; the
    // artifact records what was excluded so a roster diff is always
    // explainable from the JSON alone.
    val explicitOnly = sys.env.get("SPARK_GRAFT_ONLY").exists(_.trim.nonEmpty)
    val selected =
      if (explicitOnly) QueryFilter.selected()
      else QueryFilter.selected() -- SparkEntry.benchExcluded
    // Absolute host yardstick (see BenchCanary): warmed onto the C2
    // plateau, then sampled before the first query, every CanaryEveryN
    // queries, and after the last. The samples land in the artifact so
    // a uniformly slow window — invisible to the relative warm-spread
    // and pair-agreement rules by construction — convicts itself
    // against the quiet-window reference recorded in bench_compare.py.
    val canaryEveryN = 25
    BenchCanary.warmup(spark)
    val canarySamples = scala.collection.mutable.ArrayBuffer(
      BenchCanary.sample(spark))
    var sinceCanary = 0
    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = timeOnce(name, fn)
      val cold = once()
      val reruns = Iterator.continually(())
        .takeWhile(_ => System.nanoTime() - benchStart < wallBudgetNanos)
        .take(deepRampRuns.getOrElse(name, runsPerQuery) - 1)
        .map(_ => once()).toSeq
      val runs = cold +: reruns
      // median of the WARM runs only (see above — the cold run pays
      // one-off plan analysis/codegen and would drag the median onto
      // the JIT ramp); true median: middle element for odd counts,
      // mean of the middle pair for even — a budget-truncated 1-warm
      // query reports that run, a 0-warm query falls back to cold;
      // run_counts is the audit trail for both cases
      val sorted = (if (reruns.nonEmpty) reruns else Seq(cold)).sorted
      val n = sorted.size
      val median =
        if (n % 2 == 1) sorted(n / 2)
        else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
      sinceCanary += 1
      if (sinceCanary >= canaryEveryN) {
        canarySamples += BenchCanary.sample(spark)
        sinceCanary = 0
      }
      (name, median, cold, runs)
    }
    canarySamples += BenchCanary.sample(spark)
    // Locale.ROOT: a comma-decimal default locale would render invalid JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // ---- in-session contention self-repair (round 20) ----
    // The warm-spread stamp marks a query CONTENDED when one warm
    // re-run blows out 3x min-to-max: a transient episode, not a
    // property of the plan. Like the pair tie-break below, the query
    // is re-run in-session, minutes after the episode; a CLEAN re-run
    // replaces the measurement (the original runs stay in the artifact
    // under "contention_reruns") and the run sheds the stamp. A re-run
    // that is still dirty keeps the stamp — sustained contention stays
    // loud. Before this rule, one episodic sub-second query doomed a
    // 17-minute run (r19: ten runs for one doubly-clean pair).
    def warmSpreadDirty(runs: Seq[Double]): Boolean = {
      val warm = runs.drop(1)
      warm.size >= 2 && warm.max >= 0.3 &&
        (warm.min <= 0 || warm.max / warm.min > 3.0)
    }
    def medianOfWarm(runs: Seq[Double]): Double = {
      val basis = (if (runs.size > 1) runs.tail else runs).sorted
      if (basis.size % 2 == 1) basis(basis.size / 2)
      else (basis(basis.size / 2 - 1) + basis(basis.size / 2)) / 2.0
    }
    // both rerun passes share the main loop's wall guard (plus slack for
    // the passes themselves): a pathological run where everything is
    // contended must still finish inside an external timeout — skipped
    // reruns simply leave the original measurement and stamp in place
    def rerunBudgetLeft(): Boolean =
      System.nanoTime() - benchStart < wallBudgetNanos * 1.2
    val respread = scala.collection.mutable.LinkedHashMap[String, String]()
    val repaired = results.map { case tup @ (name, _, cold, runs) =>
      if (!warmSpreadDirty(runs) || !rerunBudgetLeft()) tup
      else {
        val n = deepRampRuns.getOrElse(name, runsPerQuery)
        val rerunRuns = (1 to n).map(_ => timeOnce(name, selected(name)))
        val clean = !warmSpreadDirty(rerunRuns)
        respread(name) = s"""{"original_runs":${
          runs.map(fmt).mkString("[", ",", "]")},"rerun_runs":${
          rerunRuns.map(fmt).mkString("[", ",", "]")},"clean":$clean}"""
        System.err.println(s"[bench] CONTENTION RERUN $name: warm spread " +
          s"episode in ${runs.map(fmt).mkString("[", ",", "]")} -> " +
          (if (clean) s"clean rerun adopted, median ${fmt(medianOfWarm(rerunRuns))}"
           else "rerun still dirty — stamp kept"))
        if (clean) (name, medianOfWarm(rerunRuns), cold, rerunRuns.toSeq)
        else tup
      }
    }
    // ---- in-session pair tie-break (round 20) ----
    // SPARK_GRAFT_BENCH_PAIR_REF names the pair's FIRST-leg artifact.
    // Any query whose median disagrees with the reference leg by the
    // pair rule (>2x above the 0.3 s floor) is re-run a THIRD leg right
    // here, in the same warmed session, and the three measurements
    // vote: if the re-run agrees with the reference (and the first
    // measurement did not), the first measurement was a transient
    // contention episode — the re-run median is ADOPTED as this leg's
    // value, with the full audit trail (ref/first/rerun runs/adopted)
    // in the artifact's "tiebreak" object. If the re-run instead
    // corroborates THIS leg's level, the value stands and the pair
    // still fails loudly — the other leg is the suspect then, and no
    // in-session evidence here can repair it. Before this rule, one
    // sub-second episode could doom a 17-minute pair (r19: 2 of 217).
    val pairRef: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_BENCH_PAIR_REF")
        .map(java.nio.file.Paths.get(_))
        .filter(java.nio.file.Files.isReadable(_))
        .map { p =>
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readAllBytes(p))
          val q = node.get("queries")
          if (q == null) Map.empty[String, Double]
          else {
            val it = q.properties().iterator()
            val m = Map.newBuilder[String, Double]
            while (it.hasNext) {
              val e = it.next(); m += (e.getKey -> e.getValue.asDouble())
            }
            m.result()
          }
        }.getOrElse(Map.empty)
    def pairDisagrees(a: Double, b: Double): Boolean =
      math.max(a, b) >= 0.3 &&
        (math.min(a, b) <= 0 || math.max(a, b) / math.min(a, b) > 2.0)
    val tiebreak = scala.collection.mutable.LinkedHashMap[String, String]()
    val adjudicated = repaired.map { case tup @ (name, median, cold, runs) =>
      pairRef.get(name) match {
        case Some(ref) if pairDisagrees(ref, median) &&
            selected.contains(name) && rerunBudgetLeft() =>
          val n = deepRampRuns.getOrElse(name, runsPerQuery)
          val rerunRuns = (1 to n).map(_ => timeOnce(name, selected(name)))
          // all third-leg runs are warm; drop the first anyway (it can
          // pay re-JIT after code-cache churn), mirroring the main rule
          val basis = (if (rerunRuns.size > 1) rerunRuns.tail
                       else rerunRuns).sorted
          val rerun =
            if (basis.size % 2 == 1) basis(basis.size / 2)
            else (basis(basis.size / 2 - 1) + basis(basis.size / 2)) / 2.0
          val adopted = !pairDisagrees(ref, rerun)
          // original runs stay in this audit object; on adoption the
          // published 'runs' carry the rerun (r20 advice: a consumer
          // recomputing medians from 'runs' must reproduce 'queries' —
          // the contention-repair path above already publishes this way)
          tiebreak(name) = s"""{"ref":${fmt(ref)},"first":${fmt(median)},""" +
            s""""rerun":${fmt(rerun)},"original_runs":${
              runs.map(fmt).mkString("[", ",", "]")},"rerun_runs":${
              rerunRuns.map(fmt).mkString("[", ",", "]")},""" +
            s""""adopted":$adopted}"""
          System.err.println(s"[bench] TIEBREAK $name: ref ${fmt(ref)} vs " +
            s"first ${fmt(median)} -> in-session rerun ${fmt(rerun)} (" +
            (if (adopted) "adopted: first was an episode"
             else "kept first: this leg's level reproduces; the other " +
               "leg is suspect") + ")")
          if (adopted) (name, rerun, cold, rerunRuns.toSeq) else tup
        case _ => tup
      }
    }
    val qs = adjudicated.map { case (k, v, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val rc = adjudicated.map { case (k, _, _, r) => "\"" + k + "\":" + r.size }
      .mkString("{", ",", "}")
    // per-run times make a contended host SELF-IDENTIFYING in the
    // artifact: a real regression moves every run, machine contention
    // shows as one outlier run inside a wide spread — without these, a
    // noisy run's median is indistinguishable from a code regression
    val runsJson = adjudicated.map { case (k, _, _, r) =>
      "\"" + k + "\":" + r.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = adjudicated.map(_._2).sum
    val coldTotal = adjudicated.map(_._3).sum
    val respreadJson = respread
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val tiebreakJson = tiebreak
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // the tools/bench_compare.py warm-spread rule, embedded so a
    // contended artifact CONVICTS ITSELF without anyone running the
    // tool: a query whose warm re-runs (cold first run excluded — it
    // pays one-off plan codegen/JIT) spread more than 3x min-to-max
    // above the 0.3 s floor marks the whole run contended. A real
    // regression moves every warm run; machine contention shows as one
    // outlier inside a wide spread. A run stamped "contended":true is
    // re-run, never committed as a round number (PLANS.md).
    val contendedQueries = adjudicated.collect {
      case (name, _, _, runs)
        if runs.size >= 3 && runs.tail.max >= 0.3 &&
          (runs.tail.min <= 0 || runs.tail.max / runs.tail.min > 3.0) =>
        name
    }
    val contendedJson = s""""contended":${contendedQueries.nonEmpty},""" +
      s""""contended_queries":${
        contendedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    // Canary stamp: per-sample levels plus p50s and the within-run
    // spread. A spread above 1.3x on either probe means the HOST moved
    // mid-run — the exact class (whole-query-window contention, r18
    // run B's x16) the warm-spread stamp cannot see; such a run is
    // re-run, never committed, same as "contended". The p50 levels are
    // what bench_compare.py holds against its quiet-window reference
    // and uses to refuse canary-mismatched pairs.
    val cpuMs = canarySamples.map(_.cpuMs).toSeq
    val sparkMs = canarySamples.map(_.sparkMs).toSeq
    def spreadOf(xs: Seq[Double]): Double =
      if (xs.isEmpty || xs.min <= 0) Double.PositiveInfinity
      else xs.max / xs.min
    // Instability rules differ per probe because their benign drift
    // differs. The cpu loop is drift-free (same 100M dependent steps,
    // flat after 2 warmups — measured), so ANY >1.3x spread is host
    // movement. The spark probe can drift DOWNWARD over a long bench
    // as workload queries compile shared scheduler/codegen paths —
    // benign and monotone — while contention only ever pushes it UP;
    // so it flags only an upward excursion: a sample AFTER the run's
    // minimum exceeding 1.5x that minimum. A monotone ramp-down never
    // flags; a quiet start with a contended tail does.
    def upwardExcursion(xs: Seq[Double], ratio: Double): Boolean = {
      if (xs.isEmpty || xs.min <= 0) return true
      val minIdx = xs.indexOf(xs.min)
      xs.drop(minIdx + 1).exists(_ / xs.min > ratio)
    }
    val cpuUnstable = spreadOf(cpuMs) > 1.3
    val sparkUnstable = upwardExcursion(sparkMs, 1.5)
    val canaryUnstable = cpuUnstable || sparkUnstable
    val canaryJson =
      s""""canary":{"cpu_ms":${cpuMs.map(fmt).mkString("[", ",", "]")},""" +
      s""""spark_ms":${sparkMs.map(fmt).mkString("[", ",", "]")},""" +
      s""""p50_cpu_ms":${fmt(BenchCanary.p50(cpuMs))},""" +
      s""""p50_spark_ms":${fmt(BenchCanary.p50(sparkMs))},""" +
      s""""spread_cpu":${fmt(spreadOf(cpuMs))},""" +
      s""""spread_spark":${fmt(spreadOf(sparkMs))},""" +
      s""""every_n":$canaryEveryN,"unstable":$canaryUnstable}""" +
      s""","bench_excluded":${SparkEntry.benchExcluded.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$contendedJson,$canaryJson,"tiebreak":$tiebreakJson,"contention_reruns":$respreadJson,"cold_total":${fmt(coldTotal)},"median_basis":"warm_reruns","runs_per_query":$runsPerQuery,"run_counts":$rc,"runs":$runsJson,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    if (contendedQueries.nonEmpty) System.err.println(
      s"[bench] CONTENDED run (warm spread >3x): ${
        contendedQueries.mkString(", ")} — re-run, do not commit")
    // name the rule that actually fired: the two probes have different
    // instability rules (cpu: any spread >1.3x; spark: upward excursion
    // >1.5x after the run minimum — a benign monotone ramp-down never
    // flags), and reporting the wrong one misleads the re-run decision
    if (canaryUnstable) {
      val fired = Seq(
        if (cpuUnstable)
          Some(s"cpu spread ${fmt(spreadOf(cpuMs))}x > 1.3x") else None,
        if (sparkUnstable)
          Some(s"spark upward excursion > 1.5x after min ${
            fmt(sparkMs.min)}ms (max after min ${
            fmt(sparkMs.drop(sparkMs.indexOf(sparkMs.min) + 1)
              .maxOption.getOrElse(0.0))}ms)") else None
      ).flatten.mkString("; ")
      System.err.println(
        s"[bench] CANARY UNSTABLE ($fired): the host moved mid-run — " +
          "re-run, do not commit")
    }
    // The driver's round artifact stores only a truncated stdout tail, so
    // the per-query map's head is unrecoverable from it. Persist the full
    // line next to the build so every round-over-round comparison can read
    // all queries (the file is committed with the round's work). Filtered
    // local-iteration runs must NOT overwrite it — a partial map would
    // silently replace the round artifact.
    if (sys.env.get("SPARK_GRAFT_ONLY").forall(_.trim.isEmpty)) {
      val out = java.nio.file.Paths.get(
        sys.props.getOrElse("user.dir", "."), "BENCH_FULL.json")
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full JSON written to $out")
    } else System.err.println(
      "[bench] SPARK_GRAFT_ONLY set - BENCH_FULL.json not overwritten")
    spark.stop()
  }
}
