package graft

import org.apache.spark.sql.SparkSession

/** Fixed, data-independent CPU canary for [[Bench]].
  *
  * Round-18's committed pair (and round-17's run 4) were taken in a
  * uniformly slow host window: every query moved by the same ~1.5x,
  * no query moved out of line with its neighbors, so neither the
  * intra-run warm-spread stamp nor the pair-agreement rule could see
  * it — both are RELATIVE checks, and a window that slows everything
  * (including both runs of a pair) slips through. The second blind
  * spot is the dual: contention lasting longer than one query's whole
  * 4-run window (r18 run B's x16_domain_quota — all four runs
  * contended, uniform within the query) is invisible to the spread
  * stamp by construction.
  *
  * The canary closes both holes with an ABSOLUTE yardstick: the same
  * sealed computation, independent of data and roster, timed before
  * the first query, every [[Bench.CanaryEveryN]] queries, and after
  * the last. A slow window shows as a canary level above the recorded
  * quiet-window reference; a mid-run contention episode shows as
  * canary spread within one artifact. Two probes per sample:
  *
  *   - `cpu`: a single-thread 100M-step LCG/xorshift chain — a pure
  *     dependent-ALU loop, ~0.1 s at parity. Sensitive to per-core
  *     slowdown (frequency scaling, CPU steal, a co-tenant burning
  *     one core the scheduler migrates us onto).
  *   - `spark`: a fixed-seed `spark.range` hash-aggregate over all
  *     local cores through the noop sink, ~0.2 s warm. Sensitive to
  *     whole-host contention the single-thread loop can miss (all
  *     cores busy, memory-bandwidth pressure, shuffle-thread
  *     starvation) and exercises the same task-scheduling machinery
  *     the measured queries do.
  *
  * Both are warmed (2 discarded executions each) before the first
  * recorded sample so the samples sit on the C2 plateau — the canary
  * measures the HOST, not the JIT ramp. Levels are stamped into the
  * bench artifact (`canary` field); `tools/bench_compare.py` refuses
  * pairs whose canary levels disagree and reports canary-normalized
  * values against the quiet-window reference recorded there.
  */
object BenchCanary {
  /** One canary sample: (cpu_ms, spark_ms). */
  final case class Sample(cpuMs: Double, sparkMs: Double)

  // Fixed constants — never derived from data, env, or time, so the
  // canary cost is identical in every artifact that ever embeds it.
  private val CpuSteps  = 100 * 1000 * 1000
  private val SparkRows = 8L * 1000 * 1000
  private val SparkKeys = 1024

  /** Sink for the loop result so the JIT cannot dead-code the chain.
    * Volatile write ~ nanoseconds; the loop is 100M dependent steps. */
  @volatile private var sink: Long = 0L

  private def cpuProbeMs(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < CpuSteps) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x ^= x >>> 33
      i += 1
    }
    sink = x
    (System.nanoTime() - t0) / 1e6
  }

  private def sparkProbeMs(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    // Fixed-seed in-memory job: range -> multiplicative hash ->
    // 1024-key hash aggregate -> full materialization via noop (the
    // same sink the measured queries use). No data files touched.
    spark.range(0L, SparkRows)
      .select((col("id") * lit(2654435761L) % lit(SparkKeys.toLong))
        .as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("k").as("s"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e6
  }

  /** Warm both probes onto the C2 plateau; call once before sampling.
    * The spark probe needs ~6 executions to flatten (measured: a
    * 2-warmup probe still decays 700 -> 530 ms across later samples —
    * the task-scheduler + codegen paths it shares with nothing else in
    * a fresh JVM keep compiling); the cpu loop flattens after 2. */
  def warmup(spark: SparkSession): Unit = {
    cpuProbeMs(); cpuProbeMs()
    var i = 0
    while (i < 6) { sparkProbeMs(spark); i += 1 }
  }

  /** One recorded sample. The cpu probe is deterministic (dependent
    * ALU chain, one thread) and needs a single execution. The spark
    * probe schedules ~32 tasks twice through a shuffle — GC pauses and
    * OS scheduling jitter move single executions by up to ~1.4x even
    * on an idle host (measured), so the sample takes the MIN of three
    * back-to-back executions: noise only ADDS time, so the min is the
    * host's true current capability, while real contention (cores
    * busy elsewhere, CPU steal, memory-bandwidth pressure) raises all
    * three and therefore the min. */
  def sample(spark: SparkSession): Sample = {
    val cpu = cpuProbeMs()
    val s = math.min(sparkProbeMs(spark),
      math.min(sparkProbeMs(spark), sparkProbeMs(spark)))
    Sample(cpu, s)
  }

  def p50(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n == 0) Double.NaN
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
