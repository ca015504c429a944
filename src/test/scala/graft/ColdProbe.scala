package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe for the cold per-query constant (round-18 verdict
  * item): where does cold-total-minus-warm-total go — plan
  * analysis/optimization, first-execution overhead (codegen compile +
  * JIT), or genuine execution? Ten-query sample, fresh JVM, sf from
  * SPARK_GRAFT_SF_DIR. The plan time here is pre-AQE (AQE re-plans
  * during execution and lands in the exec bucket).
  */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.events(spark, sfDir).limit(1).collect()
    val sample = Seq("q1_scan", "c1_revenue_by_nation", "g1_window_agg",
      "x5_sessionize", "x58_kn_mkn", "x67_gopher_rep", "x68_massivetext",
      "x93_triangles", "x112_rank_tau", "x147_kanon_sweep")
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    var (sumPlan, sumCold, sumWarm) = (0.0, 0.0, 0.0)
    sample.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + planning
      val plan = secs(t1)
      def exec(): Double = {
        val t = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        secs(t)
      }
      val cold = exec()
      val warm = math.min(exec(), exec())
      sumPlan += plan; sumCold += cold; sumWarm += warm
      println(f"[cold] $name%-22s plan $plan%6.3f  cold $cold%7.3f  " +
        f"warm $warm%6.3f  first-exec-overhead ${cold - warm}%7.3f")
    }
    println(f"[cold] TOTAL sample: plan $sumPlan%.2f s, cold $sumCold%.2f, " +
      f"warm $sumWarm%.2f, first-exec-overhead ${sumCold - sumWarm}%.2f " +
      f"(plan share of cold constant: ${
        100 * sumPlan / (sumPlan + sumCold - sumWarm)}%.0f%%)")
    spark.stop()
  }
}
