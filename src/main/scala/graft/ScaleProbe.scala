package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{PumpConfig, PumpQueries, Tables}
import graft.streaming.Pump

/** 10x scale probe: unions sf0.1 events to ~1M rows and drives the pump
  * pipeline + heaviest aggregates, watching for nonlinear cliffs. Not part
  * of the driver gates; a dev tool for the 100 TB design story.
  */
object ScaleProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev1 = Tables.events(spark, "/root/testdata/sf0.1")
    // 10 disjoint copies (shifted ids/ts) ~ 1M rows
    val ev10 = (0 until 10).map { k =>
      ev1.withColumn("event_id", col("event_id") + lit(k * 10000000L))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $k HOURS"))
    }.reduce(_ union _)
    println("ROWS=" + t("materialize-count")(ev10.count()))

    val good = PumpQueries.goodPayload(col("props"))
    val source = ev10.select(
      concat(lit("pump/data/"), (col("user_id") % 5).cast("string")).as("topic"),
      good.cast("binary").as("payload"),
      col("ts").as("received_time"))
    val out = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    val sinks = Pump.Sinks(s"$out/raw", s"$out/adapter", s"$out/ckpt")
    t("pump-1M-dual-sink") {
      Pump.writeBatch(PumpConfig(jsonSample = PumpQueries.payloadSample),
        PumpQueries.payloadInf, sinks)(source, 0L)
    }
    println("RAW=" + spark.read.parquet(sinks.rawPath).count()
      + " ADAPTER=" + spark.read.parquet(sinks.adapterPath).count())
    t("g1-window-1M") {
      graft.engine.Monitor.windowedStageAgg(ev10, col("ts"), col("event_type"),
        length(col("props")) + lit(4), "5 minutes")
        .write.format("noop").mode("overwrite").save()
    }
    t("exact-dedup-1M") {
      graft.ops.Dedup.exactDedup(ev10, "event_id", "props")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
