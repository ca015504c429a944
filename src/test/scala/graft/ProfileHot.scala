package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the bench hot spots: times sub-stages of the
  * heavy queries so optimization targets the real cost, not a guess.
  */
object ProfileHot {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine.Tables
    import graft.ops.Dedup

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up
    Tables.documents(spark, sfDir).limit(1).collect()

    val docs = Tables.documents(spark, sfDir)
    time("docs scan")(noop(docs))
    val sh = Dedup.shingleTable(docs, "doc_id", "text")
    time("shingleTable")(noop(sh))
    time("shingleTable again")(noop(sh))
    val shP = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist materialize")(shP.count())
    time("sizes agg")(noop(shP.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))))
    val sigs = Dedup.docSignatures(docs, "doc_id", "text", 16)
    time("native doc sigs")(noop(sigs))
    val cands = Dedup.lshCandidates(sigs, "doc_id", 16, 4)
    time("sigs+bands+cands")(noop(cands))
    time("cands collect (bc side)")(cands.count())
    time("full minhashLshPairs")(noop(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.8)))
    time("full jaccardPairs")(noop(
      Dedup.jaccardPairs(Dedup.shingleTable(docs, "doc_id", "text"), "doc_id", 0.8)))
    shP.unpersist()

    // t3 components
    import graft.engine.{PumpConfig, PumpQueries}
    val good = PumpQueries.goodPayload(col("props"))
    val payload = when(col("event_id") % 13 === 0, substring(good, 1, 10)).otherwise(good)
    val source = Tables.events(spark, sfDir).select(
      concat(lit("pump/data/"), (col("user_id") % 5).cast("string")).as("topic"),
      payload.cast("binary").as("payload"),
      col("ts").as("received_time"))
    time("t3 source materialize")(noop(source))
    val out = java.nio.file.Files.createTempDirectory("prof-dual").toString
    val sinks = graft.streaming.Pump.Sinks(s"$out/raw", s"$out/adapter", s"$out/ckpt")
    time("t3 writeBatch")(
      graft.streaming.Pump.writeBatch(PumpConfig(jsonSample = PumpQueries.payloadSample),
        PumpQueries.payloadInf, sinks)(source, 0L))
    // component breakdown of writeBatch
    locally {
      val cfg = PumpConfig(jsonSample = PumpQueries.payloadSample)
      val inf = PumpQueries.payloadInf
      val withMid = source.withColumn("mid",
        graft.functions.RandomId.random_id(cfg.midLength, seed = 0L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("wb persist")(withMid.count())
      val out2 = java.nio.file.Files.createTempDirectory("prof-dual2").toString
      val raw = graft.engine.Adapter.rawProjection(withMid,
        mid = col("mid"), topic = col("topic"), payload = col("payload"),
        receivedTime = col("received_time"))
        .withColumn("batch_id", lit(0L))
      time("wb raw write")(
        raw.repartition(col("collect_date"), pmod(crc32(col("mid")), lit(4)))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("collect_date", "batch_id").parquet(s"$out2/raw"))
      time("wb raw write plain")(
        raw.write.mode("append").partitionBy("collect_date").parquet(s"$out2/rawplain"))
      val adapted = graft.engine.Adapter.adapt(
        withMid.select(col("mid"), col("payload"),
          col("received_time").cast("timestamp").as("collect_datetime")),
        "payload", inf, carry = Seq("mid", "collect_datetime"))
        .withColumn("collect_date", to_date(col("collect_datetime")))
        .withColumn("batch_id", lit(0L))
      time("wb adapter noop")(noop(adapted))
      time("wb adapter write")(
        adapted.repartition(col("collect_date"), pmod(crc32(col("mid")), lit(4)))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("collect_date", "batch_id").parquet(s"$out2/adapter"))
      withMid.unpersist()
    }
    time("t3 read back + agg") {
      val raw = spark.read.parquet(sinks.rawPath)
      val adapter = spark.read.parquet(sinks.adapterPath)
      noop(raw.agg(count(lit(1)).as("raw_rows"), countDistinct(col("mid")).as("n_mids"))
        .crossJoin(adapter.agg(count(lit(1)).as("adapter_rows"))))
    }
    println("[prof] raw files: " + java.nio.file.Files.walk(java.nio.file.Paths.get(sinks.rawPath))
      .filter(p => p.toString.endsWith(".parquet")).count())

    // a1/a2: json parse family
    val ev = Tables.events(spark, sfDir)
    time("events scan")(noop(ev))
    time("a1 get_json_object")(noop(
      ev.select(col("event_id"), get_json_object(col("props"), "$.k").cast("double").as("k"))))
    val evp = ev.select(col("event_id"), PumpQueries.goodPayload(col("props")).as("payload"))
    time("a2 adapt")(noop(
      graft.engine.Adapter.adapt(evp, "payload", PumpQueries.payloadInf, Seq("event_id"))))
    spark.stop()
  }
}
