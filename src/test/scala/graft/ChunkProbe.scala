package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe for the x49/x50 session-cached chunk table: how big is
  * the localCheckpoint actually (rows, memory, disk), and what does a
  * re-scan cost from each tier — the round-18 bimodality hunt.
  */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[chunk] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val ch = graft.ops.Multimodal.cdcChunks(
      graft.ops.Multimodal.attachBlob(
        graft.engine.Tables.documents(spark, sfDir), "doc_id", "text"),
      "doc_id", "blob", kb = 8, hexZeros = 1)
    val ck = t("materialize ckpt")(ch.localCheckpoint(true))
    println("[chunk] rows: " + ck.count())
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(s"[chunk] storage ${i.name}: mem=${i.memSize / 1024 / 1024}MB" +
        s" disk=${i.diskSize / 1024 / 1024}MB parts=${i.numCachedPartitions}")
    }
    for (i <- 1 to 4)
      t(s"dedup scan $i")(graft.ops.Multimodal.chunkDedup(ck, "doc_id")
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
