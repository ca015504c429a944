package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: `SparkEntry.entry` must return rows > 0 on
  * sf0.001. Mirrors the round driver's check so it can run locally.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-entry-smoke")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "FAIL"))
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
