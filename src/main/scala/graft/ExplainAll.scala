package graft
import org.apache.spark.sql.SparkSession
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("a1_json_parse","q1_scan","g1_window_agg","g4_stage_lags","x2_cosine_topk","x1_minhash_lsh")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      df.explain("formatted")
    }
    spark.stop()
  }
}
