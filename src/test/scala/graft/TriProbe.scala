package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the x93 triangle stage (cold-cost hunt). */
object TriProbe {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[tri] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine.Tables
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Tables.events(spark, sfDir).limit(1).collect()

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    t("li distinct")(noop(li))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    t("edges")(noop(e))
    println("edges=" + t("edges count")(e.count()))
    val und = e.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    println("und=" + t("undirected distinct")(und.count()))
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    println("nodes=" + t("degrees")(deg.count()))
    println("maxdeg=" + deg.agg(max("deg")).collect()(0).getLong(0))
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val ord = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst"),
        when(lower, struct(col("dv").as("d"), col("v").as("n")))
          .otherwise(struct(col("du").as("d"), col("u").as("n")))
          .as("dk"))
      .localCheckpoint(false)
    t("ord checkpoint")(())
    val wedges = ord.as("x").join(ord.as("y"),
        col("x.src") === col("y.src") && col("x.dk") < col("y.dk"))
      .select(col("x.src").as("a1"), col("x.dst").as("a2"),
        col("y.dst").as("a3"))
    println("wedges=" + t("wedge join count")(wedges.count()))
    val tri = wedges.join(ord.select(col("src").as("a2"), col("dst").as("a3")),
      Seq("a2", "a3"), "left_semi")
    println("tri=" + t("closing semi-join")(tri.count()))
    val triB = wedges.join(
      broadcast(ord.select(col("src").as("a2"), col("dst").as("a3"))),
      Seq("a2", "a3"), "left_semi")
    println("triB=" + t("BROADCAST closing semi-join")(triB.count()))
    // the full operator as x93 runs it (fresh lineage, localCheckpoint)
    val full = t("Graph.triangles full")(
      graft.ops.Graph.triangles(e).localCheckpoint())
    t("clustering agg")(noop(full.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum(tri) div 3").as("n_triangles"),
      expr("sum(deg * (deg - 1)) div 2").as("n_wedges"),
      expr("sum(tri) * 1000000 div (sum(deg * (deg - 1)) div 2)")
        .as("transitivity_ppm"))))
    spark.stop()
  }
}
