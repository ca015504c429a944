package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the storage-layout half of the 100 TB
  * story (SURVEY §4.2 "co-locate joins via bucketing"): writing both
  * fact tables bucketed+sorted on the join key lets Catalyst plan the
  * join with ZERO exchanges, because the partitioning is carried by the
  * table layout instead of a runtime shuffle. At 100 TB this converts
  * every recurring fact-fact join on the bucket key from a full-cluster
  * shuffle into a local zip of co-numbered buckets.
  */
class BucketingSpec extends SparkSpec {

  test("join on the bucket key plans with no exchange; unbucketed twin shuffles") {
    // saveAsTable writes under the session's default warehouse dir
    // (warehouse.dir is a static conf); tables are dropped at the end
    import spark.implicits._
    val li = (0 until 2000).map(i => (i.toLong % 500, i.toLong, (i % 97).toDouble))
      .toDF("l_orderkey", "l_linenumber", "l_quantity")
    val o = (0 until 500).map(i => (i.toLong, s"P${i % 5}"))
      .toDF("o_orderkey", "o_orderpriority")

    // bucketed + sorted on the join key, both sides, same bucket count
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bkt")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bkt")

    // disable auto-broadcast so the join strategy question is real
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val bucketed = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = bucketed.queryExecution.executedPlan.toString
      // the join itself runs exchange-free off the bucket layout; the
      // only exchange allowed is the aggregation's (on o_orderpriority)
      val joinPart = plan.split("HashAggregate").last // below the agg
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")

      // same join over plain (unbucketed) data shuffles BOTH sides
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"), s"expected shuffles in:\n$plainPlan")

      // and the results agree
      assert(bucketed.orderBy("o_orderpriority").collect().toSeq ===
        plain.orderBy("o_orderpriority").collect().toSeq)
    }
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
