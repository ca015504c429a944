package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Partition pruning over the date-partitioned layout the pump writes
  * (`Pump` partitions both sinks by collect_date): a day-scoped query
  * must read only that day's files — at 100 TB the difference between a
  * scan and a lookup. The property lives in the plan (PartitionFilters),
  * so it is pinned here like the other plan shapes.
  */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  test("date-scoped query prunes to one partition; filter pushed to scan") {
    val out = tmpDir("prune")
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("collect_date", to_date($"ts"))
      .write.partitionBy("collect_date").parquet(s"$out/events")

    val dates = spark.read.parquet(s"$out/events")
      .select($"collect_date").distinct().as[java.sql.Date].collect().sorted
    assert(dates.length > 1, "need multiple date partitions for the test")
    val day = dates(dates.length / 2)

    val q = spark.read.parquet(s"$out/events")
      .filter($"collect_date" === day && $"event_type" === "purchase")
      .select($"event_id", $"value")
    val plan = q.queryExecution.executedPlan.toString

    // partition predicate prunes directories, data predicate reaches
    // the parquet reader
    assert(plan.contains("PartitionFilters") && plan.contains(day.toString),
      s"partition filter missing in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      s"data filter not pushed in:\n$plan")
    // and the scan really reads only the pruned slice
    val pruned = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.partitionCount
      }
    assert(pruned.contains(1), s"expected 1 selected partition, got $pruned")
    // correctness of the pruned read
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date($"ts") === day && $"event_type" === "purchase").count()
    assert(q.count() === expected && expected > 0)
  }
}
