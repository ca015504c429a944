package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** RDD-level release of `Dataset.localCheckpoint` pins.
  *
  * `Dataset.unpersist` routes through the CacheManager, which only knows
  * plans registered via `persist`; on a checkpointed Dataset (a
  * LogicalRDD leaf) it is a silent no-op (verified on Spark 4.1:
  * `getPersistentRDDs` keeps the block after `unpersist(true)`), and the
  * checkpoint blocks stay pinned until the context cleaner happens to GC
  * the RDD — nondeterministic, which in a long shared session is a leak
  * (the r6 regression class the GraphSpec block-release contract pins).
  * The blocks live on the RDD wrapped by the LogicalRDD leaf, so release
  * must happen there.
  *
  * Only safe once nothing live can recompute THROUGH the pin: a released
  * local checkpoint cannot be rebuilt (its lineage is truncated), so any
  * later evaluation of a plan that still references the RDD fails with
  * a missing-block error. Callers release a pin only after every
  * downstream consumer has been materialized (persisted or checkpointed
  * itself).
  */
object Pins {
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => () // not a checkpoint pin — nothing to release
    }
}
