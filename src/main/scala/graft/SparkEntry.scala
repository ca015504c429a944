package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{Adapter, JsonInference, PumpQueries, Tables}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the oracle-checked batch form of every implemented
  * operator: the reference surface (SURVEY §2, graft.engine.PumpQueries)
  * and the LLM-pipeline extensions (SURVEY §2.8, graft.ops.*).
  */
object SparkEntry {

  /** Flagship: the Multi-Record Cascading Tile Adapter end-to-end on
    * sf0.001 events — construct payload, parse, explode, flatten.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), PumpQueries.goodPayload(col("props")).as("payload"))
    Adapter.adapt(ev, "payload", PumpQueries.payloadInf, Seq("event_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.8). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PumpQueries.queries ++ graft.ops.ExtQueries.queries ++
      graft.engine.AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    PumpQueries.oracle ++ graft.ops.ExtQueries.oracle ++
      graft.engine.AnalyticsQueries.oracle

  /** Correctness-only rows: verified by Verify + the DuckDB oracle but
    * EXCLUDED from the bench roster. x1_embedding_dup is the
    * deliberately-kept driver-block comparison kernel
    * (Dedup.scala block form — the one corpus-facing collect in the
    * codebase, documented driver-bounded); its fully distributed
    * sign-bucket twin x1_embedding_dup_bucket is the shipping 100 TB
    * operator and the row the bench prices. Benching both forever
    * would let roster time accrue to a pedagogical kernel and let the
    * collect path masquerade as a shipping path (r18 verdict #3).
    */
  val benchExcluded: Set[String] = Set("x1_embedding_dup")
}
