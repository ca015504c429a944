package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The "Multi-Record Cascading Tile Adapter" — SURVEY §2.3 (A1-A5, A8) plus
  * the row transforms T5/T6 that bracket it.
  *
  * Reference: `/root/reference/data_adapter.go` — input is one JSON document
  * whose top level is a map `record_id -> record_object`; output is one flat
  * row per record, leaf path `a.b.c` becoming column `a_b_c`, columns sorted
  * lexicographically, with `key_id` carrying the record id.
  *
  * Everything here is a pure `DataFrame => DataFrame` composition of
  * Catalyst built-ins (from_json / explode / nested-field select), so the
  * whole adapter stays inside WholeStageCodegen and both filters and column
  * pruning push down to the source scan. The same functions serve the batch
  * (oracle-checked) path and the streaming pump path.
  */
object Adapter {

  val KeyIdCol = "key_id"

  /** A1 — JSON parse. Corrupt payloads yield a null map (PERMISSIVE), which
    * T6 routes to the error path (`data_adapter.go:166-173`). Top level must
    * be a map (unknown record ids), NOT a struct — SURVEY §7.3 hard part #1.
    */
  def parsePayload(payload: Column, inf: JsonInference.Inferred): Column =
    from_json(payload.cast(StringType), inf.payloadType)

  /** A3 — all-or-nothing protocol assertion. A top-level value that is not a
    * JSON object poisons the whole message for the adapter path
    * (`data_adapter.go:126-131` "adapter protocol match error"), while the
    * raw path still stores it (fan-out T3 happens before parsing).
    *
    * With `from_json` into `MapType(String, Struct)`, a scalar record value
    * parses to a null struct, so validity is: parsed non-null, non-empty,
    * and no null record values.
    */
  def isValidPayload(parsed: Column): Column =
    parsed.isNotNull &&
      size(map_keys(parsed)) > lit(0) &&
      !exists(map_values(parsed), v => v.isNull)

  /** A2 — top-level record explode: one row per (record_id, record) pair.
    * Map explode is exactly Spark's `explode` on MapType
    * (`data_adapter.go:90-98`).
    */
  def explodeRecords(df: DataFrame, parsedCol: String): DataFrame =
    df.select(
      df.columns.filterNot(_ == parsedCol).map(col) :+
        explode(col(parsedCol)).as(Seq(KeyIdCol, "record")): _*)

  /** A4 — recursive flatten of one record struct: leaf at path a.b.c ->
    * column `a_b_c` (`data_adapter.go:73-88` getItemFromMap). Because the
    * schema is fixed after inference, the walk happens at plan-build time —
    * no per-row recursion, just nested-field extraction (codegen'd, and
    * Catalyst prunes unreferenced leaves at the scan).
    */
  def flattenColumns(recordType: StructType, root: String = "record"): Seq[(String, Column)] = {
    def walk(st: StructType, path: String, flat: String): Seq[(String, Column)] =
      st.fields.toSeq.flatMap { f =>
        val p = s"$path.${f.name}"
        val n = if (flat.isEmpty) f.name else s"${flat}_${f.name}"
        f.dataType match {
          case s: StructType => walk(s, p, n)
          case _             => Seq(n -> col(p).as(n))
        }
      }
    walk(recordType, root, "")
  }

  /** A4+A5 — flatten projection with lexicographically sorted column order
    * (`data_adapter.go:103-106` sort.Strings), key_id included in the sort.
    * `carry` columns (mid, timestamps...) are prepended unsorted.
    */
  def flattenProjection(df: DataFrame, recordType: StructType, carry: Seq[String]): DataFrame = {
    val flat = flattenColumns(recordType) :+ (KeyIdCol -> col(KeyIdCol))
    val ordered = flat.sortBy(_._1).map(_._2)
    df.select(carry.map(col) ++ ordered: _*)
  }

  /** Full adapter pipeline A1 -> A3 -> A2 -> A4/A5 over a DataFrame holding
    * a JSON `payload` column. A8 (missing runtime keys -> NULL, extra keys
    * ignored) is `from_json`'s native PERMISSIVE behavior — null-field rows
    * are deliberately NOT dropped (SURVEY §7.3).
    */
  def adapt(df: DataFrame, payloadCol: String, inf: JsonInference.Inferred,
            carry: Seq[String]): DataFrame = {
    // once(...) pins the parse in its own Project: without the barrier,
    // predicate pushdown duplicates from_json into every reference of the
    // validity filter (5 interpreted parses per row — measured)
    val parsed = df
      .withColumn("__parsed",
        graft.functions.Once.once(parsePayload(col(payloadCol), inf)))
      .filter(isValidPayload(col("__parsed")))
    val exploded = explodeRecords(parsed.select((carry :+ "__parsed").map(col): _*), "__parsed")
    flattenProjection(exploded, inf.recordType, carry)
  }

  /** T6 — error routing: the complement of [[adapt]]'s filter. Parse
    * failures / protocol violations are counted and dropped from the
    * adapter path only (`data_adapter.go:166-173`).
    */
  def rejects(df: DataFrame, payloadCol: String, inf: JsonInference.Inferred): DataFrame =
    df.withColumn("__parsed",
        graft.functions.Once.once(parsePayload(col(payloadCol), inf)))
      .filter(!isValidPayload(col("__parsed")))
      .drop("__parsed")

  /** T5 — raw-row projection `(mid, topic, payload-as-string,
    * collect_datetime, collect_date)` (`data_dbstore.go:45-48,127-133`).
    * `collect_date` materializes ClickHouse's `MATERIALIZED toDate(...)`
    * column; downstream sinks partition by it (K1).
    */
  def rawProjection(df: DataFrame, mid: Column, topic: Column, payload: Column,
                    receivedTime: Column): DataFrame =
    df.select(
      mid.as("mid"),
      topic.as("topic"),
      payload.cast(StringType).as("payload"),
      receivedTime.cast(TimestampType).as("collect_datetime"),
      to_date(receivedTime.cast(TimestampType)).as("collect_date"))
}
