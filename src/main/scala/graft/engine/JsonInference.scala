package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Schema inference from a JSON sample — SURVEY §2 ops A6/A7.
  *
  * The reference (`/root/reference/data_adapter.go:99-124`) takes a JSON
  * sample whose top level is a map `record_id -> record_object`, flattens
  * each record depth-first (keys joined with `_`), reflects each leaf's Go
  * type and emits a ClickHouse DDL fragment with columns sorted
  * lexicographically. Its type lattice is deliberately tiny: every JSON
  * number is Float64, strings are String, booleans are Bool
  * (`data_adapter.go:111` via `reflect.TypeOf`). Missing keys at runtime
  * bind as nil (A8), extra keys are dropped.
  *
  * Here the same inference produces a Spark [[StructType]] for the
  * *record* (value side of the top-level map). Runtime parsing is then
  * `from_json(payload, MapType(StringType, recordType))`, which natively
  * gives the reference's A8 semantics (absent fields -> null, extra
  * fields -> ignored).
  */
object JsonInference {

  private val mapper = new ObjectMapper()

  /** Flattened leaf: path segments joined with `_` -> Spark type.
    * JSON numbers map to DoubleType per the reference lattice — resist the
    * temptation to infer LongType (`/root/reference/data_adapter.go:111`,
    * golden DDL `release_20120128/readme.txt:40` `params_value Float64`).
    */
  def flattenLeaves(node: JsonNode, prefix: String = ""): Seq[(String, DataType)] = {
    if (node.isObject) {
      node.properties().asScala.toSeq.flatMap { e =>
        val name = if (prefix.isEmpty) e.getKey else s"${prefix}_${e.getKey}"
        flattenLeaves(e.getValue, name)
      }
    } else {
      val dt: DataType =
        if (node.isNumber) DoubleType
        else if (node.isBoolean) BooleanType
        else StringType // strings and anything else (null) -> String
      Seq(prefix -> dt)
    }
  }

  /** Nested StructType mirroring the record's JSON shape (for `from_json`).
    * Field order within each struct is insertion order; flattened output
    * ordering (A5) is applied later at projection time.
    */
  def recordStruct(node: JsonNode): StructType = {
    val fields = node.properties().asScala.toSeq.map { e =>
      val v = e.getValue
      val dt: DataType =
        if (v.isObject) recordStruct(v)
        else if (v.isNumber) DoubleType
        else if (v.isBoolean) BooleanType
        else StringType
      StructField(e.getKey, dt, nullable = true)
    }
    StructType(fields)
  }

  /** Flatten a StructType to `path_joined_with_underscores -> leaf type` —
    * the type-level twin of [[Adapter.flattenColumns]], used so leafTypes /
    * ddlFragment always reflect what `from_json` actually produces.
    */
  def flattenStructLeaves(st: StructType, prefix: String = ""): Map[String, DataType] =
    st.fields.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"${prefix}_${f.name}"
      f.dataType match {
        case s: StructType => flattenStructLeaves(s, name)
        case dt            => Seq(name -> dt)
      }
    }.toMap

  private def mergeStructs(a: StructType, b: StructType): StructType = {
    val bMap = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { f =>
      bMap.get(f.name) match {
        case Some(g) =>
          (f.dataType, g.dataType) match {
            case (x: StructType, y: StructType) =>
              StructField(f.name, mergeStructs(x, y), nullable = true)
            case (x, y) if x == y => f
            case _ => StructField(f.name, StringType, nullable = true)
          }
        case None => f
      }
    }
    val extras = b.fields.filterNot(f => a.fieldNames.contains(f.name))
    StructType(merged ++ extras)
  }

  /** A6 entry point (`CheckJsonSample`, `data_adapter.go:149-157`): parse the
    * sample, verify the top level is a map of objects (A3 protocol), infer
    * one record schema. A7: all records should infer identically; like the
    * reference we warn (return `consistent = false`) rather than fail, and
    * the working schema is the field-union of all records.
    */
  case class Inferred(
      recordType: StructType,
      /** map<record_id, record> — what `from_json` should target */
      payloadType: MapType,
      /** sorted flattened column names incl. key_id (A5) */
      sortedKeys: Seq[String],
      /** flattened name -> type */
      leafTypes: Map[String, DataType],
      consistent: Boolean)

  def inferFromSample(sample: String): Inferred = {
    val root = mapper.readTree(sample)
    require(root != null && root.isObject,
      "adapter protocol match error: top level must be a JSON object")
    val records = root.properties().asScala.toSeq
    require(records.nonEmpty, "adapter protocol match error: empty sample")
    records.foreach { e =>
      require(e.getValue.isObject,
        s"adapter protocol match error: record '${e.getKey}' is not an object")
    }
    val structs = records.map(e => recordStruct(e.getValue))
    val consistent = structs.distinct.size == 1
    val unioned = structs.reduce(mergeStructs)
    // Leaf types come from the MERGED record type, not a per-record pass:
    // mergeStructs resolves cross-record type conflicts to StringType, and
    // from_json parses with `unioned` — so the DDL (K1) and the runtime
    // schema must agree on the same resolution.
    val leaves = flattenStructLeaves(unioned)
    // key_id carries the top-level record id (`data_adapter.go:98`
    // `mp["key_id"] = ik`) and participates in the sorted key list.
    val withKeyId = leaves + (Adapter.KeyIdCol -> StringType)
    Inferred(
      recordType = unioned,
      payloadType = MapType(StringType, unioned, valueContainsNull = true),
      sortedKeys = withKeyId.keys.toSeq.sorted,
      leafTypes = withKeyId,
      consistent = consistent)
  }

  /** ClickHouse type name for a leaf — K1 DDL synthesis building block
    * (`data_adapter.go:111`: Go type name title-cased).
    */
  def clickhouseType(dt: DataType): String = dt match {
    case DoubleType  => "Float64"
    case BooleanType => "Bool"
    case _           => "String"
  }

  /** The inferred DDL fragment, matching the golden transcript
    * (`/root/reference/release_20120128/readme.txt:40`):
    * `, command String, key_id String, ..., params_value Float64`.
    */
  def ddlFragment(inf: Inferred): String =
    inf.sortedKeys.map(k => s", $k ${clickhouseType(inf.leafTypes(k))}").mkString
}
