package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X68 composition contract: the one-projection gate equals running the
  * three DataFrame operators in sequence (clean → filter → two gates →
  * join back), including the NULL-verdict convention for C4-dropped
  * docs.
  */
class MassiveTextSpec extends SparkSpec {
  import spark.implicits._

  test("one-projection gate == sequential C4.clean + qualityRules + " +
    "repetitionSignals") {
    // unique neighbors per line so no n-gram repeats, but "the"/"of"
    // appear (>= 2 stopwords for the quality gate)
    val good = (10 to 69).map(i => s"w${i}a the w${i}b of w${i}c.")
      .mkString("\n")
    val pages = Seq(
      1L -> good,                                   // keeps everywhere
      2L -> "no punct here\nshort.\nx { y.",        // C4-dropped
      3L -> (good + (1 to 7).map(i => s"\n- bullet one$i.").mkString),
      4L -> (Seq.fill(20)("same line here again.").mkString("\n"))
    ).toDF("doc_id", "page")

    val got = MassiveText.gate(pages, "doc_id", "page")
      .as[(Long, Boolean, Option[Boolean], Option[Boolean], Boolean)]
      .collect().toSet

    val c = C4.clean(pages, "doc_id", "page")
    val kept = c.filter(col("kept_doc"))
      .select(col("doc_id"), col("cleaned").as("page"))
    val q = Gopher.qualityRules(kept, "doc_id", "page")
      .select(col("doc_id"), col("kept_doc").as("q"))
    val r = Gopher.repetitionSignals(kept, "doc_id", "page")
      .select(col("doc_id"), col("kept_doc").as("r"))
    val want = c.select(col("doc_id"), col("kept_doc").as("c4_kept"))
      .join(q, Seq("doc_id"), "left").join(r, Seq("doc_id"), "left")
      .select(col("doc_id"), col("c4_kept"), col("q"), col("r"),
        (col("c4_kept") && coalesce(col("q"), lit(false)) &&
          coalesce(col("r"), lit(false))).as("kept_doc"))
      .as[(Long, Boolean, Option[Boolean], Option[Boolean], Boolean)]
      .collect().toSet

    assert(got === want)
    // and the fixture hits every stage: kept, C4-dropped (NULL
    // downstream), quality-dropped, repetition-dropped
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._5 === true)
    assert(byId(2L)._2 === false && byId(2L)._3.isEmpty)
    assert(byId(3L)._3 === Some(false)) // bullet fraction over 10%
    assert(byId(4L)._4 === Some(false)) // duplicate lines
  }
}
