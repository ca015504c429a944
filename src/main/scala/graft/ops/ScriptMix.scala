package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X73 — Unicode SCRIPT-MIX analysis: per-document character counts by
  * writing system and the dominant script — the routing signal a
  * multilingual crawl needs before language-specific processing (the
  * mC4/CCNet recipe filters pages whose script doesn't match the
  * claimed language, and mixed-script pages are a spam signal).
  *
  * Four script classes (Latin, Cyrillic, Greek, Han) counted by
  * stripping the class and diffing codepoint lengths. The class
  * patterns are built from literal BMP range endpoints (the same
  * literal characters are embedded in the DuckDB oracle's patterns, so
  * there is no escape-syntax seam between regex engines), and both
  * engines count length in codepoints. Integer ppm over total page
  * chars; dominant = the max-count script, ties to the alphabetically
  * first name, 'none' when no script char occurs.
  *
  * SHAPE AT 100 TB: row-local regexp/length arithmetic, ZERO shuffle,
  * scan-side — the [[CodeDetect]]/[[Gopher]] gate discipline; the
  * stateless-gate streaming claim applies unchanged.
  */
object ScriptMix {

  /** (name, regex char class) per script, alphabetical by name — the
    * dominant tie-break order. Range endpoints are literal characters:
    * identical bytes in the Scala pattern and the SQL oracle.
    */
  val Classes: Seq[(String, String)] = Seq(
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "han" -> "[一-鿿]",
    "latin" -> "[A-Za-z]")

  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** The DataFrame op: doc_id, <script>_chars + <script>_ppm per class,
    * n_chars, dominant.
    */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val page = col(textCol)
    val total = length(page).cast("long")
    val counts = Classes.map { case (name, cls) =>
      name -> (total - length(regexp_replace(page, cls, "")).cast("long"))
    }
    // alphabetical fold with strict > keeps the earliest name on ties
    val dominant = counts.foldLeft(
      (lit("none"), lit(0L)): (Column, Column)) {
      case ((bestName, bestCnt), (name, cnt)) =>
        (when(cnt > bestCnt, lit(name)).otherwise(bestName),
          when(cnt > bestCnt, cnt).otherwise(bestCnt))
    }._1
    docs.select(
      col(idCol) +:
        (counts.map { case (n, c) => c.as(s"${n}_chars") } ++
          counts.map { case (n, c) =>
            when(total > 0, idiv(c * lit(1000000L), total))
              .otherwise(lit(0L)).as(s"${n}_ppm")
          } ++
          Seq(total.as("n_chars"), dominant.as("dominant"))): _*)
  }
}
