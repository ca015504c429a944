package graft.ops

import graft.SparkSpec

/** X160 field association: hand-computed chi-square cells, the
  * perfect-association bound (V = 1), the independent-margins zero,
  * single-valued fields (dof 0 -> NULL V), and null values as real
  * classes.
  */
class FieldAssociationSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, String)],
                  pairs: Seq[(String, String)] = Seq(("g1", "g2"))) =
    CorpusStats.fieldAssociation(rows.toDF("g1", "g2"), pairs)
      .orderBy("field_a", "field_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))).toSeq

  test("fieldAssociation: hand-computed 2x2 grid — four cells of " +
    "(O-E)^2/E = 1/6 each, per-cell micro rounding, IEEE sqrt V") {
    val got = run(Seq(("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "y"), ("b", "y")))
    // E = 1.5 in every cell; each term rounds to 166667 micro;
    // V = sqrt(0.666668 / 6) -> 333334 micro
    assert(got === Seq(("g1", "g2", 6L, 2L, 2L, 1L, 666668L,
      Some(333334L))))
  }

  test("fieldAssociation: perfect association saturates V at 1e6; a " +
    "single-valued field gives dof 0 and NULL V") {
    val got = run(Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")))
    assert(got === Seq(("g1", "g2", 4L, 2L, 2L, 1L, 4000000L,
      Some(1000000L))))
    val const = run(Seq(("a", "k"), ("b", "k"), ("b", "k")))
    assert(const === Seq(("g1", "g2", 3L, 2L, 1L, 0L, 0L, None)))
  }

  test("fieldAssociation: null field values are real classes (the " +
    "grid grows a row for them)") {
    val got = run(Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      (null, "x"), (null, "x")))
    // three g1 classes (a, b, null) x two g2 values -> dof 2
    assert(got.head._4 === 3L && got.head._6 === 2L)
    // null class behaves exactly like a named one: (null,"x") pairs
    // with x only, so association stays perfect -> V = 1e6
    assert(got.head._8 === Some(1000000L))
  }

  test("fieldAssociation refuses an empty pair list") {
    intercept[IllegalArgumentException] {
      CorpusStats.fieldAssociation(Seq(("a", "b")).toDF("g1", "g2"),
        Seq.empty)
    }
  }
}
