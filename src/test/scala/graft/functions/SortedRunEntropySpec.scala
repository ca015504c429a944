package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native [[SortedRunEntropy]] kernel against the declarative
  * aggregate fold it replaced (the x129/x136 seam): bit-identical on
  * every input, including the empty array, all-equal runs, and
  * single-char alphabets. The fold below IS the pre-round-21 shipped
  * expression, kept verbatim as the ground truth — the kernel must
  * reproduce Spark's `ln` (StrictMath.log) and `round` (HALF_UP
  * BigDecimal) seams exactly or the DuckDB oracle parity breaks.
  */
class SortedRunEntropySpec extends SparkSpec {
  import spark.implicits._

  /** The original declarative fold (charEntropy's pre-kernel form). */
  private def foldForm(cs: Column): Column = {
    def term(run: Column): Column =
      round(log(run.cast("double")) * run * lit(1e6)).cast("long")
    def flush(acc: Column): Column =
      when(acc.getField("run") > 0, term(acc.getField("run")))
        .otherwise(lit(0L))
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("s"))
    aggregate(cs, zero,
      (acc, x) => {
        val same = x === acc.getField("prev")
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(same, acc.getField("s"))
            .otherwise(acc.getField("s") + flush(acc)).as("s"))
      },
      acc => acc.getField("s") + flush(acc))
  }

  private def assertBothEqual(arrays: Seq[Seq[String]]): Unit =
    arrays.toDF("a")
      .select(col("a"), sort_array(col("a")).as("s"))
      .select(col("a"),
        SortedRunEntropy.sortedRunEntropy(col("s")).as("kernel"),
        foldForm(col("s")).as("fold"))
      .as[(Seq[String], Long, Long)].collect()
      .foreach { case (a, k, f) =>
        assert(k == f, s"kernel $k != fold $f on ${a.take(12)}")
      }

  test("kernel == fold on edge cases") {
    assertBothEqual(Seq(
      Seq.empty[String],
      Seq("a"),
      Seq(""), // leading empty string merges with the fold's "" seed
      Seq("", "", "a"),
      Seq("a", "a", "a", "a"),
      Seq("a", "b"),
      Seq("x", "x", "y", "y", "y", "z"),
      Seq.fill(1000)("q"),
      ('a' to 'z').map(_.toString) ++ Seq.fill(37)("m")))
  }

  test("kernel == fold on random arrays (seeded property sweep)") {
    val rnd = new scala.util.Random(20260818L)
    val alphabet = Vector("a", "b", "c", "ab", "", "zz", "日", "x y")
    val arrays = (0 until 300).map { _ =>
      Seq.fill(rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.size)))
    }
    assertBothEqual(arrays)
  }
}
