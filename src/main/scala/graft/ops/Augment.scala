package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X81 — span-corruption pair materialization: turn raw documents into
  * (input, target) denoising training pairs — the T5 pretraining
  * objective (Raffel et al. 2020): mask contiguous token spans, replace
  * each with a sentinel in the input, and emit the masked tokens after
  * their sentinels as the target. This is the step where a curated
  * corpus becomes model-ready training data, so it belongs in the
  * pipeline next to packing (x17) and shuffling (x70).
  *
  * DETERMINISTIC, ROW-LOCAL variant: span starts anchor on a fixed
  * GRID — position p is a candidate start iff p ≡ 0 (mod `grid`) — and
  * each anchor fires off its own md5 lane (`substring(md5(doc:anchor:
  * seed),1,8) < threshold(pStart)`, the [[Sample.hashPrefix]]
  * discipline) with span length 1 + (lane hex 9 mod maxSpan) ≤ grid.
  * The grid guarantees spans can NEVER overlap, which makes every
  * position's fate a CLOSED-FORM function of its own block's hash — no
  * sequential scan, no fold recurrence, no shuffle; the whole operator
  * is one scan-side projection (the x72 stateless-gate shape, streaming
  * claim included). Sentinels carry the BLOCK ordinal (`<X_b>`):
  * T5 semantics only need input/target sentinels to MATCH — consecutive
  * renumbering would need a prefix count across blocks (an O(blocks²)
  * slice-scan per doc, the x67 interpreted-lambda hazard at book
  * length) and buys nothing.
  *
  * Expected corruption rate = pStart · (maxSpan+1)/2 / grid tokens
  * (defaults: 0.6 · 2 / 8 = 15%, T5's rate).
  *
  * Hazard discipline (x67): the token array and the per-block hash
  * array are projected as COLUMNS first; the assembly lambdas index
  * those attributes (O(1) per probe on materialized values), never an
  * array computed inside the same expression.
  */
object Augment {

  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  grid: Int = 8, maxSpan: Int = 3, pStart: Double = 0.6,
                  seed: String = "sc"): DataFrame = {
    require(grid >= 2, s"grid must be >= 2: $grid")
    require(maxSpan >= 1 && maxSpan <= grid,
      s"maxSpan $maxSpan must be in [1, grid=$grid] so spans never overlap")
    val thr = Sample.threshold(pStart)

    val base = docs.select(col(idCol), split(col(textCol), " ").as("ts"))
      .withColumn("nb",
        ((size(col("ts")) + (grid - 1)) / grid).cast("int"))
      .withColumn("hs", expr(
        s"""transform(sequence(0, nb - 1), b ->
           |  md5(concat(cast(${idCol} as string), ':',
           |             cast(b * $grid as string), ':', '$seed')))"""
          .stripMargin))

    // per-block fire verdict off the hash lane (hex 1-8; hex 9 is the
    // length lane, inlined in the assembly expressions below)
    def fired(h: Column): Column = substring(h, 1, 8) < lit(thr)

    // input: sentinel at a fired anchor, nulls inside its span, tokens
    // elsewhere; block b of position i (1-based) is (i-1) div grid
    val inputArr = expr(
      s"""transform(sequence(1, size(ts)), i ->
         |  CASE
         |    WHEN substring(element_at(hs, cast(((i-1) div $grid) + 1 as int)), 1, 8) < '$thr'
         |    THEN CASE
         |      WHEN (i-1) % $grid = 0
         |      THEN concat('<X_', cast((i-1) div $grid as string), '>')
         |      WHEN (i-1) % $grid <
         |        (cast(conv(substring(element_at(hs, cast(((i-1) div $grid) + 1 as int)), 9, 1),
         |                   16, 10) as int) % $maxSpan) + 1
         |      THEN NULL
         |      ELSE element_at(ts, i) END
         |    ELSE element_at(ts, i) END)""".stripMargin)

    // target: '<X_b> masked tokens' per fired block, in block order
    val targetArr = expr(
      s"""transform(sequence(0, nb - 1), b ->
         |  IF(substring(element_at(hs, b + 1), 1, 8) < '$thr',
         |     concat('<X_', cast(b as string), '> ',
         |       array_join(slice(ts, b * $grid + 1,
         |         (cast(conv(substring(element_at(hs, b + 1), 9, 1), 16, 10) as int)
         |           % $maxSpan) + 1), ' ')),
         |     NULL))""".stripMargin)

    base.select(col(idCol),
      array_join(filter(inputArr, x => x.isNotNull), " ").as("input"),
      array_join(filter(targetArr, x => x.isNotNull), " ").as("target"),
      size(filter(transform(sequence(lit(0), col("nb") - 1),
          b => fired(element_at(col("hs"), b + 1))),
        f => f)).cast("long").as("n_spans"))
  }
}
