package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native integer dot product over two `array<long>` or `array<int>`
  * columns (element type read from the child schema; int inputs accumulate
  * into long).
  *
  * The pairwise scoring in X1/X2 (embedding dedup, cosine top-k) runs once
  * per *candidate pair* — the hot path of the similarity family. Spark's
  * higher-order functions (`aggregate(zip_with(...))`) evaluate their
  * lambdas interpreted, per element, with an allocated intermediate array
  * per pair; at |corpus|^2 pairs that dominates the whole benchmark. This
  * expression is a tight primitive loop with full `doGenCode`, so the
  * scoring stays inside WholeStageCodegen with zero allocation. Int
  * quantization additionally halves the bytes copied per joined pair.
  *
  * Null semantics: null if either array is null (BinaryExpression default);
  * mismatched lengths score over the common prefix.
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  private def elemIsInt(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (xi, yi) = (elemIsInt(left), elemIsInt(right))
    var sum = 0L
    var i = 0
    while (i < n) {
      val xv = if (xi) x.getInt(i).toLong else x.getLong(i)
      val yv = if (yi) y.getInt(i).toLong else y.getLong(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val getA = if (elemIsInt(left)) s"(long) $a.getInt($i)" else s"$a.getLong($i)"
      val getB = if (elemIsInt(right)) s"(long) $b.getInt($i)" else s"$b.getLong($i)"
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $sum = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $sum += $getA * $getB;
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native PQ encoder: maps a quantized vector (`array<int>`) to its
  * per-subspace nearest-centroid codes (`array<int>`, one per subspace).
  *
  * The declarative form — numSub `array_min`s over `codes`-element
  * struct arrays, each struct holding a [[DotLong]] — is semantically
  * identical but allocates a struct per (row, subspace, code) and blows
  * the expression tree up to thousands of nodes (measured ~6 s for a 5k
  * corpus). This expression is the same argmin as one tight primitive
  * loop: for each subspace, `dist = |c|^2 - 2<sv,c>` (the row's own
  * `|sv|^2` term is constant within a subspace and cannot change the
  * argmin, so it is dropped), ties to the lower code id — matching the
  * oracle's `ORDER BY dist, code` exactly.
  *
  * The codebook rides along as a reference object (driver-trained, a few
  * KB); generated code makes one virtual call per row and stays inside
  * WholeStageCodegen.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Int]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val numSub = codebook.length
  @transient private lazy val subDim = codebook(0)(0).length
  // |c|^2 per (subspace, code), precomputed once
  @transient private lazy val c2: Array[Array[Long]] =
    codebook.map(_.map(c => c.map(v => v.toLong * v).sum))

  def encode(q: ArrayData): ArrayData = {
    // UnsafeArrayData does NOT bounds-check getInt: a vector shorter than
    // the codebook's dimensionality would silently read adjacent buffer
    // bytes as components — fail loudly instead
    require(q.numElements() == numSub * subDim,
      s"vector dim ${q.numElements()} != codebook dim ${numSub * subDim}")
    val out = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      val cents = codebook(m)
      val off = m * subDim
      var best = 0
      var bestDist = Long.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var dot = 0L
        var i = 0
        while (i < subDim) { dot += q.getInt(off + i).toLong * c(i); i += 1 }
        val dist = c2(m)(j) - 2L * dot
        // strict < keeps the FIRST minimum: ties go to the lower code id
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native ADC table builder: maps a quantized QUERY vector to its flat
  * per-subspace inner-product lookup table — entry `m * codes + j` is
  * `<sv_m, centroid_mj>`. The declarative twin (numSub `array(...)`
  * columns of `codes` [[DotLong]]s each) is a 1000+-node expression tree
  * whose analysis/codegen time dwarfs the actual work; this is the same
  * arithmetic as one loop and one flat `array<long>` per query row.
  */
case class PqTable(child: Expression, codebook: Array[Array[Array[Int]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_table"

  @transient private lazy val numSub = codebook.length
  @transient private lazy val codes = codebook(0).length
  @transient private lazy val subDim = codebook(0)(0).length

  def table(q: ArrayData): ArrayData = {
    require(q.numElements() == numSub * subDim,
      s"vector dim ${q.numElements()} != codebook dim ${numSub * subDim}")
    val out = new Array[Long](numSub * codes)
    var m = 0
    while (m < numSub) {
      val cents = codebook(m)
      val off = m * subDim
      var j = 0
      while (j < codes) {
        val c = cents(j)
        var dot = 0L
        var i = 0
        while (i < subDim) { dot += q.getInt(off + i).toLong * c(i); i += 1 }
        out(m * codes + j) = dot
        j += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    table(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", this, classOf[PqTable].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.table($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native inverted-list assignment: nearest centroid of a quantized
  * vector as `struct(list_id int, dist long)`, dist the exact integer
  * |q - c|^2, ties to the lower list id.
  *
  * The declarative twin — `array_min` over an `array(...)` of nlist
  * struct builds each holding a [[DotLong]] — is semantically identical
  * but its expression tree grows linearly with nlist: at nlist = 64 the
  * generated method blows past JIT budgets and the per-row cost goes
  * catastrophic (measured 3.8 s to assign 20k rows; this expression does
  * the same work in one fused loop at a small fraction of that). The
  * assignment step is the scan-side hot path of IVF, SemDeDup, and
  * distributed k-means, and it runs once per corpus row — at 100 TB it
  * must be a tight loop, not a tree.
  *
  * The centroid matrix rides along as a reference object (driver-held,
  * a few KB) like [[PqEncode]]'s codebook; |c|^2 terms are precomputed.
  */
case class CentroidArgmin(child: Expression, cents: Array[Array[Int]])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("list_id", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("dist", LongType, nullable = false)))
  override def prettyName: String = "centroid_argmin"

  @transient private lazy val c2: Array[Long] =
    cents.map(_.map(v => v.toLong * v).sum)

  def argmin(q: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = cents(0).length
    require(q.numElements() == dim,
      s"vector dim ${q.numElements()} != centroid dim $dim")
    var n2 = 0L
    var i = 0
    while (i < dim) { val v = q.getInt(i).toLong; n2 += v * v; i += 1 }
    var best = 0
    var bestDist = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0L
      var k = 0
      while (k < dim) { dot += q.getInt(k).toLong * c(k); k += 1 }
      val dist = n2 - 2L * dot + c2(j)
      // strict < keeps the FIRST minimum: ties go to the lower list id
      if (dist < bestDist) { bestDist = dist; best = j }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestDist)
  }

  override protected def nullSafeEval(input: Any): Any =
    argmin(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgmin", this,
      classOf[CentroidArgmin].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.argmin($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[CentroidArgmin]] with the SECOND-smallest distance carried along:
  * `struct(list_id int, dist long, dist2 long)` — the one extra lane
  * the simplified-silhouette audit needs (a = own-centroid distance =
  * the min, b = nearest OTHER centroid = the second min, because the
  * final assignment IS the argmin over the same centroid matrix). One
  * fused loop, same tie rule (first minimum wins, so an exact tie
  * lands in dist2 and the silhouette reads 0). Requires >= 2 centroids
  * — there is no "other cluster" at k = 1.
  */
case class CentroidArgmin2(child: Expression, cents: Array[Array[Int]])
    extends UnaryExpression {
  require(cents.length >= 2,
    s"centroid_argmin2 needs >= 2 centroids, got ${cents.length}")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("list_id", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("dist", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dist2", LongType, nullable = false)))
  override def prettyName: String = "centroid_argmin2"

  @transient private lazy val c2: Array[Long] =
    cents.map(_.map(v => v.toLong * v).sum)

  def argmin2(q: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = cents(0).length
    require(q.numElements() == dim,
      s"vector dim ${q.numElements()} != centroid dim $dim")
    var n2 = 0L
    var i = 0
    while (i < dim) { val v = q.getInt(i).toLong; n2 += v * v; i += 1 }
    var best = 0
    var bestDist = Long.MaxValue
    var secondDist = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0L
      var k = 0
      while (k < dim) { dot += q.getInt(k).toLong * c(k); k += 1 }
      val dist = n2 - 2L * dot + c2(j)
      // strict < keeps the FIRST minimum (ties to the lower list id);
      // a displaced previous best is by construction the running second
      if (dist < bestDist) {
        secondDist = bestDist; bestDist = dist; best = j
      } else if (dist < secondDist) {
        secondDist = dist
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestDist, secondDist)
  }

  override protected def nullSafeEval(input: Any): Any =
    argmin2(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgmin2", this,
      classOf[CentroidArgmin2].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.argmin2($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native residual: `q - cents(listId)` over quantized ints — the
  * IVF-PQ encoding step. The centroid index arrives as a COLUMN (each
  * row subtracts its own list's centroid), which a static literal
  * expression cannot express; the centroid table rides along as a
  * reference object like [[PqEncode]]'s codebook.
  */
case class VecSubCentroid(left: Expression, right: Expression,
                          cents: Array[Array[Int]])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_sub_centroid"

  def residual(q: ArrayData, listId: Int): ArrayData = {
    val c = cents(listId)
    require(q.numElements() == c.length,
      s"vector dim ${q.numElements()} != centroid dim ${c.length}")
    val out = new Array[Int](c.length)
    var i = 0
    while (i < c.length) { out(i) = q.getInt(i) - c(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    residual(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecSub", this, classOf[VecSubCentroid].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.residual($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** dot_long(a, b): exact integer dot product of quantized vectors. */
  def dot_long(a: Column, b: Column): Column =
    GraftBridge.column(DotLong(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** vec_sub_centroid(q, listId): q minus the listId-th centroid. */
  def vec_sub_centroid(q: Column, listId: Column, cents: Array[Array[Int]]): Column =
    GraftBridge.column(VecSubCentroid(GraftBridge.expression(q),
      GraftBridge.expression(listId), cents))

  /** pq_encode(q, codebook): per-subspace nearest-centroid codes. */
  def pq_encode(q: Column, codebook: Array[Array[Array[Int]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(q), codebook))

  /** pq_table(q, codebook): flat ADC inner-product lookup table. */
  def pq_table(q: Column, codebook: Array[Array[Array[Int]]]): Column =
    GraftBridge.column(PqTable(GraftBridge.expression(q), codebook))

  /** centroid_argmin(q, cents): struct(list_id, dist) of the nearest
    * centroid — one fused loop instead of an nlist-wide struct array.
    */
  def centroid_argmin(q: Column, cents: Array[Array[Int]]): Column =
    GraftBridge.column(CentroidArgmin(GraftBridge.expression(q), cents))

  /** centroid_argmin2(q, cents): struct(list_id, dist, dist2) — the
    * nearest centroid plus the second-nearest distance (the
    * simplified-silhouette lanes) in the same fused loop.
    */
  def centroid_argmin2(q: Column, cents: Array[Array[Int]]): Column =
    GraftBridge.column(CentroidArgmin2(GraftBridge.expression(q), cents))
}
