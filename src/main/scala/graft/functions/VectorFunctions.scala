package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two float-array columns as a native Catalyst
  * expression with whole-stage codegen: one fused loop accumulating
  * dot/na/nb in doubles — no per-row array allocation, unlike the
  * `zip_with`+`aggregate` composition (kept in [[VectorFunctions
  * .cosineSimComposed]] as the cross-check and the SQL-oracle-parity
  * form).
  *
  * Formula, fixed for engine parity: `dot / (sqrt(na) * sqrt(nb))`,
  * accumulation in index order with each float widened to double
  * before multiply — the DuckDB oracle mirrors this exactly, so
  * results match bit-for-bit. Zero-norm inputs yield 0.0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType

  // `ArrayData.getFloat` misreads double-backed arrays, so an
  // `array<double>` argument must fail analysis, not return garbage.
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val x   = ctx.freshName("x")
      val y   = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

/** L2 norm of a float-array column as a native codegen'd expression:
  * one fused self-dot loop, no per-row array allocation. Accumulation
  * is pinned to [[CosineSimilarity]]'s parity formula — index order,
  * each float widened to double before multiply, sqrt at the end — so
  * values are bit-identical to the `sqrt(aggregate(zip_with(...)))`
  * composition (kept as [[VectorFunctions.l2NormComposed]] for the
  * cross-check) and to the DuckDB oracle's `sqrt(list_sum(...))`.
  */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  // float AND double element types are accepted (normalized vectors
  // are array<double>); the accessor is picked from the resolved type
  // because `ArrayData.getFloat` misreads double-backed arrays.
  // (`TypeCollection` is private[sql], so the check is hand-rolled.)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_norm requires array<float> or array<double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      acc += xi * xi
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x   = ctx.freshName("x")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $get;
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)

  override def prettyName: String = "l2_norm"
}

/** Squared L2 distance between a fixed window of a float-array column
  * and a literal codebook centroid — the product-quantization kernel:
  * `sum_i (v[start+i] - cent[i])^2` over `cent.length` components, no
  * per-row `slice` allocation. Accumulation is index-order with each
  * float widened to double before subtract, mirroring the DuckDB
  * oracle's `list_sum(list_transform(...))` on the same slice so
  * values match bit-for-bit.
  *
  * `start` is a 0-based offset into the vector; the centroid rides the
  * generated code as a codegen reference object (one `float[]` per
  * expression instance, not per row).
  */
case class SubvecSqDist(child: Expression, start: Int, centroid: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < centroid.length) {
      val d = x.getFloat(start + i).toDouble - centroid(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cent = ctx.addReferenceObj("centroid", centroid, "float[]")
      val i    = ctx.freshName("i")
      val acc  = ctx.freshName("acc")
      val d    = ctx.freshName("d")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < ${centroid.length}; $i++) {
         |  double $d = (double) $a.getFloat($start + $i) - (double) $cent[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  // Array[Float] breaks case-class equals; compare contents so plan
  // canonicalization (and expression dedup) sees identical kernels.
  override def equals(other: Any): Boolean = other match {
    case SubvecSqDist(c, s, v) =>
      c == child && s == start && java.util.Arrays.equals(v, centroid)
    case _ => false
  }
  override def hashCode(): Int =
    (child, start, java.util.Arrays.hashCode(centroid)).hashCode()

  override protected def withNewChildInternal(newChild: Expression): SubvecSqDist =
    copy(child = newChild)

  override def prettyName: String = "subvec_sqdist"
}

/** Max absolute component of a float-array column — the symmetric-
  * quantization scale numerator, as a native codegen'd loop (the
  * `array_max(transform(abs...))` composition runs interpreted).
  * Index-order scan, floats widened to double, so it is bit-identical
  * to the composed form and the DuckDB oracle's `list_max`.
  */
case class MaxAbs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > m) m = v
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($v > $m) $m = $v;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxAbs =
    copy(child = newChild)

  override def prettyName: String = "max_abs"
}

/** Relative L2 error of symmetric int8 quantization, fused in one
  * codegen'd loop: with scale = max|v_i| / 127 and
  * q_i = ⌊v_i/scale + 0.5⌋, returns ‖v − q·scale‖ / ‖v‖ (0.0 for a
  * zero vector). Replaces three interpreted HOF passes
  * (max-abs, err², norm²) with a single two-pass native kernel;
  * accumulation is index-order with float→double widening and the
  * rounding is pinned `floor(x + 0.5)`, so values are bit-identical
  * to the composed form and the DuckDB oracle.
  */
case class QuantRelErr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > m) m = v
      i += 1
    }
    val scale = m / 127.0
    var err2 = 0.0
    var norm2 = 0.0
    i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      val d = v - math.floor(v / scale + 0.5) * scale
      err2 += d * d
      norm2 += v * v
      i += 1
    }
    if (norm2 == 0.0) 0.0 else math.sqrt(err2 / norm2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n     = ctx.freshName("n")
      val i     = ctx.freshName("i")
      val m     = ctx.freshName("m")
      val v     = ctx.freshName("v")
      val scale = ctx.freshName("scale")
      val err2  = ctx.freshName("err2")
      val norm2 = ctx.freshName("norm2")
      val d     = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($v > $m) $m = $v;
         |}
         |double $scale = $m / 127.0;
         |double $err2 = 0.0, $norm2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  double $d = $v - java.lang.Math.floor($v / $scale + 0.5) * $scale;
         |  $err2 += $d * $d;
         |  $norm2 += $v * $v;
         |}
         |${ev.value} = ($norm2 == 0.0) ? 0.0
         |  : java.lang.Math.sqrt($err2 / $norm2);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantRelErr =
    copy(child = newChild)

  override def prettyName: String = "quant_rel_err"
}

object VectorFunctions {

  /** Native codegen'd cosine similarity (the hot-path form). */
  def cosineSim(a: Column, b: Column): Column =
    Exprs.toColumn(CosineSimilarity(Exprs.toExpr(a), Exprs.toExpr(b)))

  /** Same computation composed from built-ins only — semantically and
    * bit-identical (same accumulation order/widening); used to
    * cross-check the native expression and as the reference for the
    * DuckDB oracle SQL shape.
    */
  def cosineSimComposed(a: Column, b: Column): Column = {
    def dot(u: Column, v: Column): Column =
      aggregate(
        zip_with(u, v, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, p) => acc + p)
    val d  = dot(a, b)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0.0 || nb === 0.0, 0.0)
      .otherwise(d / (sqrt(na) * sqrt(nb)))
  }

  /** Dot product with the pinned parity formula (index-order, float →
    * double widening) — composed built-ins, codegen-compatible.
    */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  /** Native codegen'd L2 norm (the hot-path form). */
  def l2Norm(v: Column): Column =
    Exprs.toColumn(L2Norm(Exprs.toExpr(v)))

  /** Same computation composed from built-ins only (sqrt of self-dot,
    * same accumulation order) — the cross-check / oracle-parity form.
    */
  def l2NormComposed(v: Column): Column = sqrt(dotProduct(v, v))

  /** Native codegen'd max absolute component (the int8 scale kernel). */
  def maxAbs(v: Column): Column =
    Exprs.toColumn(MaxAbs(Exprs.toExpr(v)))

  /** Same computation composed from built-ins only — the cross-check /
    * oracle-parity form.
    */
  def maxAbsComposed(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Native codegen'd relative L2 error of symmetric int8 quantization
    * (scale = max|v|/127, pinned floor(x+0.5) rounding).
    */
  def quantRelErr(v: Column): Column =
    Exprs.toColumn(QuantRelErr(Exprs.toExpr(v)))

  /** Same computation composed from built-ins only — the cross-check /
    * oracle-parity form.
    */
  def quantRelErrComposed(v: Column): Column = {
    val scale = maxAbsComposed(v) / 127.0
    def d(c: Column): Column = c.cast("double")
    val err2 = aggregate(
      transform(v, x => {
        val diff = d(x) - floor(d(x) / scale + 0.5) * scale
        diff * diff
      }),
      lit(0.0), (acc, e) => acc + e)
    val norm2 = aggregate(
      transform(v, x => d(x) * d(x)), lit(0.0), (acc, e) => acc + e)
    when(norm2 === 0.0, 0.0).otherwise(sqrt(err2 / norm2))
  }

  /** Native codegen'd subvector squared-L2 distance to a literal
    * centroid (the product-quantization kernel). `start` is 0-based.
    */
  def subvecSqDist(v: Column, start: Int, centroid: Array[Float]): Column =
    Exprs.toColumn(SubvecSqDist(Exprs.toExpr(v), start, centroid))

  /** Same computation composed from built-ins only (slice + zip_with +
    * aggregate) — the cross-check / oracle-parity form. `start` 0-based.
    */
  def subvecSqDistComposed(v: Column, start: Int, centroid: Array[Float]): Column =
    aggregate(
      zip_with(slice(v, start + 1, centroid.length), typedlit(centroid),
        (x, c) => (x.cast("double") - c.cast("double")) *
          (x.cast("double") - c.cast("double"))),
      lit(0.0), (acc, p) => acc + p)

  /** Unit-normalize a vector; zero vectors pass through unchanged. */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n === 0.0, v.cast("array<double>"))
      .otherwise(transform(v, x => x.cast("double") / n))
  }

  /** Sign-pattern bucket over the first `k` dimensions — axis-aligned
    * random-hyperplane LSH for cosine space. Vectors with equal sign
    * pattern are likely-similar candidates; at scale this is the
    * shuffle key that replaces the O(n²) cross join.
    */
  def signBucket(v: Column, k: Int): Column =
    concat_ws("", (1 to k).map(i =>
      when(element_at(v, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
