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
