package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Centroid-model scoring kernels with the model riding as a CODEGEN
  * REFERENCE OBJECT (one `float[][]` per expression instance) instead
  * of k inlined literal subtrees.
  *
  * Motivation (optimization round 16, guide §1/§4): the previous forms
  * — `greatest(struct(cosine_similarity(v, lit(cv₀)), 0), …, struct(…,
  * k−1))` and its `sort_array`/`least` siblings — materialize k×dim
  * literal leaves in the plan. At the production cell count (k = ⌈√N⌉:
  * 45 at the bench SF, thousands at corpus scale) every run pays
  * O(k·dim) ANALYSIS nodes and a generated method that inlines k
  * unrolled dot-product loops; measured on the bench box the one-Lloyd
  * assignment scan over 2 000 rows cost ~1.2 s of which essentially
  * all was plan/codegen overhead (interpreted mode was FASTER), and a
  * deployment-scale k would overflow codegen limits outright. These
  * kernels keep the plan at ONE node of constant size whatever k is:
  * the loop over centroids is data, not code.
  *
  * Parity contract: the arithmetic is bit-identical to the composed
  * forms (same index-order accumulation, float→double widening, same
  * zero-norm rule, same tie direction), asserted property-style in
  * CellKernelsSpec — so every oracle hash is unchanged.
  */
private[graft] object CellKernels {

  /** max-by (ccos, cid) — the `greatest(struct(ccos, cid)…)` rule:
    * higher cosine wins, ties to the HIGHER cell id.
    */
  def bestCell(v: Column, cents: Seq[(Int, Array[Float])]): Column =
    Exprs.toColumn(BestCell(Exprs.toExpr(v),
      cents.map(_._1).toArray, cents.map(_._2).toArray))

  /** Top-`n` cell ids by (ccos DESC, cid DESC) — the
    * `slice(sort_array(array(struct…), asc=false), 1, n).cid` rule.
    */
  def topCells(v: Column, cents: Seq[(Int, Array[Float])], n: Int): Column =
    Exprs.toColumn(TopCells(Exprs.toExpr(v),
      cents.map(_._1).toArray, cents.map(_._2).toArray, n))

  /** min-by (sqdist, cid) over one PQ subspace window — the
    * `least(struct(d, cid)…)` rule: smaller distance wins, ties to the
    * LOWER code id. `start` is the 0-based subvector offset.
    */
  def pqCode(v: Column, start: Int, cb: Seq[(Int, Array[Float])]): Column =
    Exprs.toColumn(NearestSubCode(Exprs.toExpr(v), start,
      cb.map(_._1).toArray, cb.map(_._2).toArray))

  /** Driver-side evaluation of [[TopCells]] over ONE collected vector
    * — it invokes the SAME expression instance's `nullSafeEval`, so a
    * serving path that derives its probe cells on the driver (from a
    * bounded, already-collected query batch) cannot drift from the
    * kernel the executors run: bit parity by construction, not by
    * parallel implementation (the pqLuts discipline, minus the
    * re-implementation).
    */
  def topCellsEval(v: Array[Float], cents: Seq[(Int, Array[Float])],
      n: Int): Array[Int] =
    TopCells(
      org.apache.spark.sql.catalyst.expressions.Literal(
        null, ArrayType(FloatType)),
      cents.map(_._1).toArray, cents.map(_._2).toArray, n)
      .nullSafeEval(UnsafeArrayData.fromPrimitiveArray(v))
      .asInstanceOf[ArrayData].toIntArray()
}

/** Shared shape of the three kernels: unary over `array<float>`, model
  * as constructor state, content-based equality so plan
  * canonicalization (and subexpression elimination) treats equal
  * models as equal kernels.
  */
private[functions] trait CentroidKernel extends ExpectsInputTypes {
  self: Expression =>
  def cids: Array[Int]
  def cents: Array[Array[Float]]
  require(cids.length == cents.length && cids.nonEmpty,
    s"centroid kernel: ${cids.length} ids vs ${cents.length} vectors")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  protected def modelEquals(o: CentroidKernel): Boolean =
    java.util.Arrays.equals(cids, o.cids) &&
      cents.length == o.cents.length &&
      cents.indices.forall(i => java.util.Arrays.equals(cents(i), o.cents(i)))
  protected def modelHash: Int =
    (java.util.Arrays.hashCode(cids),
      cents.map(java.util.Arrays.hashCode).toSeq).hashCode()
}

/** struct(ccos, cid) of the best-scoring centroid under cosine — the
  * [[CosineSimilarity]] formula per centroid (index-order double
  * accumulation, zero-norm → 0.0), max by (ccos, cid).
  */
case class BestCell(child: Expression, cids: Array[Int],
    cents: Array[Array[Float]])
    extends UnaryExpression with CentroidKernel {
  override def dataType: DataType = StructType(Seq(
    StructField("ccos", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bestCos = 0.0; var bestCid = 0; var first = true
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(x.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = cv(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val cos =
        if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      if (first || cos > bestCos || (cos == bestCos && cids(c) > bestCid)) {
        first = false; bestCos = cos; bestCid = cids(c)
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCos, bestCid))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cc  = ctx.addReferenceObj("cents", cents, "float[][]")
      val ids = ctx.addReferenceObj("cids", cids, "int[]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val cos = ctx.freshName("cos")
      val bc = ctx.freshName("bestCos"); val bi = ctx.freshName("bestCid")
      s"""
         |double $bc = 0.0; int $bi = 0; boolean ${bc}_f = true;
         |for (int $c = 0; $c < $cc.length; $c++) {
         |  float[] $cv = $cc[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $cv[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $cos = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if (${bc}_f || $cos > $bc || ($cos == $bc && $ids[$c] > $bi)) {
         |    ${bc}_f = false; $bc = $cos; $bi = $ids[$c];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$bc, $bi});
       """.stripMargin
    })

  override def equals(other: Any): Boolean = other match {
    case o: BestCell => child == o.child && modelEquals(o)
    case _ => false
  }
  override def hashCode(): Int = (child, modelHash).hashCode()
  override protected def withNewChildInternal(newChild: Expression): BestCell =
    copy(child = newChild)
  override def prettyName: String = "best_cell"
}

/** The top-`n` cell ids by (ccos DESC, cid DESC): same per-centroid
  * cosine as [[BestCell]], then an O(k·n) selection (n is the probe
  * fan-out, 2-4). Output length = min(n, k), matching
  * `slice(sort_array(…), 1, n)`.
  */
case class TopCells(child: Expression, cids: Array[Int],
    cents: Array[Array[Float]], n: Int)
    extends UnaryExpression with CentroidKernel {
  require(n >= 1, s"top_cells: n $n < 1")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = cents.length
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      val ln = math.min(x.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < ln) {
        val xi = x.getFloat(i).toDouble
        val yi = cv(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      cos(c) =
        if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    val m = math.min(n, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!used(j) && (best < 0 || cos(j) > cos(best) ||
            (cos(j) == cos(best) && cids(j) > cids(best)))) best = j
        j += 1
      }
      used(best) = true; out(r) = cids(best)
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cc  = ctx.addReferenceObj("cents", cents, "float[][]")
      val ids = ctx.addReferenceObj("cids", cids, "int[]")
      val k = cents.length
      val cos  = ctx.freshName("cos");  val used = ctx.freshName("used")
      val out  = ctx.freshName("out");  val c = ctx.freshName("c")
      val i = ctx.freshName("i");       val ln = ctx.freshName("ln")
      val cv = ctx.freshName("cv");     val dot = ctx.freshName("dot")
      val na = ctx.freshName("na");     val nb = ctx.freshName("nb")
      val x = ctx.freshName("x");       val y = ctx.freshName("y")
      val r = ctx.freshName("r");       val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      s"""
         |double[] $cos = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  float[] $cv = $cc[$c];
         |  int $ln = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $ln; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $cv[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  $cos[$c] = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
         |int[] $out = new int[${math.min(n, k)}];
         |boolean[] $used = new boolean[$k];
         |for (int $r = 0; $r < ${math.min(n, k)}; $r++) {
         |  int $best = -1;
         |  for (int $j = 0; $j < $k; $j++) {
         |    if (!$used[$j] && ($best < 0 || $cos[$j] > $cos[$best] ||
         |        ($cos[$j] == $cos[$best] && $ids[$j] > $ids[$best]))) $best = $j;
         |  }
         |  $used[$best] = true; $out[$r] = $ids[$best];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override def equals(other: Any): Boolean = other match {
    case o: TopCells => child == o.child && n == o.n && modelEquals(o)
    case _ => false
  }
  override def hashCode(): Int = (child, n, modelHash).hashCode()
  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
  override def prettyName: String = "top_cells"
}

/** The PQ encoder for one subspace: code id of the nearest codebook
  * centroid by squared L2 over the window [start, start+len) — the
  * [[SubvecSqDist]] formula per centroid, min by (d, cid): smaller
  * distance wins, ties to the LOWER code id.
  */
case class NearestSubCode(child: Expression, start: Int, cids: Array[Int],
    cents: Array[Array[Float]])
    extends UnaryExpression with CentroidKernel {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bestD = 0.0; var bestCid = 0; var first = true
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var acc = 0.0
      var i = 0
      while (i < cv.length) {
        val d = x.getFloat(start + i).toDouble - cv(i).toDouble
        acc += d * d
        i += 1
      }
      if (first || acc < bestD || (acc == bestD && cids(c) < bestCid)) {
        first = false; bestD = acc; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cc  = ctx.addReferenceObj("cents", cents, "float[][]")
      val ids = ctx.addReferenceObj("cids", cids, "int[]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val cv = ctx.freshName("cv"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val bd = ctx.freshName("bestD")
      val bi = ctx.freshName("bestCid")
      s"""
         |double $bd = 0.0; int $bi = 0; boolean ${bd}_f = true;
         |for (int $c = 0; $c < $cc.length; $c++) {
         |  float[] $cv = $cc[$c];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $cv.length; $i++) {
         |    double $d = (double) $a.getFloat($start + $i) - (double) $cv[$i];
         |    $acc += $d * $d;
         |  }
         |  if (${bd}_f || $acc < $bd || ($acc == $bd && $ids[$c] < $bi)) {
         |    ${bd}_f = false; $bd = $acc; $bi = $ids[$c];
         |  }
         |}
         |${ev.value} = $bi;
       """.stripMargin
    })

  override def equals(other: Any): Boolean = other match {
    case o: NearestSubCode => child == o.child && start == o.start && modelEquals(o)
    case _ => false
  }
  override def hashCode(): Int = (child, start, modelHash).hashCode()
  override protected def withNewChildInternal(newChild: Expression): NearestSubCode =
    copy(child = newChild)
  override def prettyName: String = "nearest_sub_code"
}
