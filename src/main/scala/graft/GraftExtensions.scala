package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** Registers graft's native expressions as SQL functions, so
  * `spark.sql("SELECT simhash60(text) …")` works next to the Column
  * API. Two entry points:
  *
  *  - config: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard extension-injection path for clusters), or
  *  - programmatic: `GraftExtensions.register(spark)` on a live
  *    session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private[graft] val definitions
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("java_string_hash",
      new ExpressionInfo(classOf[JavaStringHash].getName, "java_string_hash"),
      exprs => JavaStringHash(exprs.head)),
    ("shingle_hash32",
      new ExpressionInfo(classOf[ShingleHash32].getName, "shingle_hash32"),
      exprs => exprs match {
        case Seq(c)    => ShingleHash32(c, 3)
        case Seq(c, n) => ShingleHash32(c, intArg(n, "shingle width"))
        case _ => throw new IllegalArgumentException(
          "shingle_hash32(text[, n]) takes 1 or 2 arguments")
      }),
    ("simhash60",
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      exprs => SimHash60(exprs.head)),
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      exprs => CosineSimilarity(exprs(0), exprs(1))),
    ("byte_mean",
      new ExpressionInfo(classOf[ByteMean].getName, "byte_mean"),
      exprs => ByteMean(exprs.head)),
    // aggregate: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression during resolution, same as built-in aggs
    ("space_saving_topk",
      new ExpressionInfo(classOf[SpaceSavingTopK].getName, "space_saving_topk"),
      exprs => {
        require(exprs.length == 2,
          "space_saving_topk(term, capacity) takes 2 arguments")
        SpaceSavingTopK(exprs.head, intArg(exprs(1), "capacity"))
      }),
    // count_min_estimates(term, 'q1,q2,...', depth, width) — the SQL
    // surface flattens the query-term list into one comma-joined
    // literal (terms are corpus tokens, comma-free)
    ("count_min_estimates",
      new ExpressionInfo(classOf[CountMinEstimates].getName,
        "count_min_estimates"),
      exprs => {
        require(exprs.length == 4,
          "count_min_estimates(term, 'q1,q2,...', depth, width) takes 4 arguments")
        val qs = exprs(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            // trim + drop empties so 'a, b' or a trailing comma cannot
            // silently register a ' b' / '' query term
            s.toString.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
          case other => throw new IllegalArgumentException(
            s"query terms must be a string literal, got: $other")
        }
        require(qs.nonEmpty,
          "count_min_estimates: the query-term list parsed to zero " +
            "non-blank terms")
        CountMinEstimates(exprs.head, qs,
          intArg(exprs(2), "depth"), intArg(exprs(3), "width"))
      }),
    ("l2_norm",
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      exprs => L2Norm(exprs.head)),
    ("max_abs",
      new ExpressionInfo(classOf[MaxAbs].getName, "max_abs"),
      exprs => MaxAbs(exprs.head)),
    ("quant_rel_err",
      new ExpressionInfo(classOf[QuantRelErr].getName, "quant_rel_err"),
      exprs => QuantRelErr(exprs.head)),
    // subvec_sqdist(vec, start, centroid...) — start and the centroid
    // components must be literals (the codebook is a model, not data)
    ("subvec_sqdist",
      new ExpressionInfo(classOf[SubvecSqDist].getName, "subvec_sqdist"),
      exprs => {
        require(exprs.length >= 3,
          "subvec_sqdist(vec, start, c0, c1, ...) needs a vector, a " +
            "start offset, and at least one centroid component")
        // evaluated at registration, so casts of literals fold too
        val cent = exprs.drop(2).map { e =>
          require(e.foldable,
            s"centroid components must be literal values, got: $e")
          e.eval() match {
            case f: Float  => f
            case d: Double => d.toFloat
            case i: Int    => i.toFloat
            case l: Long   => l.toFloat
            case dec: org.apache.spark.sql.types.Decimal => dec.toFloat
            case other => throw new IllegalArgumentException(
              s"centroid components must be numeric literals, got: $other")
          }
        }.toArray
        SubvecSqDist(exprs.head, intArg(exprs(1), "start offset"), cent)
      }),
  )

  /** Register all graft functions on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    ensureStrategies(spark)
  }

  /** Plan graft's custom logical operators ([[graft.plans.TopKStrategy]])
    * on a live session — `experimental.extraStrategies` is the
    * documented runtime seam; the config path is
    * `injectPlannerStrategy` in [[GraftExtensions]]. Idempotent.
    */
  def ensureStrategies(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies = cur :+ graft.plans.TopKStrategy
  }
}
