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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
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
  )

  /** Register all graft functions on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
