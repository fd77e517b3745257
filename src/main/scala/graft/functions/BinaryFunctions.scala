package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mean unsigned byte value of a binary column — a cheap whole-blob
  * signal statistic (useful as a pre-decode sanity screen on media
  * columns), as a codegen'd expression (replaces a per-character
  * split+ascii array pipeline that allocated one string per byte).
  */
case class ByteMean(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) 0.0
    else {
      var sum = 0L
      var i   = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      sum.toDouble / bytes.length
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val sum = ctx.freshName("sum")
      val i   = ctx.freshName("i")
      s"""
         |long $sum = 0L;
         |for (int $i = 0; $i < $b.length; $i++) { $sum += $b[$i] & 0xff; }
         |${ev.value} = $b.length == 0 ? 0.0 : ((double) $sum) / $b.length;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ByteMean =
    copy(child = c)

  override def prettyName: String = "byte_mean"
}

object BinaryFunctions {
  def byteMean(c: Column): Column = Exprs.toColumn(ByteMean(Exprs.toExpr(c)))
}
