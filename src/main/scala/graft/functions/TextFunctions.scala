package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Java `String.hashCode` as a native Catalyst expression with
  * whole-stage codegen — gives file-layout parity with the reference's
  * partitioner (`Math.abs(key.hashCode) % n`,
  * `mapreduce/servant/PartitionerServant.java:20-23`) without a Scala
  * UDF in the hot path. The reference's `Math.abs(Integer.MIN_VALUE)`
  * negative-result crash is a caller concern; `graft` always pairs this
  * with `pmod`.
  */
case class JavaStringHash(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c).toString().hashCode()")

  override protected def withNewChildInternal(c: Expression): JavaStringHash =
    copy(child = c)

  override def prettyName: String = "java_string_hash"
}

object TextFunctions {
  /** Java String.hashCode of a string column (codegen'd, no UDF). */
  def javaStringHash(c: Column): Column =
    Exprs.toColumn(JavaStringHash(Exprs.toExpr(c)))
}
