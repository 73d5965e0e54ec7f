package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GREL functions whose reference implementation is commons-lang3
  * (GRELFunctions.java:493-498 splitByCharType and :588-593 diff delegate
  * through io.fno.grel StringFunctions to StringUtils) — called directly
  * from Spark's own classpath so the semantics match the reference exactly:
  *   - splitByCharacterType treats UPPERCASE and lowercase as DISTINCT
  *     character types ("HenryCTaylor" → [H, enry, CT, aylor]) — a regex
  *     letter-run class cannot reproduce that;
  *   - difference returns "" (not null) for equal strings, and the suffix
  *     of the second string from the first divergence otherwise.
  * Codegen'd like PhoneticExpr; the commons statics are pure functions.
  */
object LangText {
  def splitByCharType(s: UTF8String): ArrayData = {
    val parts = org.apache.commons.lang3.StringUtils.splitByCharacterType(s.toString)
    new GenericArrayData(parts.map(p => UTF8String.fromString(p): Any))
  }
  def difference(a: UTF8String, b: UTF8String): UTF8String =
    UTF8String.fromString(
      org.apache.commons.lang3.StringUtils.difference(a.toString, b.toString))
}

case class SplitByCharTypeExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  // analysis-time type check: a non-string child gets a cast or a clear
  // AnalysisException instead of a runtime ClassCastException
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    LangText.splitByCharType(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.LangText.splitByCharType($c)")
  override protected def withNewChildInternal(newChild: Expression): SplitByCharTypeExpr =
    copy(child = newChild)
}

/** Null semantics follow commons-lang3 `difference`, which the reference
  * forwards nulls into (GRELFunctions.java:588-593 — "diff can handle null
  * values"): difference(null, b) = b, difference(a, null) = a, both null →
  * null. That is NOT the default null-intolerant contract, hence the custom
  * eval/codegen instead of nullSafeEval.
  */
case class StringDiffExpr(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable && right.nullable
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input).asInstanceOf[UTF8String]
    val b = right.eval(input).asInstanceOf[UTF8String]
    if (a == null && b == null) null
    else if (a == null) b
    else if (b == null) a
    else LangText.difference(a, b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val u = "org.apache.spark.unsafe.types.UTF8String"
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = ${l.isNull} && ${r.isNull};
      $u ${ev.value} = null;
      if (!${ev.isNull}) {
        if (${l.isNull}) { ${ev.value} = ${r.value}; }
        else if (${r.isNull}) { ${ev.value} = ${l.value}; }
        else { ${ev.value} =
          graft.functions.expressions.LangText.difference(${l.value}, ${r.value}); }
      }""")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): StringDiffExpr = copy(left = newLeft, right = newRight)
}

object LangExprs {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def splitByCharTypeCol(c: Column): Column = column(SplitByCharTypeExpr(expression(c)))
  def diffCol(a: Column, b: Column): Column =
    column(StringDiffExpr(expression(a), expression(b)))
}
