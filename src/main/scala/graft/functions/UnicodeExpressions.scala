package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `unicode_normalize(text, form)` — Unicode normalization (NFC/NFD/NFKC/
 * NFKD) as a native codegen expression over the JDK's `java.text
 * .Normalizer` (the Unicode-conformant implementation the JVM ships;
 * normalization forms are fully specified by UAX #15, so any conformant
 * engine — utf8proc in the DuckDB oracle included — produces identical
 * bytes for assigned codepoints).
 *
 * The fast path costs nothing on clean corpora: `Normalizer.isNormalized`
 * is a cheap scan that short-circuits the (allocating) transform for the
 * overwhelmingly-common already-normalized document, and pure-ASCII spans
 * short-circuit inside the JDK's quick-check before that.
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form.toUpperCase)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize needs a string child, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UnicodeNormalize.compute(input.asInstanceOf[UTF8String].toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnicodeNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val formRef = ctx.addReferenceObj("normForm", normForm, classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = UTF8String.fromString(
         |  $cls.compute($a.toString(), $formRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  def compute(s: String, form: Normalizer.Form): String =
    if (Normalizer.isNormalized(s, form)) s else Normalizer.normalize(s, form)

  def apply(c: Column, form: String): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      UnicodeNormalize(org.apache.spark.sql.graftshim.GraftShims.expression(c), form))
}
