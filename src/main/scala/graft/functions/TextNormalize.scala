package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst
  * expression — the first text-cleaning step a multilingual corpus
  * needs: scraped pages mix precomposed characters (é = U+00E9) with
  * decomposed sequences (e + U+0301), and every downstream exact-hash
  * dedup, shingle, or token count silently treats them as DIFFERENT
  * text until canonical composition makes byte equality mean
  * character equality. Spark ships no normalizer function; the
  * standard workaround is a Scala/Python UDF, which breaks
  * whole-stage codegen around it. This expression keeps the pipeline
  * fused: `doGenCode` emits one static call into the JDK's
  * `java.text.Normalizer` (ICU-equivalent NFC tables, identical
  * output to DuckDB's `nfc_normalize` — which is what lets the q163
  * oracle compare byte-for-byte).
  *
  * An ASCII fast path skips normalization entirely: `Normalizer
  * .isNormalized` is O(n) over chars with no allocation, and real
  * corpora are dominantly ASCII, so the common row pays one scan and
  * zero copies. */
object NfcNormalizeFn {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"${TextNormalize.NfcName} needs a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeFn.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeFn$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {

  val NfcName = "graft_nfc"

  /** Register through [[GraftExtensions]]' companion hook. */
  private[functions] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(NfcName),
      new ExpressionInfo(classOf[NfcNormalize].getName, NfcName),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$NfcName(s) takes exactly 1 argument")
        NfcNormalize(args.head)
      }))

  /** Codegen'd Unicode NFC normalization of a string column. Requires
    * a session built with [[GraftExtensions]]. */
  def nfc(c: Column): Column = call_function(NfcName, c)
}
