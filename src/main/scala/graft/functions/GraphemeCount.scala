package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Grapheme-cluster length as a native codegen'd Catalyst expression
  * — the length a LENGTH FILTER should actually measure: `length()`
  * counts codepoints, so a Vietnamese or Hindi document full of
  * combining marks looks 1.5–2× "longer" than the same visible text
  * precomposed, and a character-budget chunker (q48) slices inside a
  * user-perceived character. `graft_grapheme_count` counts
  * user-perceived characters via the JDK's `BreakIterator`
  * character instance.
  *
  * The per-partition iterator is THREAD-LOCAL — BreakIterator is
  * mutable and not thread-safe, and allocating one per row would
  * dominate the loop; `setText` re-aims the shared instance per call.
  *
  * PARITY SCOPE (what the q168 oracle pins): combining-mark
  * sequences, which JDK legacy grapheme rules and DuckDB's
  * UAX#29 `length_grapheme` agree on exactly. Extended pictographic
  * ZWJ sequences (emoji families) are where the two tailorings
  * diverge and are deliberately out of the gate's data. */
object GraphemeCountFn {
  private val iter = new ThreadLocal[java.text.BreakIterator] {
    override def initialValue(): java.text.BreakIterator =
      java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
  }

  def count(s: UTF8String): Long = {
    val it = iter.get()
    it.setText(s.toString)
    var n = 0L
    while (it.next() != java.text.BreakIterator.DONE) n += 1L
    n
  }
}

case class GraphemeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"${GraphemeCountFns.Name} needs a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    GraphemeCountFn.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraphemeCountFn$$.MODULE$$.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraphemeCountFns {

  val Name = "graft_grapheme_count"

  private[functions] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(Name),
      new ExpressionInfo(classOf[GraphemeCount].getName, Name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$Name(s) takes exactly 1 argument")
        GraphemeCount(args.head)
      }))

  /** Codegen'd grapheme-cluster count of a string column. Requires a
    * session built with [[GraftExtensions]]. */
  def graphemeCount(c: Column): Column = call_function(Name, c)
}
