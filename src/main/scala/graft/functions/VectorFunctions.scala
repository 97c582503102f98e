package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector similarity primitives over `array<float>` embedding columns
  * (the `embeddings` testdata table; SURVEY.md §7.5).
  *
  * [[CosineSimilarity]] is a native Catalyst expression with codegen:
  * a tight primitive-float loop over both ArrayData inputs, no
  * boxing, no lambda dispatch — measurably faster than the
  * higher-order-function composition at 100 TB row counts, and it
  * keeps the surrounding operators inside whole-stage codegen. The
  * HOF form [[VectorFunctions.cosineHof]] exists as the
  * plain-built-ins cross-check (specs assert they agree).
  *
  * Math is float-input/double-accumulate, accumulating in index order,
  * so results are bit-identical to any other engine that does the
  * same (the DuckDB oracle SQL is written to match).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity expects two array<float> inputs, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-extension hook registering graft's native expressions via the
  * public `SparkSessionExtensions.injectFunction` API (Column↔Expression
  * conversion is `private[sql]` in Spark 4.1, so a registered-function
  * call is the supported way to reach a custom codegen Expression).
  * Installed by `GraftSession.builder` (`withExtensions`); also usable
  * via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(VectorFunctions.CosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, VectorFunctions.CosineName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"${VectorFunctions.CosineName}(a, b) takes exactly 2 arguments")
        CosineSimilarity(args.head, args(1))
      }))
  }
}

object VectorFunctions {

  val CosineName = "graft_cosine"

  /** Codegen'd cosine similarity between two `array<float>` columns.
    * Requires a session built with [[GraftExtensions]] (see
    * `GraftSession`); resolves through the function registry, which is
    * the public path to a custom Expression in Spark 4. */
  def cosine(a: Column, b: Column): Column =
    call_function(CosineName, a, b)

  /** Same semantics via built-in higher-order functions only (zip_with
    * + aggregate) — the cross-check reference for [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  /** Deterministic random hyperplanes for sign-LSH over `dim`-d float
    * vectors: `numPlanes` unit-free gaussian-ish planes from a seeded
    * generator (stable across sessions — required for reproducible
    * bucketing). */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  /** Sign-LSH bucket id: bit i = (v · plane_i) >= 0. Packs to a long,
    * so up to 63 planes. Computed with HOFs over a literal plane
    * matrix — stays codegen-friendly, no UDF. */
  def lshBucket(v: Column, planes: Array[Array[Float]]): Column = {
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(zip_with(v, typedlit(p.toSeq), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
