package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

/** Banded sign-LSH buckets as a native codegen expression: one pass
  * over the input vector computes every band's hyperplane dot
  * products; band b's bucket is `(b << r) | signBits(planes[b*r …
  * b*r+r))` — unique across bands, so the bucket long alone is the
  * band-join key.
  *
  * This replaces the higher-order-function bucket computation: HOFs
  * are CodegenFallback (interpreted, per-plane array passes), while
  * this expression is a tight generated loop over primitive floats —
  * the difference between an interpreted 64-pass scorer and a single
  * fused pass on the corpus-scan side of an ANN join.
  *
  * `planesFlat` is the row-major (numBands*r) × dim hyperplane matrix,
  * baked in as a constant reference (it comes from a seeded generator,
  * a few KB — broadcast-as-literal is the right shape).
  */
case class SignLshBuckets(child: Expression, planesFlat: Array[Float],
                          numBands: Int, r: Int)
    extends UnaryExpression {

  private val numPlanes = numBands * r
  private val dim = if (numPlanes == 0) 0 else planesFlat.length / numPlanes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${VectorFunctions.LshName} expects array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var bits = 0L
      var j = 0
      while (j < r) {
        val planeOff = (b * r + j) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getFloat(i).toDouble * planesFlat(planeOff + i); i += 1 }
        if (dot >= 0.0) bits |= (1L << j)
        j += 1
      }
      out(b) = (b.toLong << r) | bits
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesFlat, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $bits = 0L;
         |  for (int $j = 0; $j < $r; $j++) {
         |    int $off = ($b * $r + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $v.getFloat($i) * (double) $planesRef[$off + $i];
         |    }
         |    if ($dot >= 0.0) $bits |= (1L << $j);
         |  }
         |  $out[$b] = (((long) $b) << $r) | $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
    ext.injectFunction((
      new FunctionIdentifier(VectorFunctions.LshName),
      new ExpressionInfo(classOf[SignLshBuckets].getName, VectorFunctions.LshName),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          s"${VectorFunctions.LshName}(vec, planesFlat, numBands, r) takes exactly 4 arguments")
        // The plane matrix and band geometry must be foldable — they
        // parameterize the generated code, they are not per-row data.
        val planes = args(1) match {
          case Literal(arr: ArrayData, ArrayType(FloatType, _)) => arr.toFloatArray()
          case other => throw new IllegalArgumentException(
            s"planesFlat must be an array<float> literal, got $other")
        }
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
        }
        SignLshBuckets(args.head, planes,
          intLit(args(2), "numBands"), intLit(args(3), "r"))
      }))
    TextNormalize.inject(ext)
    GraphemeCountFns.inject(ext)
    // Pre-CBO planner rules, in order: metadata-only aggregates, then
    // the two materialized-view rewrites (the JOIN rewrite must run
    // BEFORE join pruning so a rewritable join never pays the
    // planning-time dim probe), then automatic join-driven file
    // pruning for whatever remains. Each runs once per optimization
    // and backs off to the unchanged plan on any doubt.
    // Each pre-CBO rule runs ONCE, in order — chosen so rewrites
    // COMPOSE in one pass: the JOIN rewrite first
    // (`read(fact)⋈read(dim) → groupBy` lands on the join view), the
    // AGGREGATE rewrite then walks through the projected join-view
    // scan onto an aggregate view registered OVER the join view (a
    // two-level MV stack), the metadata-only rule last can collapse
    // even a rewritten global aggregate to committed footer stats,
    // and join pruning picks up whatever declined to rewrite.
    // the LATEST-STATE rewrite first: its output is a plain view
    // scan, so a grouped aggregate or join above a rewritten
    // latest-per-key can still hit the later rules' registries
    ext.injectPreCBORule(session => graft.plans.LatestRewriteRule(session))
    ext.injectPreCBORule(session => graft.plans.MvJoinRewriteRule(session))
    ext.injectPreCBORule(session => graft.plans.MvRewriteRule(session))
    ext.injectPreCBORule(session => graft.plans.StatsAggRule(session))
    ext.injectPreCBORule(session => graft.plans.JoinPruneRule(session))
  }
}

object VectorFunctions {

  val CosineName = "graft_cosine"
  val LshName = "graft_lsh_buckets"

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
    * matrix — no UDF, but HOFs are interpreted (CodegenFallback):
    * this is the cross-check reference for [[lshBandBuckets]]. */
  def lshBucket(v: Column, planes: Array[Array[Float]]): Column = {
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(zip_with(v, typedlit(p.toSeq), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Codegen'd banded sign-LSH buckets (see [[SignLshBuckets]]): one
    * fused pass over the vector → array of `numBands` band-unique
    * bucket longs. `planes` is the seeded (numBands*r) × dim matrix. */
  def lshBandBuckets(v: Column, planes: Array[Array[Float]], numBands: Int, r: Int): Column = {
    require(planes.length == numBands * r,
      s"need ${numBands * r} planes, got ${planes.length}")
    call_function(LshName, v, typedlit(planes.flatten.toSeq),
      lit(numBands), lit(r))
  }
}
