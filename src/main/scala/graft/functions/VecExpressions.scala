package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Codegen'd vector kernels (SURVEY §4.2 "custom extension points").
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * INTERPRETED — each element evaluation walks a lambda expression tree, so
  * a 64-dim dot product costs ~100× a fused loop, and whole-stage codegen
  * breaks around it. These expressions generate a tight primitive `double`
  * loop instead (measured ~10× on the sim_* pair scans; the same shape
  * cuML's C++ brute-force kernels have [R SURVEY §3.1]).
  *
  * Numeric contract (matches the interpreted form they replace and the
  * DuckDB oracle's `CAST(... AS DOUBLE[])` path): each float element is
  * widened to double BEFORE any arithmetic; accumulation is sequential
  * left-to-right in double. Array elements are assumed non-null (fixture
  * embeddings are dense); a null array yields null via BinaryExpression's
  * null-safe plumbing. Length MISMATCH also yields null (ADVICE r11):
  * `zip_with` null-pads the shorter array, so the HOF form these kernels
  * replace returns null the moment a padded element enters the fold —
  * looping to xs.length and indexing ys[i] instead would throw (or read
  * past the logical end). Mirroring the null keeps the FuseVecKernels
  * rewrite bit-neutral on EVERY input, not just equal-length ones.
  */
abstract class VecBinary extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  // nullable even over non-null inputs: length mismatch yields null
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two float[] or two double[] arrays, " +
            s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  protected def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Java source for the loop body given xs/ys primitive arrays in scope.
    * `i` is a freshName'd loop-variable identifier: a literal `i` collides
    * (janino "Redefinition of local variable") when the same projection
    * also contains Spark's higher-order-function codegen, which declares
    * its own `i` in the enclosing scope. */
  protected def loopBody(xs: String, ys: String, acc: String, i: String): String

  /** Final transform applied to the accumulator (identity by default). */
  protected def finishJava(acc: String): String = acc

  /** Scala closure mirror of loopBody for interpreted eval. */
  protected def evalLoop(xs: Array[Double], ys: Array[Double]): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) =
      if (isFloat)
        (a.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble),
         b.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble))
      else
        (a.asInstanceOf[ArrayData].toDoubleArray(),
         b.asInstanceOf[ArrayData].toDoubleArray())
    if (xs.length != ys.length) null else evalLoop(xs, ys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val jt = if (isFloat) "float" else "double"
    val arr = if (isFloat) "toFloatArray()" else "toDoubleArray()"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |$jt[] $xs = $a.$arr;
         |$jt[] $ys = $b.$arr;
         |if ($xs.length != $ys.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  ${loopBody(xs, ys, acc, i)}
         |  ${ev.value} = ${finishJava(acc)};
         |}
       """.stripMargin
    })
  }
}

/** Σ xᵢ·yᵢ (widened to double per element). */
case class VecDot(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "vec_dot"
  protected def loopBody(xs: String, ys: String, acc: String, i: String): String =
    s"""for (int $i = 0; $i < $xs.length; $i++) {
       |  $acc += (double) $xs[$i] * (double) $ys[$i];
       |}""".stripMargin
  protected def evalLoop(xs: Array[Double], ys: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < xs.length) { acc += xs(i) * ys(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** √Σ (xᵢ−yᵢ)² — Euclidean (L2) distance. */
case class VecL2Dist(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "vec_l2_dist"
  protected def loopBody(xs: String, ys: String, acc: String, i: String): String =
    s"""for (int $i = 0; $i < $xs.length; $i++) {
       |  double d$i = (double) $xs[$i] - (double) $ys[$i];
       |  $acc += d$i * d$i;
       |}""".stripMargin
  override protected def finishJava(acc: String): String = s"Math.sqrt($acc)"
  protected def evalLoop(xs: Array[Double], ys: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < xs.length) { val d = xs(i) - ys(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ |xᵢ−yᵢ| — Manhattan (L1) distance (the NearestNeighbors metric
  * variant the reference exposes next to euclidean/cosine). */
case class VecL1Dist(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "vec_l1_dist"
  protected def loopBody(xs: String, ys: String, acc: String, i: String): String =
    s"""for (int $i = 0; $i < $xs.length; $i++) {
       |  $acc += Math.abs((double) $xs[$i] - (double) $ys[$i]);
       |}""".stripMargin
  protected def evalLoop(xs: Array[Double], ys: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < xs.length) { acc += math.abs(xs(i) - ys(i)); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** max |xᵢ−yᵢ| — Chebyshev (L∞) distance, completing the pairwise-metric
  * family (euclidean / cosine / manhattan / chebyshev). */
case class VecLInfDist(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "vec_linf_dist"
  protected def loopBody(xs: String, ys: String, acc: String, i: String): String =
    s"""for (int $i = 0; $i < $xs.length; $i++) {
       |  double d$i = Math.abs((double) $xs[$i] - (double) $ys[$i]);
       |  if (d$i > $acc) $acc = d$i;
       |}""".stripMargin
  protected def evalLoop(xs: Array[Double], ys: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < xs.length) {
      val d = math.abs(xs(i) - ys(i)); if (d > acc) acc = d; i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ xᵢ² — unary squared norm (ADVICE r11: the old FuseVecKernels
  * squared-norm case rewrote aggregate(a, ...) to VecDot(a, a), duplicating
  * the child expression — a non-deterministic child was evaluated twice and
  * diverged, and even a deterministic densify `transform(a, x->coalesce(x,0d))`
  * paid double. The unary kernel evaluates the child ONCE; the fold order
  * (acc += x[i]·x[i], left-to-right in double) is identical to both the HOF
  * form and VecDot(a, a), so the rewrite stays bit-neutral). */
case class VecNormSq(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def prettyName: String = "vec_normsq"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a float[] or double[] array, got ${other.catalogString}")
    }
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(a: Any): Any = {
    val xs =
      if (isFloat) a.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble)
      else a.asInstanceOf[ArrayData].toDoubleArray()
    var acc = 0.0; var i = 0
    while (i < xs.length) { acc += xs(i) * xs(i); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val jt = if (isFloat) "float" else "double"
    val arr = if (isFloat) "toFloatArray()" else "toDoubleArray()"
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |$jt[] $xs = $a.$arr;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) {
         |  $acc += (double) $xs[$i] * (double) $xs[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration + Column helpers. The expressions are registered as SQL
  * functions in the session's FunctionRegistry (idempotent), then reached
  * through `expr("vec_dot(a, b)")` — no private Spark APIs involved, and
  * the driver's vanilla session works because every query fn calls
  * `Vec.register(s)` through the helpers below.
  */
object Vec {
  def register(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    // idempotent: re-registering an existing name logs a WARN per call
    // ("replaced a previously registered function"), which at one call per
    // Column construction spammed every bench/test log (VERDICT r3 #6)
    if (!reg.functionExists(FunctionIdentifier("graft_vec_dot"))) {
      reg.createOrReplaceTempFunction(
        "graft_vec_dot", args => VecDot(args.head, args(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_vec_l2", args => VecL2Dist(args.head, args(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_vec_l1", args => VecL1Dist(args.head, args(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_vec_linf", args => VecLInfDist(args.head, args(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_vec_normsq", args => VecNormSq(args.head), "built-in")
      reg.createOrReplaceTempFunction(
        "graft_trigrams", args => TrigramGenerator(args.head), "built-in")
    }
  }

  def normSq(s: SparkSession, a: String): Column = {
    register(s); expr(s"graft_vec_normsq($a)")
  }

  def dot(s: SparkSession, a: String, b: String): Column = {
    register(s); expr(s"graft_vec_dot($a, $b)")
  }
  def l2(s: SparkSession, a: String, b: String): Column = {
    register(s); expr(s"graft_vec_l2($a, $b)")
  }
  /** Column-form l2 — for callers whose operand is not a named column
    * (e.g. a literal centroid array in the map-only kmeans assignment). */
  def l2Cols(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    org.apache.spark.sql.functions.call_function("graft_vec_l2", a, b)
  }
  def l1(s: SparkSession, a: String, b: String): Column = {
    register(s); expr(s"graft_vec_l1($a, $b)")
  }
  def linf(s: SparkSession, a: String, b: String): Column = {
    register(s); expr(s"graft_vec_linf($a, $b)")
  }
}
