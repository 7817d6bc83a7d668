package graft.plans

import graft.functions.{VecDot, VecL1Dist, VecL2Dist, VecLInfDist, VecNormSq}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer extension (SURVEY §4.2 extension ladder, rung (c):
  * custom Rule registered through SparkSessionExtensions — the step past
  * the rung-(b) codegen Expressions in graft.functions).
  *
  * The rule fuses the DECLARATIVE dot product a Spark user naturally
  * writes —
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *
  * — into the [[graft.functions.VecDot]] codegen kernel. Spark's
  * higher-order functions are interpreted per element (each lambda call
  * walks an expression tree and breaks the enclosing whole-stage-codegen
  * span), so on a 64-dim embedding the HOF form costs ~10× the fused
  * primitive loop (the VecExpressions header's measurement). With the
  * rule injected, the idiomatic spelling gets kernel performance for
  * free — the same contract Catalyst itself honors (declare intent, let
  * the optimizer pick the physical form), extended with a domain kernel.
  *
  * Semantics preserved EXACTLY, not approximately: VecDot accumulates
  * left-to-right in double, the same fold order as ArrayAggregate, so
  * the rewrite is bit-neutral — including on UNEQUAL-length inputs
  * (ADVICE r11): zip_with null-pads the shorter array so the HOF form
  * yields null, and VecDot returns null on length mismatch too (it never
  * loops past the shorter array). Guards keep it total:
  *  - both sides must be ARRAY<DOUBLE> with containsNull = false (a null
  *    ELEMENT makes the HOF yield null mid-fold; the kernel assumes
  *    dense arrays — so those plans are left alone). NOTE: parquet list
  *    elements always surface as nullable in Spark's schema conversion,
  *    so a raw scan never matches; densify with
  *    `transform(a, x -> coalesce(x, 0d))` (which types the element
  *    NOT NULL) to arm the rule — the recipe ExtensionsRuleSpec pins;
  *  - the multiply/add lambdas must be exactly the canonical shape
  *    (variables matched by exprId, modulo inserted double Casts);
  *  - the finish lambda must be the identity.
  *
  * The rule runs in the user-provided optimizer batch (post main
  * optimization), so constant folding has already normalized
  * `CAST(0 AS DOUBLE)` zeros to literals.
  */
object FuseVecKernels extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def denseDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** (x, y) -> x * y over the lambda's own two variables. */
  private def isPairwiseMul(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
    case _ => false
  }

  /** (acc, v) -> acc + v in either operand order. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (isVar(l, acc) && isVar(r, v)) || (isVar(l, v) && isVar(r, acc))
    case _ => false
  }

  /** acc -> acc (ArrayAggregate's default finish). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable), _) =>
      isVar(body, acc)
    case _ => false
  }

  /** (acc, x) -> acc + x * x — the squared-norm fold (the sparkNorm
    * spelling in graft.ops.Preprocess). */
  private def isSumSquareMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _),
        Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
      def isSquare(e: Expression): Boolean = stripCast(e) match {
        case Multiply(a, b, _) => isVar(a, x) && isVar(b, x)
        case _ => false
      }
      (isVar(l, acc) && isSquare(r)) || (isVar(r, acc) && isSquare(l))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, mul), Literal(0.0, DoubleType),
          merge, finish)
          if denseDoubleArray(l) && denseDoubleArray(r) &&
            isPairwiseMul(mul) && isSumMerge(merge) &&
            isIdentityFinish(finish) =>
        VecDot(l, r)
      // Σx² over one array: the UNARY kernel (ADVICE r11 — the old
      // VecDot(arg, arg) duplicated the child, evaluating a
      // non-deterministic arg twice and a deterministic densify recipe
      // twice per row; VecNormSq evaluates it once). Fold order
      // (acc += a[i]·a[i], left-to-right in double) is identical, so
      // the rewrite stays bit-neutral.
      case ArrayAggregate(arg, Literal(0.0, DoubleType), merge, finish)
          if denseDoubleArray(arg) && isSumSquareMerge(merge) &&
            isIdentityFinish(finish) =>
        VecNormSq(arg)
    }
}

/** `spark.sql.extensions` entry point: injects [[FuseVecKernels]] and
  * registers the vec kernel family as session functions (so a session
  * built with the extension needs no imperative Vec.register call —
  * `graft_vec_dot(a, b)` resolves in plain SQL; ADVICE r11 made this
  * claim true instead of fixing the docstring).
  * Usage: `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseVecKernels)
    // the columnar multimodal operator's planner strategy (rung (c) —
    // custom LogicalPlan → columnar SparkPlan); the vanilla driver
    // session attaches the same strategy via GraftBridge.addStrategy
    ext.injectPlannerStrategy(_ => ColumnarResizeStrategy)
    // the usage string rides the (className, db, name, usage, extended)
    // overload so DESCRIBE FUNCTION shows it (ADVICE r12 #3: the two-arg
    // constructor silently dropped the parameter)
    def info(name: String, usage: String) =
      new ExpressionInfo("graft.functions", null, name, usage, "")
    ext.injectFunction((FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", "graft_vec_dot(a, b) - codegen'd dot product over two equal-length float[]/double[] arrays; null on length mismatch"),
      args => VecDot(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("graft_vec_l2"),
      info("graft_vec_l2", "graft_vec_l2(a, b) - codegen'd Euclidean distance over two equal-length float[]/double[] arrays; null on length mismatch"),
      args => VecL2Dist(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("graft_vec_l1"),
      info("graft_vec_l1", "graft_vec_l1(a, b) - codegen'd Manhattan distance over two equal-length float[]/double[] arrays; null on length mismatch"),
      args => VecL1Dist(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("graft_vec_linf"),
      info("graft_vec_linf", "graft_vec_linf(a, b) - codegen'd Chebyshev distance over two equal-length float[]/double[] arrays; null on length mismatch"),
      args => VecLInfDist(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("graft_vec_normsq"),
      info("graft_vec_normsq", "graft_vec_normsq(a) - codegen'd squared L2 norm of one float[]/double[] array"),
      args => VecNormSq(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_trigrams"),
      info("graft_trigrams", "graft_trigrams(s) - table generator: one row per character trigram of s (empty for null or strings shorter than 3)"),
      args => graft.functions.TrigramGenerator(args.head)))
  }
}
