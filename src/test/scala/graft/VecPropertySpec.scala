package graft

import graft.functions.{VecDot, VecL2Dist}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the codegen'd vector kernels (SURVEY §5.2
  * item 3) — interpreted eval path vs an independent Scala fold, plus
  * algebraic invariants. No SparkSession needed: Catalyst expressions
  * evaluate directly on Literals. Plain ScalaCheck Prop (scalatestplus is
  * not in the offline dependency set).
  */
class VecPropertySpec extends AnyFunSuite {

  private val finiteFloat = Gen.chooseNum(-1e6f, 1e6f)
  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 128).flatMap(n => Gen.listOfN(n, finiteFloat).map(_.toArray))

  private def lit(a: Array[Float]) = Literal.create(a, ArrayType(FloatType))

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("vec_dot equals the sequential double fold exactly") {
    check(Prop.forAll(vecGen) { a =>
      VecDot(lit(a), lit(a)).eval(null).asInstanceOf[Double] == refDot(a, a)
    })
  }

  test("vec_l2 is symmetric, non-negative, and zero on identical vectors") {
    check(Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val dab = VecL2Dist(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val dba = VecL2Dist(lit(b), lit(a)).eval(null).asInstanceOf[Double]
      dab == dba && dab >= 0.0 &&
        VecL2Dist(lit(a), lit(a)).eval(null).asInstanceOf[Double] == 0.0
    })
  }

  test("Cauchy–Schwarz: dot(a,b)^2 <= dot(a,a)*dot(b,b) (with fp slack)") {
    check(Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val ab = VecDot(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val aa = VecDot(lit(a), lit(a)).eval(null).asInstanceOf[Double]
      val bb = VecDot(lit(b), lit(b)).eval(null).asInstanceOf[Double]
      ab * ab <= aa * bb * (1 + 1e-9) + 1e-9
    })
  }

  test("null array propagates null") {
    val a = Array(1.0f, 2.0f)
    val nullLit = Literal.create(null, ArrayType(FloatType))
    assert(VecDot(lit(a), nullLit).eval(null) == null)
    assert(VecL2Dist(nullLit, lit(a)).eval(null) == null)
  }
}
