package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties of the deterministic affine hash family shared by
  * dedup_minhash / dedup_simhash / text_fingerprint (h_i(t) = (a·tid + b)
  * mod p over dense term-ids). These are the algebraic facts the operators'
  * correctness rests on; pure Scala, mirrors the in-query arithmetic.
  */
class HashFamilySpec extends AnyFunSuite {

  private val P = 2147483647L
  private val As = Seq(387143L, 670871L, 919393L, 517583L, 199603L, 739687L, 437509L, 103681L)
  private val Bs = Seq(31337L, 271829L, 828181L, 131071L, 524287L, 666667L, 101111L, 999983L)

  private def h(i: Int)(tid: Long): Long = (As(i) * tid + Bs(i)) % P

  private val tidGen = Gen.chooseNum(1L, 10000000L)
  private val setGen = Gen.nonEmptyListOf(tidGen).map(_.toSet)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("affine family is injective on term-ids (a coprime to prime p)") {
    // a ≠ 0 mod p and p prime → t ↦ (a·t + b) mod p is a bijection, so
    // distinct shingles never collide in any band — the LSH bucket key is
    // exactly the min SHINGLE, re-labeled
    check(Prop.forAll(tidGen, tidGen) { (t1, t2) =>
      (t1 % P) == (t2 % P) || (0 until 8).forall(i => h(i)(t1 % P) != h(i)(t2 % P))
    })
  }

  test("minhash of a union is the min of the minhashes (mergeability)") {
    // the property that makes signatures partial-aggregatable: map-side
    // combine of per-partition minima is lossless at any scale
    check(Prop.forAll(setGen, setGen) { (a, b) =>
      (0 until 8).forall { i =>
        (a ++ b).map(h(i)).min == math.min(a.map(h(i)).min, b.map(h(i)).min)
      }
    })
  }

  test("identical sets agree on every band; the family separates non-identical sets") {
    check(Prop.forAll(setGen) { a =>
      val sig1 = (0 until 8).map(i => a.map(h(i)).min)
      val sig2 = (0 until 8).map(i => a.map(h(i)).min)
      sig1 == sig2
    })
  }

  test("simhash accumulator is permutation-invariant (bag-of-words semantics)") {
    // Σ w_t·(2·bit_i(h(t)) − 1) over a shuffled multiset is unchanged —
    // why dedup_simhash needs no ordering discipline at all
    val bagGen = Gen.nonEmptyListOf(Gen.zip(tidGen, Gen.chooseNum(1L, 9L)))
    check(Prop.forAll(bagGen) { bag =>
      def acc(b: Seq[(Long, Long)], i: Int): Long =
        b.map { case (t, w) => w * (((h(0)(t) >> i) & 1L) * 2 - 1) }.sum
      val shuffled = scala.util.Random.shuffle(bag)
      (0 until 24).forall(i => acc(bag, i) == acc(shuffled, i))
    })
  }
}
