package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.ChemFns

/** Pure-function property tests (ScalaCheck): the kernels behind the
  * column functions, no SparkSession needed.
  */
object KernelProps extends Properties("graft.kernels") {

  private val smilesGen: Gen[String] = for {
    n <- Gen.choose(1, 30)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf("C", "N", "O", "S", "P", "c", "n", "o", "(", ")", "=", "#"),
      Gen.choose(1, 9).map(_.toString),
      Gen.oneOf("[NH+]", "[O-]", "%12")))
  } yield cs.mkString

  property("canonicalizeRingNumbers is a fixpoint") = forAll(smilesGen) { s =>
    val once = ChemFns.canonicalizeRingNumbers(s)
    ChemFns.canonicalizeRingNumbers(once) == once
  }

  property("canonicalizeRingNumbers preserves length for digit-only remaps") =
    forAll(smilesGen.suchThat(!_.contains("%"))) { s =>
      // without %nn tokens, remapping stays within single digits when
      // there are <10 distinct ring ids
      val distinctDigits = s.filter(_.isDigit).distinct.length
      distinctDigits >= 10 ||
        ChemFns.canonicalizeRingNumbers(s).length == s.length
    }

  private val vecGen: Gen[Array[Double]] =
    Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1.0, 1.0)).map(_.toArray))

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until n).foreach { i =>
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0.0 else dot / d
  }

  property("cosine is bounded and symmetric") = forAll(vecGen, vecGen) { (a, b) =>
    val n = math.min(a.length, b.length)
    val (x, y) = (a.take(n), b.take(n))
    val c = cosine(x, y)
    math.abs(c) <= 1.0 + 1e-12 && math.abs(c - cosine(y, x)) < 1e-12
  }

  property("cosine(v, v) == 1 for nonzero v") =
    forAll(vecGen.suchThat(_.exists(_ != 0.0))) { v =>
      math.abs(cosine(v, v) - 1.0) < 1e-9
    }
}
