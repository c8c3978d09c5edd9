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

  // ---------------- SQ8 pack/dot kernels (round 13) ----------------

  private val codeVecGen: Gen[Array[Long]] =
    Gen.choose(1, 96).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-127L, 127L)).map(_.toArray))

  private def packed(codes: Array[Long]): Array[Byte] =
    graft.functions.Sq8Kernels.pack(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes))

  property("sq8 pack is a lossless byte image of int8 codes") =
    forAll(codeVecGen) { c =>
      packed(c).map(_.toLong).sameElements(c)
    }

  property("sq8 dot equals a BigInt reference and is symmetric") =
    forAll(codeVecGen, codeVecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val got = graft.functions.Sq8Kernels.dot(packed(a), packed(b))
      val ref = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      got == ref.toLong &&
        got == graft.functions.Sq8Kernels.dot(packed(b), packed(a))
    }

  property("sq8 pack rejects every out-of-int8 code loudly") =
    forAll(codeVecGen, Gen.oneOf(-129L, 128L, 1000L, Long.MinValue)) { (c, bad) =>
      val poisoned = c :+ bad
      Prop.throws(classOf[IllegalArgumentException])(packed(poisoned))
    }

  property("sq8 dot rejects width mismatches loudly") =
    forAll(codeVecGen, codeVecGen) { (a, b) =>
      a.length == b.length ||
        Prop.throws(classOf[IllegalArgumentException])(
          graft.functions.Sq8Kernels.dot(packed(a), packed(b)))
    }

  // ---------------- redaction kernel (round 13) ----------------

  private val smallText: Gen[String] =
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))

  private val dictGen: Gen[Seq[String]] =
    Gen.choose(1, 5).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, 4).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)))
        .map(_.distinct))

  private def kernelRedact(text: String, pats: Seq[String],
                           token: String): (String, Int) = {
    val (r, n) = graft.functions.AcKernel.redact(
      graft.functions.AcKernel.build(pats),
      pats.map(_.getBytes("UTF-8").length).toArray,
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      org.apache.spark.unsafe.types.UTF8String.fromString(token))
    (r.toString, n)
  }

  private def refRedact(text: String, pats: Seq[String],
                        token: String): (String, Int) = {
    val ms = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    pats.foreach { p =>
      var i = text.indexOf(p)
      while (i >= 0) { ms += ((i, p.length)); i = text.indexOf(p, i + 1) }
    }
    val sorted = ms.sortBy { case (s, l) => (s, -l) }
    val sb = new StringBuilder
    var cur = 0; var n = 0
    sorted.foreach { case (s, l) =>
      if (s >= cur) {
        sb.append(text.substring(cur, s)).append(token); cur = s + l; n += 1
      }
    }
    sb.append(text.substring(cur))
    (sb.toString, n)
  }

  property("redact equals the sequential reference on random text x random dicts") =
    forAll(smallText, dictGen) { (t, pats) =>
      kernelRedact(t, pats, "_") == refRedact(t, pats, "_")
    }

  property("redact with an unmatchable dictionary is identity") =
    forAll(smallText) { t =>
      kernelRedact(t, Seq("zzz"), "_") == ((t, 0))
    }

  property("redacted text never contains a dictionary pattern when the token is pattern-free") =
    forAll(smallText, dictGen) { (t, pats) =>
      // token "_" shares no characters with the a/b/c/space alphabet,
      // so redaction must remove every matchable span entirely
      val (r, _) = kernelRedact(t, pats, "_")
      pats.forall(p => !r.contains(p))
    }
}
