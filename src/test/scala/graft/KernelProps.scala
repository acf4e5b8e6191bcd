package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import functions.GraftKernels

/** ScalaCheck properties for the pure (no-Spark) native kernels —
  * SURVEY.md §5's property-test layer. These run on raw generated
  * strings/arrays, covering input space the fixtures never will.
  */
object KernelProps extends Properties("GraftKernels") {

  private val text: Gen[String] = for {
    words <- Gen.listOfN(30, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(""), Gen.const("the")))
    seps <- Gen.listOfN(30, Gen.oneOf(" ", "  ", "\t", "\n", " \r "))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  private def sim(s: String): Long =
    GraftKernels.simhash64(UTF8String.fromString(s))

  property("simhash is deterministic") = Prop.forAll(text) { s =>
    sim(s) == sim(s)
  }

  property("simhash ignores leading/trailing whitespace differences only via tokens") =
    Prop.forAll(text) { s =>
      // Appending a pure-whitespace run adds exactly one empty-token
      // vote — same as the Java-regex split would produce.
      val tokensA = s.split("\\s+", -1).toSeq
      val tokensB = (s + "   ").split("\\s+", -1).toSeq
      (tokensA == tokensB) == (sim(s) == sim(s + "   ")) ||
        tokensA != tokensB // only assert equality when token lists agree
    }

  property("simhash matches a direct split-based reference") = Prop.forAll(text) { s =>
    // Independent reference implementation: Java split + per-token
    // xxhash64(seed 42) + bit votes.
    val toks = s.toLowerCase.split("\\s+", -1)
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val u = UTF8String.fromString(t)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var expect = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) expect |= (1L << b); b += 1 }
    sim(s) == expect
  }

  private val vec: Gen[Array[Double]] =
    Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)).map(_.toArray))

  private def cos(a: Array[Double], b: Array[Double]): java.lang.Double =
    GraftKernels.cosineSim(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b))

  property("cosine is symmetric") = Prop.forAll(vec, vec) { (a, b) =>
    if (a.length != b.length) cos(a, b) == null && cos(b, a) == null
    else cos(a, b) == cos(b, a) ||
      (cos(a, b) != null && cos(b, a) != null &&
        (cos(a, b).isNaN && cos(b, a).isNaN))
  }

  property("cosine(v, v) == 1 for nonzero v") = Prop.forAll(vec) { a =>
    val c = cos(a, a)
    val norm = math.sqrt(a.map(x => x * x).sum)
    norm == 0.0 || (c != null && math.abs(c - 1.0) < 1e-9)
  }

  property("cosine bounded in [-1-eps, 1+eps]") = Prop.forAll(vec, vec) { (a, b) =>
    val c = cos(a, b)
    c == null || c.isNaN || (c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
  }
}
