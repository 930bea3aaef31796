package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftStrings

/** Property tests for the pure expression kernels (SURVEY §5 plan:
  * ScalaCheck generators; deterministic seeded sampling — no
  * scalatestplus bridge in the offline dependency set). */
class PropertySpec extends AnyFunSuite {

  private val word = Gen.stringOfN(4, Gen.alphaLowerChar)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("trigram similarity: reflexive, symmetric, bounded") {
    samples(Gen.zip(text, text)).foreach { case (a, b) =>
      val s = GraftStrings.trigramSimilarity(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range for ($a, $b)")
      assert(s == GraftStrings.trigramSimilarity(b, a))
      assert(GraftStrings.trigramSimilarity(a, a) == 1.0)
    }
  }

  test("trigram similarity is case-insensitive") {
    samples(text).foreach { a =>
      assert(GraftStrings.trigramSimilarity(a.toUpperCase, a) == 1.0)
    }
  }

  test("simhash: deterministic, bounded hamming distance") {
    samples(Gen.zip(text, text)).foreach { case (a, b) =>
      val ha = GraftStrings.simhash64(a)
      assert(ha == GraftStrings.simhash64(a))
      val d = java.lang.Long.bitCount(ha ^ GraftStrings.simhash64(b))
      assert(d >= 0 && d <= 64)
    }
  }

  test("simhash of a token multiset permutation is identical") {
    val rnd = new scala.util.Random(7)
    samples(Gen.listOfN(8, word)).foreach { ws =>
      val a = ws.mkString(" ")
      val b = rnd.shuffle(ws).mkString(" ")
      // bit votes are per-token and commutative → permutation invariant
      assert(GraftStrings.simhash64(a) == GraftStrings.simhash64(b))
    }
  }

  test("langId always returns a supported tag") {
    val tags = Set("en", "es", "fr", "de", "zh")
    samples(text).foreach { a =>
      assert(tags.contains(GraftStrings.langId(a).toString))
    }
  }

  test("vec_dot kernel: linearity and zero-vector annihilation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vec = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
    samples(Gen.zip(vec, vec)).foreach { case (a, b) =>
      val aa = new GenericArrayData(a.toArray)
      val bb = new GenericArrayData(b.toArray)
      val zero = new GenericArrayData(Array.fill(16)(0.0))
      assert(graft.functions.GraftVec.dot(aa, zero, false, false) == 0.0)
      val dab = graft.functions.GraftVec.dot(aa, bb, false, false)
      assert(dab == graft.functions.GraftVec.dot(aa, bb, false, false))
    }
  }
}
