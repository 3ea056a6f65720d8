package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{CharNgramMinHash, LongInsertionSet, RollingFingerprint}

/** Property-based checks for the hash/LSH primitives (pure JVM — the
  * Spark-level behavior of the same code is covered by the suites).
  */
object PropertyProps extends Properties("graft-primitives") {

  property("fingerprint matches BigInt reference fold") = forAll { (s: String) =>
    val ref = s.codePoints().toArray.foldLeft(BigInt(0)) { (acc, cp) =>
      (acc * RollingFingerprint.P + cp) % RollingFingerprint.M
    }
    RollingFingerprint.hash(s) == ref.toLong
  }

  property("fingerprint stays in [0, M)") = forAll { (s: String) =>
    val h = RollingFingerprint.hash(s)
    h >= 0L && h < RollingFingerprint.M
  }

  property("fingerprint of <=64-char text equals its prefix fingerprint") =
    forAll(Gen.alphaNumStr.suchThat(_.length <= 64)) { s =>
      RollingFingerprint.hash(s) == RollingFingerprint.hash(s.take(64))
    }

  property("minhash coefficients are deterministic and in range") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(1, 128)) { (seed, k) =>
      val (a1, b1) = CharNgramMinHash.coeffs(seed, k)
      val (a2, b2) = CharNgramMinHash.coeffs(seed, k)
      val P = 2147483647L
      a1.sameElements(a2) && b1.sameElements(b2) &&
        a1.forall(x => x >= 1 && x < P) && b1.forall(x => x >= 0 && x < P)
    }

  private val nonNegLongs = Gen.listOf(Gen.choose(0L, Long.MaxValue - 1))

  property("LongInsertionSet == LinkedHashSet (insertion order, distinct)") =
    forAll(nonNegLongs) { xs0 =>
      val xs = xs0.map(_.abs) // domain: non-negative (shrinker ignores Gen bounds)
      val set = new LongInsertionSet(4) // force growth paths
      xs.foreach(set.add)
      val ref = new java.util.LinkedHashSet[java.lang.Long]()
      xs.foreach(x => ref.add(x))
      import scala.jdk.CollectionConverters._
      set.toArray.toSeq == ref.iterator.asScala.map(_.longValue()).toSeq
    }

  property("SortedJaccard == set-arithmetic Jaccard") =
    forAll(nonNegLongs, nonNegLongs) { (xs0, ys0) =>
      val xs = xs0.map(_.abs).distinct.sorted
      val ys = ys0.map(_.abs).distinct.sorted
      val inter = xs.toSet.intersect(ys.toSet).size
      val union = xs.toSet.union(ys.toSet).size
      val expected = if (union == 0) 1.0 else inter.toDouble / union
      graft.functions.SortedJaccard.jaccard(xs.toArray, ys.toArray) == expected
    }

  property("identical strings produce identical char-ngram structures") =
    forAll(Gen.asciiPrintableStr) { s =>
      // coeffs-independent smoke at the JVM level: fingerprint equality
      // is what exact dedup keys on.
      Prop(RollingFingerprint.hash(s) == RollingFingerprint.hash(new String(s.toCharArray)))
    }
}
