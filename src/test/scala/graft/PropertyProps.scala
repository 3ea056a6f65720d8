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

  property("SortedOverlap == set intersection size, consistent with Jaccard") =
    forAll(nonNegLongs, nonNegLongs) { (xs0, ys0) =>
      val xs = xs0.map(_.abs).distinct.sorted
      val ys = ys0.map(_.abs).distinct.sorted
      val inter = graft.functions.SortedOverlap.overlap(xs.toArray, ys.toArray)
      val expected = xs.toSet.intersect(ys.toSet).size.toLong
      val union = xs.length + ys.length - inter
      val jConsistent =
        if (union == 0) true
        else graft.functions.SortedJaccard.jaccard(xs.toArray, ys.toArray) ==
          inter.toDouble / union
      inter == expected && inter <= math.min(xs.length, ys.length) && jConsistent
    }

  property("identical strings produce identical char-ngram structures") =
    forAll(Gen.asciiPrintableStr) { s =>
      // coeffs-independent smoke at the JVM level: fingerprint equality
      // is what exact dedup keys on.
      Prop(RollingFingerprint.hash(s) == RollingFingerprint.hash(new String(s.toCharArray)))
    }

  // --- vector kernels (graft.functions.VectorOps) ---

  import org.apache.spark.sql.catalyst.util.GenericArrayData
  private val floatVec: Gen[Array[Float]] =
    Gen.choose(1, 96).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-8.0f, 8.0f)).map(_.toArray))
  private def ad(a: Array[Float]) = new GenericArrayData(a)

  property("VectorOps.dot matches a reference double fold, commutes, rejects mismatches") =
    forAll(floatVec, floatVec) { (a0, b0) =>
      val m = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(m), b0.take(m)) // contract: equal lengths
      val ref = (0 until m).foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
      val mismatchThrows = a0.length == b0.length ||
        scala.util.Try(graft.functions.VectorOps.dot(ad(a0), ad(b0))).isFailure
      graft.functions.VectorOps.dot(ad(a), ad(b)) == ref &&
        graft.functions.VectorOps.dot(ad(a), ad(b)) ==
          graft.functions.VectorOps.dot(ad(b), ad(a)) &&
        mismatchThrows
    }

  property("signBuckets: deterministic, right arity, buckets within 2^nBits") =
    forAll(floatVec, Gen.choose(1, 6), Gen.choose(1, 12)) { (v0, nTables, nBits) =>
      val dim = v0.length
      val planes = {
        val flat = new Array[Double](nTables * nBits * dim)
        var t = 0
        while (t < nTables) {
          val r = new scala.util.Random(42L + t)
          var j = 0
          while (j < nBits * dim) { flat(t * nBits * dim + j) = r.nextGaussian(); j += 1 }
          t += 1
        }
        flat
      }
      val b1 = graft.functions.VectorOps.signBuckets(ad(v0), planes, nTables, nBits, dim)
      val b2 = graft.functions.VectorOps.signBuckets(ad(v0), planes, nTables, nBits, dim)
      b1.sameElements(b2) && b1.length == nTables &&
        b1.forall(x => x >= 0 && x < (1 << nBits))
    }

  property("xpolyKeys: per-table distinct keys in the table's range; top-1 leads top-m") =
    forAll(floatVec, Gen.choose(1, 4), Gen.choose(1, 4)) { (v0, nTables, probes0) =>
      val v = v0.take(64) // kernel contract: dim ≤ 64 (long bitmask)
      val dim = v.length
      val probes = math.min(probes0, dim)
      val planes = {
        val flat = new Array[Double](nTables * dim * dim)
        var t = 0
        while (t < nTables) {
          val r = new scala.util.Random(7L + t)
          var j = 0
          while (j < dim * dim) { flat(t * dim * dim + j) = r.nextGaussian(); j += 1 }
          t += 1
        }
        flat
      }
      val multi = graft.functions.VectorOps.xpolyKeys(ad(v), planes, nTables, dim, probes)
      val top1 = graft.functions.VectorOps.xpolyKeys(ad(v), planes, nTables, dim, 1)
      multi.length == nTables * probes &&
        (0 until nTables).forall { t =>
          val keys = multi.slice(t * probes, (t + 1) * probes)
          keys.distinct.length == probes &&
            keys.forall(k => k >= t * 2 * dim && k < (t + 1) * 2 * dim) &&
            keys.head == top1(t) // the corpus key is always probed first
        }
    }

  private val spacedText: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "ab", "ba", "")).map(_.mkString(" "))

  property("RepetitionStats matches a naive groupBy reference") =
    forAll(spacedText) { s =>
      val ws = s.split(" ", -1).toSeq
      val wc = ws.groupBy(identity).view.mapValues(_.size).toMap
      val bg = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val bc = bg.groupBy(identity).view.mapValues(_.size).toMap
      val row = graft.functions.RepetitionStats.stats(s)
      row.getLong(0) == ws.size.toLong &&
        row.getLong(1) == wc.values.max.toLong &&
        row.getLong(2) == wc.values.filter(_ > 1).sum.toLong &&
        row.getLong(3) == (if (bc.isEmpty) 0L else bc.values.max.toLong) &&
        row.getLong(4) == bg.size.toLong
    }

  property("WordGramMd5s matches sliding-window + MessageDigest reference") =
    forAll(spacedText, Gen.choose(1, 6)) { (s, n) =>
      val ws = s.split(" ", -1).toSeq
      val expected = ws.sliding(n).filter(_.size == n).map { w =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(w.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toSeq
      val got = graft.functions.WordGramMd5s.grams(s, n)
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expected
    }

  property("slotAgreement is in [0,1], 1 on self, symmetric on equal lengths") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, Long.MaxValue - 1)),
           Gen.nonEmptyListOf(Gen.choose(0L, Long.MaxValue - 1))) { (xs0, ys0) =>
      val n = math.min(xs0.length, ys0.length)
      val xs = xs0.take(n).toArray
      val ys = ys0.take(n).toArray
      val s = graft.functions.VectorOps.slotAgreement(
        new GenericArrayData(xs), new GenericArrayData(ys))
      val sSym = graft.functions.VectorOps.slotAgreement(
        new GenericArrayData(ys), new GenericArrayData(xs))
      graft.functions.VectorOps.slotAgreement(
        new GenericArrayData(xs), new GenericArrayData(xs)) == 1.0 &&
        s >= 0.0 && s <= 1.0 && s == sSym
    }

  property("slotAgreement throws on length mismatch (miswired-join contract)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, Long.MaxValue - 1))) { xs0 =>
      val xs = xs0.toArray
      val shorter = xs.dropRight(1)
      scala.util.Try(graft.functions.VectorOps.slotAgreement(
        new GenericArrayData(xs), new GenericArrayData(shorter))).failed.toOption
        .exists(_.isInstanceOf[IllegalArgumentException])
    }

  private val finiteFloats: Gen[List[Float]] =
    Gen.nonEmptyListOf(Gen.choose(-1000.0f, 1000.0f))

  property("TopKHeap == sort-take-k reference, under any insert/merge split") =
    forAll(
      Gen.listOf(Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 1000L))),
      Gen.choose(1, 8), Gen.choose(0, 100)) { (pairs, k, splitPct) =>
      // distinct pairs: the heap ranks occurrences, not a set — equal
      // pairs inserted twice would legitimately take two slots
      val xs = pairs.distinct
      val ref = xs
        .sortWith { case ((o1, i1), (o2, i2)) => o1 > o2 || (o1 == o2 && i1 < i2) }
        .take(k)
      val split = xs.length * splitPct / 100
      val (l, r) = xs.splitAt(split)
      val h1 = new graft.functions.TopKHeap(k)
      val h2 = new graft.functions.TopKHeap(k)
      l.foreach { case (o, i) => h1.insert(o, i) }
      r.foreach { case (o, i) => h2.insert(o, i) }
      h1.mergeFrom(h2)
      h1.ranked().toSeq == ref
    }

  property("int8 quantization: |x - code·scale| ≤ scale/2, codes in [-127,127]") =
    forAll(finiteFloats) { v0 =>
      val v = v0.toArray
      val arr = ad(v)
      val scale = graft.functions.VectorOps.vecScale8(arr)
      val codes = graft.functions.VectorOps.vecCodes8(arr, scale)
      codes.length == v.length &&
        codes.forall(c => c >= -127 && c <= 127) &&
        (scale == 0.0 || v.indices.forall { i =>
          math.abs(v(i).toDouble - codes(i) * scale) <= scale / 2 + 1e-12
        })
    }

  // --- DeletionHashes (entity-match blocking signatures) ---

  /** Reference deletion neighborhood as explicit variant STRINGS. */
  private def delVariants(s: String, d: Int): Set[String] = {
    def del1(t: String): Set[String] =
      t.indices.map(i => t.substring(0, i) + t.substring(i + 1)).toSet
    var out = Set(s)
    var frontier = Set(s)
    for (_ <- 1 to d) {
      frontier = frontier.flatMap(del1)
      out ++= frontier
    }
    out
  }

  private def sigSet(s: String): Set[Long] =
    graft.functions.DeletionHashes.hashes(s, 2).toLongArray().toSet

  private def alphaNumOfLen(lo: Int, hi: Int): Gen[String] = for {
    n <- Gen.choose(lo, hi)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  property("deletion hashes = one hash per distinct variant string") =
    forAll(alphaNumOfLen(0, 12)) { s =>
      // count parity with the string-level neighborhood (polynomial
      // collisions inside ONE record's <=79 variants are ~2^-57)
      sigSet(s).size == delVariants(s, 2).size
    }

  property("pigeonhole: strings within lev<=2 share a signature") = {
    val edit = for {
      s <- alphaNumOfLen(2, 12)
      nEdits <- Gen.choose(0, 2)
      ops <- Gen.listOfN(nEdits, Gen.choose(0, 2))
      chars <- Gen.listOfN(nEdits, Gen.alphaNumChar)
      positions <- Gen.listOfN(nEdits, Gen.choose(0, 100))
    } yield {
      var t = s
      for (((op, c), p0) <- ops.zip(chars).zip(positions)) {
        val p = if (t.isEmpty) 0 else p0 % t.length
        op match {
          case 0 => t = t.substring(0, p) + c + t.substring(p)            // insert
          case 1 => if (t.nonEmpty) t = t.substring(0, p) + t.substring(p + 1) // delete
          case 2 => if (t.nonEmpty) t = t.substring(0, p) + c + t.substring(p + 1) // substitute
        }
      }
      (s, t)
    }
    forAll(edit) { case (a, b) =>
      sigSet(a).intersect(sigSet(b)).nonEmpty
    }
  }

  property("pigeonhole survives non-BMP input: code-point edits share a signature") = {
    // ADVICE r12: deletion units are code points, so a surrogate-pair
    // character (here astral emoji/CJK) consumes ONE of the maxDel=2
    // slots, not two. Build strings over mixed BMP + astral code
    // points, apply up to 2 code-point deletions, require a shared
    // signature.
    val astral = Seq(0x1F600, 0x1F680, 0x20000).map(cp => new String(Character.toChars(cp)))
    val unit: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf(astral))
    val gen = for {
      n <- Gen.choose(2, 10)
      us <- Gen.listOfN(n, unit)
      nDel <- Gen.choose(0, 2)
      picks <- Gen.listOfN(nDel, Gen.choose(0, 100))
    } yield {
      var v = us.toVector
      for (p <- picks if v.nonEmpty) v = v.patch(p % v.length, Nil, 1)
      (us.mkString, v.mkString)
    }
    forAll(gen) { case (a, b) => sigSet(a).intersect(sigSet(b)).nonEmpty }
  }

  property("dot8 is symmetric, exact vs BigInt reference, throws on mismatch") =
    forAll(finiteFloats, finiteFloats) { (xs0, ys0) =>
      val n = math.min(xs0.length, ys0.length)
      val a = ad(xs0.take(n).toArray)
      val b = ad(ys0.take(n).toArray)
      val ca = graft.functions.VectorOps.vecCodes8(a, graft.functions.VectorOps.vecScale8(a))
      val cb = graft.functions.VectorOps.vecCodes8(b, graft.functions.VectorOps.vecScale8(b))
      val ref = ca.zip(cb).map { case (x, y) => BigInt(x.toInt) * y.toInt }.sum
      val mismatch = scala.util.Try(
        graft.functions.VectorOps.dot8(ca, cb.padTo(n + 1, 0.toByte))).failed.toOption
        .exists(_.isInstanceOf[IllegalArgumentException])
      graft.functions.VectorOps.dot8(ca, cb) == ref.toLong &&
        graft.functions.VectorOps.dot8(cb, ca) == ref.toLong && mismatch
    }

  // The UniMax closed form (q_unimax_mix's window formulation: sorted
  // capped-prefix test + even split of the leftover with remainder to
  // the smallest uncapped) must equal TRUE iterative water-filling:
  // repeatedly hand every active language an equal share, cap-clamped,
  // until the budget is gone. TextOpsSpec pins the operator against
  // the closed form on planted data; this property closes the other
  // half — closed form ≡ the algorithm the paper describes — on
  // random capacity profiles.
  private def unimaxClosedForm(caps: Map[String, Long], budget: Long): Map[String, Long] = {
    val sorted = caps.toSeq.sortBy { case (l, c) => (c, l) }
    val L = sorted.size
    var pfx = 0L
    val capped = sorted.zipWithIndex.map { case ((l, c), k0) =>
      val isC = c * (L - k0) + pfx <= budget
      pfx += c
      l -> isC
    }.toMap
    val kC = capped.count(_._2)
    val sC = sorted.collect { case (l, c) if capped(l) => c }.sum
    val u = L - kC
    val level = if (u == 0) 0L else (budget - sC) / u
    val rem = if (u == 0) 0L else budget - sC - level * u
    sorted.zipWithIndex.map { case ((l, c), k0) =>
      l -> (if (capped(l)) c else level + (if (k0 + 1 - kC <= rem) 1L else 0L))
    }.toMap
  }

  private def unimaxIterative(caps: Map[String, Long], budget: Long): Map[String, Long] = {
    var alloc = caps.map { case (l, _) => l -> 0L }
    var rem = budget
    var active = caps.filter(_._2 > 0).keySet
    while (rem > 0 && active.nonEmpty) {
      val share = rem / active.size
      if (share == 0) {
        // tail remainder: +1 each to the smallest-capacity active langs
        for (l <- active.toSeq.sortBy(l => (caps(l), l)).take(rem.toInt))
          alloc += l -> (alloc(l) + 1)
        rem = 0
      } else {
        var used = 0L
        for (l <- active) {
          val take = math.min(share, caps(l) - alloc(l))
          alloc += l -> (alloc(l) + take); used += take
        }
        rem -= used
        active = active.filter(l => alloc(l) < caps(l))
        if (used == 0) rem = 0 // everyone capped: budget cannot be spent
      }
    }
    alloc
  }

  private val unimaxGen = for {
    n <- Gen.choose(1, 12)
    caps <- Gen.listOfN(n, Gen.choose(0L, 4000L))
    budget <- Gen.choose(0L, 20000L)
  } yield (caps.zipWithIndex.map { case (c, i) => f"l$i%02d" -> c }.toMap, budget)

  property("unimax closed form equals iterative water-filling") =
    forAll(unimaxGen) { case (caps, budget) =>
      val b = math.min(budget, caps.values.sum) // spendable budget only
      val cf = unimaxClosedForm(caps, b)
      val it = unimaxIterative(caps, b)
      val spent = cf.values.sum == b
      val bounded = cf.forall { case (l, a) => a >= 0 && a <= caps(l) }
      cf == it && spent && bounded
    }

  // --- PQ kernels (graft.functions.PqKernels) -----------------------
  // Random (m, dsub, ks) geometry + random codebook/vector. The
  // reference mirrors the kernels' documented fold orders exactly
  // (acc = 0.0 then left-to-right), so equality is EXACT, not within
  // an epsilon — the same cross-engine determinism the oracle relies
  // on.
  private val pqGen = for {
    m <- Gen.oneOf(2, 4, 8)
    dsub <- Gen.oneOf(2, 4)
    ks <- Gen.choose(1, 6)
    cb <- Gen.listOfN(m * ks * dsub, Gen.choose(-4.0, 4.0))
    v <- Gen.listOfN(m * dsub, Gen.choose(-4.0f, 4.0f))
    q <- Gen.listOfN(m * dsub, Gen.choose(-4.0f, 4.0f))
  } yield (m, dsub, ks, cb.toArray, v.toArray, q.toArray)

  private def arr(v: Array[Float]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(v)

  property("pqCodes are per-subspace L2 argmins with lowest-id ties, in [0, ks)") =
    forAll(pqGen) { case (m, dsub, ks, cb, v, _) =>
      val codes = graft.functions.PqKernels.pqCodes(arr(v), cb, m, dsub)
      codes.length == m && (0 until m).forall { mm =>
        val c = codes(mm) & 0xff
        val dists = (0 until ks).map { t =>
          var acc = 0.0
          for (i <- 0 until dsub) {
            val d = cb((mm * ks + t) * dsub + i) - v(mm * dsub + i).toDouble
            acc += d * d
          }
          acc
        }
        val ref = dists.zipWithIndex.minBy { case (d, t) => (d, t) }._2
        c == ref && c >= 0 && c < ks
      }
    }

  property("adcLookup(pqLut(q), pqCodes(x)) == reconstructed subspace-dot sum, exactly") =
    forAll(pqGen) { case (m, dsub, ks, cb, v, q) =>
      val pk = graft.functions.PqKernels
      val codes = pk.pqCodes(arr(v), cb, m, dsub)
      val lut = pk.pqLut(arr(q), cb, m, dsub)
      val got = pk.adcLookup(lut,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(codes))
      var ref = 0.0
      for (mm <- 0 until m) {
        val t = codes(mm) & 0xff
        var acc = 0.0
        for (i <- 0 until dsub)
          acc += cb((mm * ks + t) * dsub + i) * q(mm * dsub + i).toDouble
        ref += acc
      }
      got == ref
    }

  // ------------------------------------------------------------------
  // r19 byte-walk kernels vs straightforward String references: the
  // production code walks raw UTF-8 (PhoneticCode, QualityStats); the
  // references below implement the DOCUMENTED character-level chains.
  // Divergence = a multi-byte stepping or classing bug.
  // ------------------------------------------------------------------

  /** The PhoneticCode contract as its documented string chain:
    * strip non-[A-Za-z0-9] FIRST, then lowercase (ADVICE r19: strip
    * before lower, or Unicode lowercasing smuggles characters like
    * the Kelvin sign U+212A → 'k' into the ASCII class set that the
    * native byte walk drops whole), map letters to classes / drop
    * vowels+hw, collapse adjacent equal class chars, first 18, parse
    * as Long ('' → 0).
    */
  private def phoneticRef(s: String): Long = {
    val classOf = "abcdefghijklmnopqrstuvwxyz".map {
      case c if "bfpv".contains(c) => '1'
      case c if "cgjkqsxz".contains(c) => '2'
      case c if "dt".contains(c) => '3'
      case 'l' => '4'
      case c if "mn".contains(c) => '5'
      case 'r' => '6'
      case _ => ' ' // vowel/h/w: dropped
    }
    val mapped = s.filter(c => (c >= 'A' && c <= 'Z') ||
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
      .toLowerCase.flatMap {
      case c if c >= 'a' && c <= 'z' =>
        val d = classOf(c - 'a'); if (d == ' ') "" else d.toString
      case c if c >= '0' && c <= '9' => c.toString
      case _ => ""
    }
    val collapsed = mapped.foldLeft(new StringBuilder) { (sb, c) =>
      if (sb.nonEmpty && sb.last == c) sb else sb.append(c)
    }.toString.take(18)
    if (collapsed.isEmpty) 0L else collapsed.toLong
  }

  // mix ASCII words, digits, punctuation and non-ASCII into one
  // string — incl. the Unicode-lowercase traps (ADVICE r19): Kelvin
  // sign U+212A lowercases to ASCII 'k', dotted capital I U+0130 to
  // 'i'+combining dot — a lower-then-strip chain classes them, the
  // byte walk must drop them
  private val messyText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf(" ", "\t", "#", "!", "(", ")", "$", "@", "ä", "é", "中", "𝔘",
      "K", "İ"),
    Gen.choose(0, 999999999).map(_.toString))).map(_.mkString)

  property("PhoneticCode byte walk == documented string chain") =
    forAll(messyText) { s =>
      graft.functions.PhoneticCode.code(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) == phoneticRef(s)
    }

  property("PhoneticCode: Catherine/Kathryn-class respellings share a code") =
    Prop(phoneticRef("catherine jones") == 2365252L &&
      phoneticRef("kathryn jones") == 2365252L &&
      graft.functions.PhoneticCode.code(
        org.apache.spark.unsafe.types.UTF8String.fromString("Kathryn Jones")) == 2365252L)

  /** QualityStats' documented character-level contract (code points;
    * single-space word split keeping empties; astral/punct classes).
    */
  private def qualityRef(s: String): (Long, Long, Long, Long, Long) = {
    val cps = s.codePoints().toArray
    val nChars = cps.length.toLong
    val nSpace = cps.count(_ == ' ').toLong
    val words = {
      // split on ' ' keeping empty tokens (DuckDB string_split semantics)
      val sb = scala.collection.mutable.ArrayBuffer(new StringBuilder)
      cps.foreach { cp =>
        if (cp == ' ') sb += new StringBuilder else sb.last.appendAll(Character.toChars(cp))
      }
      sb.map(_.toString).toSeq
    }
    val stop = graft.functions.QualityStats.StopWords.toSet
    val nStop = words.count(stop).toLong
    val nPunct = cps.count(cp => cp > 0xFFFF ||
      !(cp == ' ' || (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9'))).toLong
    (nChars, words.length.toLong, nChars - nSpace, nStop, nPunct)
  }

  property("QualityStats byte walk == documented code-point contract") =
    forAll(messyText) { s0 =>
      val s = s0 + " the a of " // guarantee some stopword mass
      val row = graft.functions.QualityStats.stats(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val (c, w, ns, st, p) = qualityRef(s)
      row.getLong(0) == c && row.getLong(1) == w && row.getLong(2) == ns &&
        row.getLong(3) == st && row.getLong(4) == p
    }
}
