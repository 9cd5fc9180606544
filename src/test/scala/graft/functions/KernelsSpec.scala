package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

class KernelsSpec extends AnyFunSuite {

  /** Minimal property runner (scalatestplus bridge not in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // --- Jaro-Winkler against the standard published vectors -------------
  test("jaro-winkler known vectors") {
    def jw(a: String, b: String) = StringSimKernels.jaroWinkler(a, b)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611) < 1e-3)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133) < 1e-3)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-2)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("jaro symmetric + bounded (property)") {
    val gs = Gen.alphaStr.map(_.take(20))
    check(Prop.forAll(gs, gs) { (a: String, b: String) =>
      val s = StringSimKernels.jaroWinkler(a, b)
      s >= 0.0 && s <= 1.0 && math.abs(s - StringSimKernels.jaroWinkler(b, a)) < 1e-12
    })
  }

  test("jaroWinklerU ASCII byte path == String path (property, incl. non-ASCII fallback)") {
    // the codegen entry point takes UTF8String and fast-paths pure-ASCII
    // inputs over raw bytes; it must be bit-identical to the String kernel
    // for ANY input — non-ASCII pairs exercise the fallback branch
    val ascii = Gen.alphaNumStr.map(_.take(24))
    val mixed = Gen.oneOf(ascii, ascii.map(s => "é" + s + "ß"), ascii.map("žluť" + _))
    check(Prop.forAll(mixed, mixed) { (a: String, b: String) =>
      val u = StringSimKernels.jaroWinklerU(
        UTF8String.fromString(a), UTF8String.fromString(b))
      u == StringSimKernels.jaroWinkler(a, b)
    })
  }

  test("normalize: diacritics, case, punctuation") {
    assert(StringSimKernels.normalize("José  O'Neill-Smith") == "jose o neill smith")
    assert(StringSimKernels.normalize("  ÁBC  123 ") == "abc 123")
    assert(StringSimKernels.normalize("") == "")
  }

  // --- MinHash: signature overlap estimates Jaccard (property) ---------
  test("minhash overlap ≈ jaccard") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val base = Array.fill(200)(rnd.nextLong())
      val shared = rnd.nextInt(180) + 10
      val a = base.take(shared) ++ Array.fill(200 - shared)(rnd.nextLong())
      val b = base.take(shared) ++ Array.fill(200 - shared)(rnd.nextLong())
      val trueJ = {
        val sa = a.toSet; val sb = b.toSet
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      val sigA = HashKernels.minHashSig(new GenericArrayData(a), 128, 42L)
      val sigB = HashKernels.minHashSig(new GenericArrayData(b), 128, 42L)
      val est = HashKernels.sigOverlap(sigA, sigB)
      assert(math.abs(est - trueJ) < 0.18, s"est=$est true=$trueJ")
    }
  }

  test("minhash determinism + band keys line up for identical sets") {
    val xs = new GenericArrayData(Array(1L, 5L, 9L, 42L))
    val s1 = HashKernels.minHashSig(xs, 32, 42L)
    val s2 = HashKernels.minHashSig(xs, 32, 42L)
    assert(s1.toLongArray().sameElements(s2.toLongArray()))
    val b1 = HashKernels.bandKeys(s1, 8, 4).toLongArray()
    val b2 = HashKernels.bandKeys(s2, 8, 4).toLongArray()
    assert(b1.sameElements(b2))
    assert(b1.distinct.length == 8) // band index folded in -> distinct keys
  }

  test("tokenNgramSeq: positional, duplicates kept, gram identity matches set variant") {
    def arr(ts: String*) = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
    def seq(ts: Seq[String], n: Int) =
      HashKernels.tokenNgramSeq(arr(ts: _*), n, 42L).toLongArray.toSeq
    // a doc shorter than n has NO windows (no whole-doc fallback)
    assert(seq(Seq("a", "b"), 3).isEmpty)
    // one hash per starting position, in order; repeated grams repeat
    val s = seq(Seq("x", "y", "x", "y", "x"), 2)
    assert(s.length == 4 && s(0) == s(2) && s(1) == s(3) && s(0) != s(1))
    // same per-gram chain as the sorted-distinct variant
    val set = HashKernels.tokenNgrams(arr("p", "q", "r", "s"), 2, 42L).toLongArray.toSet
    assert(seq(Seq("p", "q", "r", "s"), 2).toSet == set)
  }

  test("jaccardSorted exact on sorted arrays") {
    val a = new GenericArrayData(Array(1L, 2L, 3L, 4L))
    val b = new GenericArrayData(Array(3L, 4L, 5L, 6L))
    assert(HashKernels.jaccardSorted(a, b) == 2.0 / 6.0)
    assert(HashKernels.jaccardSorted(a, a) == 1.0)
  }

  test("simhash: similar multisets → small hamming distance") {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(300)(rnd.nextLong())
    val a = base
    val b = base.take(285) ++ Array.fill(15)(rnd.nextLong())
    val c = Array.fill(300)(rnd.nextLong())
    val ha = HashKernels.simHash(new GenericArrayData(a), 42L)
    val hb = HashKernels.simHash(new GenericArrayData(b), 42L)
    val hc = HashKernels.simHash(new GenericArrayData(c), 42L)
    assert(HashKernels.hammingDistance64(ha, hb) < HashKernels.hammingDistance64(ha, hc))
    assert(HashKernels.hammingDistance64(ha, hb) <= 12)
  }

  test("cosine kernels") {
    def arr(xs: Float*) = new GenericArrayData(xs.toArray)
    assert(math.abs(VectorKernels.cosine(arr(1f, 0f), arr(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(VectorKernels.cosine(arr(1f, 0f), arr(0f, 1f))) < 1e-12)
    assert(VectorKernels.cosine(arr(0f, 0f), arr(1f, 1f)) == 0.0)
    assert(math.abs(VectorKernels.dot(arr(1f, 2f, 3f), arr(4f, 5f, 6f)) - 32.0) < 1e-9)
  }

  test("levenshtein sim") {
    def lev(a: String, b: String) =
      StringSimKernels.levenshteinSim(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(lev("kitten", "sitting") == 1.0 - 3.0 / 7.0)
    assert(lev("", "") == 1.0)
    assert(lev("a", "") == 0.0)
  }
}
