package graft

import graft.functions.GraftHash
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level properties of the hash/vector primitives. */
class GraftHashSpec extends AnyFunSuite {

  private def strArr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def floatArr(xs: Seq[Float]) =
    new GenericArrayData(xs.toArray[Any].map(_.asInstanceOf[Any]))

  test("minhash: identical token sets give identical signatures") {
    val a = GraftHash.minhashSig(strArr(Seq("x", "y", "z")), 64)
    val b = GraftHash.minhashSig(strArr(Seq("z", "y", "x")), 64) // order-free
    assert(a.toLongArray().toSeq == b.toLongArray().toSeq)
  }

  test("minhash: signature agreement estimates jaccard") {
    val base = (0 until 100).map(i => s"tok$i")
    val other = (0 until 80).map(i => s"tok$i") ++ (100 until 120).map(i => s"tok$i")
    // true jaccard = 80 / 120
    val k = 256
    val sa = GraftHash.minhashSig(strArr(base), k).toLongArray()
    val sb = GraftHash.minhashSig(strArr(other), k).toLongArray()
    val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
    assert(math.abs(agree - 80.0 / 120.0) < 0.12, s"estimate $agree")
  }

  test("simhash: near-identical token lists have small hamming distance") {
    val base = (0 until 200).map(i => s"w$i")
    val tweaked = base.drop(3) ++ Seq("other1", "other2")
    val h1 = GraftHash.simhash64(strArr(base))
    val h2 = GraftHash.simhash64(strArr(tweaked))
    val hamming = java.lang.Long.bitCount(h1 ^ h2)
    assert(hamming <= 12, s"hamming $hamming")
    val unrelated = GraftHash.simhash64(strArr((0 until 200).map(i => s"q$i")))
    assert(java.lang.Long.bitCount(h1 ^ unrelated) > 12)
  }

  test("simhashMd5: signature matches an independent md5-hex re-derivation") {
    val toks = Seq("alpha", "beta", "gamma", "alpha", "delta42")
    // reference path: hex digest string → first 15 chars → unsigned parse,
    // exactly what the DuckDB oracle does with substr(md5(tok),1,15)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](60)
    toks.foreach { t =>
      md.reset()
      val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseUnsignedLong(hex.substring(0, 15), 16)
      for (bit <- 0 until 60)
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
    }
    val expected = (0 until 60).foldLeft(0L)((acc, bit) =>
      if (counts(bit) > 0) acc | (1L << bit) else acc)
    assert(GraftHash.simhashMd5(strArr(toks)) === expected)
    // 60-bit variant: nothing above bit 59
    assert((GraftHash.simhashMd5(strArr(toks)) >>> 60) === 0L)
  }

  test("simhashMd5: near-identical token lists have small hamming distance") {
    val base = (0 until 200).map(i => s"w$i")
    val tweaked = base.drop(3) ++ Seq("other1", "other2")
    val hamming = java.lang.Long.bitCount(
      GraftHash.simhashMd5(strArr(base)) ^ GraftHash.simhashMd5(strArr(tweaked)))
    assert(hamming <= 12, s"hamming $hamming")
    val unrelated = GraftHash.simhashMd5(strArr((0 until 200).map(i => s"q$i")))
    assert(java.lang.Long.bitCount(GraftHash.simhashMd5(strArr(base)) ^ unrelated) > 12)
  }

  test("fingerprint: shared long substring shares fingerprints") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val a = GraftHash.fingerprint(UTF8String.fromString("AAA " + shared + " BBB"), 7, 10).toLongArray().toSet
    val b = GraftHash.fingerprint(UTF8String.fromString("CCC " + shared + " DDD"), 7, 10).toLongArray().toSet
    assert((a & b).nonEmpty)
    val c = GraftHash.fingerprint(UTF8String.fromString("totally unrelated content here xyz"), 7, 10).toLongArray().toSet
    assert((a & c).isEmpty)
  }

  test("cosine/dot/l2 kernels match scalar math") {
    val a = Seq(1.0f, 2.0f, 3.0f)
    val b = Seq(-1.0f, 0.5f, 2.0f)
    val dot = GraftHash.dot(floatArr(a), floatArr(b))
    assert(math.abs(dot - (1 * -1 + 2 * 0.5 + 3 * 2.0)) < 1e-12)
    val cos = GraftHash.cosine(floatArr(a), floatArr(b))
    val na = math.sqrt(a.map(x => x * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x * x.toDouble).sum)
    assert(math.abs(cos - dot / (na * nb)) < 1e-12)
    val l2 = GraftHash.l2(floatArr(a), floatArr(b))
    assert(math.abs(l2 - math.sqrt(4 + 2.25 + 1)) < 1e-12)
  }

  test("cosine: zero vector yields 0, identical vectors yield 1") {
    val z = Seq(0.0f, 0.0f)
    assert(GraftHash.cosine(floatArr(z), floatArr(z)) == 0.0)
    val v = Seq(0.3f, -0.7f, 0.2f)
    assert(math.abs(GraftHash.cosine(floatArr(v), floatArr(v)) - 1.0) < 1e-12)
  }

  test("hyperplane bucket: scale-invariant (cosine-LSH property)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val xs = Seq.fill(16)(rnd.nextFloat() * 10f - 5f)
      val b1 = GraftHash.hyperplaneBucket(floatArr(xs), 12)
      val b2 = GraftHash.hyperplaneBucket(floatArr(xs.map(_ * 2.5f)), 12)
      assert(b1 == b2)
    }
  }

  test("hyperplane tables use independent plane sets") {
    // per-table seeds: some vector must land in different buckets across
    // tables (a shared-prefix scheme would make table t's collisions a
    // subset of table 0's — zero recall gain for nTables× the cost)
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(40)(Seq.fill(16)(rnd.nextFloat() - 0.5f))
    val differs = vecs.count { xs =>
      GraftHash.hyperplaneBucket(floatArr(xs), 8, 0) !=
        GraftHash.hyperplaneBucket(floatArr(xs), 8, 1)
    }
    assert(differs > 10, s"tables 0 and 1 agree on ${40 - differs}/40 vectors — planes not independent")
    // and each table is itself deterministic
    val v = floatArr(vecs.head)
    assert(GraftHash.hyperplaneBucket(v, 8, 1) == GraftHash.hyperplaneBucket(v, 8, 1))
  }

  test("multi-probe buckets: base first, one-bit flips, distinct, deterministic") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 30) {
      val v = floatArr(Seq.fill(16)(rnd.nextFloat() - 0.5f))
      val base = GraftHash.hyperplaneBucket(v, 10, 3)
      val probes = GraftHash.hyperplaneProbes(v, 10, 3, 4).toLongArray().toSeq
      assert(probes.length == 5)
      assert(probes.head == base, "base bucket must come first")
      probes.tail.foreach { p =>
        assert(java.lang.Long.bitCount(p ^ base) == 1,
          s"perturbed bucket $p differs from base $base in != 1 bit")
      }
      assert(probes.distinct.length == probes.length, "probe buckets must be distinct")
      assert(probes == GraftHash.hyperplaneProbes(v, 10, 3, 4).toLongArray().toSeq)
    }
  }

  test("multi-probe with 0 flips equals the plain bucket") {
    val v = floatArr(Seq(0.3f, -0.7f, 0.2f, 0.9f))
    assert(GraftHash.hyperplaneProbes(v, 8, 0, 0).toLongArray().toSeq ==
      Seq(GraftHash.hyperplaneBucket(v, 8, 0)))
  }

  test("multi-probe flips distinct bits within range") {
    val v = floatArr(Seq.fill(16)(0.25f))
    val base = GraftHash.hyperplaneBucket(v, 12, 0)
    val probes = GraftHash.hyperplaneProbes(v, 12, 0, 6).toLongArray()
    val flippedBits = probes.drop(1).map(p => java.lang.Long.numberOfTrailingZeros(p ^ base))
    assert(flippedBits.toSeq.distinct.length == 6)
    assert(flippedBits.forall(b => b >= 0 && b < 12))
  }

  test("lsh bands: equal signatures collide in every band") {
    val sig = GraftHash.minhashSig(strArr(Seq("a", "b", "c")), 128)
    val b1 = GraftHash.lshBands(sig, 4).toLongArray().toSeq
    val b2 = GraftHash.lshBands(sig, 4).toLongArray().toSeq
    assert(b1 == b2 && b1.length == 32)
  }

  test("vector kernels: double-width inputs compute the same values as their float casts") {
    // the width flag dispatches the accessor; a double vector read via
    // getFloat on a columnar batch is an NPE, not a wrong number — the
    // kernel-level half of the array<double> regression (the columnar
    // round-trip half lives in DedupSpec)
    def doubleArr(xs: Seq[Double]) =
      new GenericArrayData(xs.toArray[Any].map(_.asInstanceOf[Any]))
    val fs = Seq(0.25f, -1.5f, 3.75f, 0.0f, 2.125f)
    val ds = fs.map(_.toDouble)
    val fa = floatArr(fs); val da = doubleArr(ds)
    assert(GraftHash.cosine(da, da, true, true) ===
      GraftHash.cosine(fa, fa, false, false))
    assert(GraftHash.cosine(da, fa, true, false) ===
      GraftHash.cosine(fa, fa, false, false))
    assert(GraftHash.dot(da, da, true, true) === GraftHash.dot(fa, fa, false, false))
    assert(GraftHash.l2(da, fa, true, false) === GraftHash.l2(fa, fa, false, false))
    assert(GraftHash.hyperplaneBucket(da, 12, 3, true) ===
      GraftHash.hyperplaneBucket(fa, 12, 3, false))
    assert(GraftHash.hyperplaneProbes(da, 12, 1, 4, true).toLongArray().toSeq ===
      GraftHash.hyperplaneProbes(fa, 12, 1, 4, false).toLongArray().toSeq)
  }
}
