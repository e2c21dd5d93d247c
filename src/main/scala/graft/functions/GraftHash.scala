package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels called from both interpreted eval and generated
  * code (one static call per row keeps whole-stage codegen intact while
  * the tight loops stay in pre-compiled bytecode).
  *
  * MinHash per Broder '97 (resemblance estimation); SimHash per Charikar
  * '02; winnowing fingerprint per Schleimer/Wilkerson/Aiken '03. All
  * public algorithms; hashing built on Spark's own XXH64.
  */
object GraftHash {
  final val Seed = 42L

  /** Deterministic universal-hash parameters (spec-stable PRNG). */
  private def params(k: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(Seed)
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = rnd.nextLong() | 1L // odd multiplier
      b(i) = rnd.nextLong()
      i += 1
    }
    (a, b)
  }
  private val MaxK = 256
  private val (hashA, hashB) = params(MaxK)

  private def xx(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)

  /** MinHash signature of a token array: k minima of k universal hashes
    * of each token's 64-bit base hash. O(k·|tokens|) per row.
    */
  def minhashSig(tokens: ArrayData, k: Int): ArrayData = {
    require(k <= MaxK, s"k=$k exceeds $MaxK")
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val base = xx(tokens.getUTF8String(t))
        var i = 0
        while (i < k) {
          val h = hashA(i) * base + hashB(i)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  /** LSH band keys from a minhash signature: hash of each band of
    * `rowsPerBand` consecutive signature slots. Docs sharing any band
    * key are candidate near-duplicates.
    */
  def lshBands(sig: ArrayData, rowsPerBand: Int): ArrayData = {
    val k = sig.numElements()
    val nBands = k / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = Seed
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(sig.getLong(b * rowsPerBand + r), acc)
        r += 1
      }
      // mix band index so identical band values in different bands differ
      out(b) = XXH64.hashLong(b.toLong, acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of a token array (sign of per-bit weight sums). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = xx(tokens.getUTF8String(t))
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  // md5 digester per thread: MessageDigest is stateful and not
  // thread-safe; executor task threads each get one instance
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit SimHash with md5-derived token hashes. The token hash is
    * the integer value of the first 15 hex chars of md5(token) — i.e.
    * the digest's first 60 bits — which a SQL oracle can recompute
    * verbatim (`CAST('0x' || substr(md5(tok),1,15) AS BIGINT)`), making
    * the whole near-dup pair set exactly checkable cross-engine. md5 is
    * ~20× slower per token than the XXH64 kernel in [[simhash64]]; at
    * production scale prefer that variant — the signature semantics are
    * identical, only the (arbitrary) hash family differs.
    */
  def simhashMd5(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    val md = md5Local.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(t).getBytes)
        // big-endian first 8 bytes, then drop the low nibble: equals
        // parseUnsignedLong(hexDigest.substring(0, 15), 16)
        var h8 = 0L
        var i = 0
        while (i < 8) { h8 = (h8 << 8) | (d(i) & 0xFFL); i += 1 }
        val h = h8 >>> 4
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Winnowing document fingerprint: k-gram rolling hashes over the
    * character stream, minimum per window of w, distinct minima kept.
    * Robust to small edits — shared fingerprints indicate overlap.
    */
  def fingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // polynomial rolling hash base 257 over chars (unsigned wrap)
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = XXH64.hashLong(h, Seed)
    i = 1
    while (i < nGrams) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = XXH64.hashLong(h, Seed)
      i += 1
    }
    if (nGrams <= w) {
      var min = Long.MaxValue
      i = 0
      while (i < nGrams) { if (hashes(i) < min) min = hashes(i); i += 1 }
      return new GenericArrayData(Array(min))
    }
    val picked = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= nGrams) {
      var min = Long.MaxValue
      i = start
      while (i < start + w) { if (hashes(i) < min) min = hashes(i); i += 1 }
      picked.add(min)
      start += 1
    }
    val out = new Array[Long](picked.size())
    val it = picked.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Dense vector kernels (double accumulation). Each takes the two
    * sides' ELEMENT WIDTH as codegen-constant booleans: the Catalyst
    * expression resolves the child's element type at plan time
    * (array<float> or array<double>) and the kernel reads through the
    * matching accessor. Reading a double-backed column vector with
    * `getFloat` is not a wrong VALUE — it is an executor
    * NullPointerException (OnHeapColumnVector keeps per-type arrays,
    * and the float one is null), so width dispatch here is a
    * correctness fix, not a convenience. The per-element branch is on
    * a call-constant argument — the JIT sees one target per call site.
    */
  @inline private def elemAt(a: ArrayData, i: Int, isDouble: Boolean): Double =
    if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble

  /** Order-preserving bit image of a double: `x < y` (in Spark SQL's
    * double ordering — NaN greatest, `-0.0 == 0.0`) iff
    * `doubleSortBits(x) < doubleSortBits(y)` as signed longs. The
    * standard IEEE-754 sortable-bits map (negatives flip their
    * magnitude bits), with both zeros collapsed to 0L so the image
    * respects SQL's `-0.0 == 0.0`, and `doubleToLongBits`' canonical
    * NaN landing above +Inf exactly as SQL orders it. Lets a
    * lexicographic (double, id) aggregation ordering pack into one
    * numeric — the HashAggregate-friendly encoding of a `max_by`
    * struct ordering (struct-typed aggregation buffers are not
    * UnsafeRow-mutable, so they demote the whole aggregate to
    * SortAggregate).
    */
  def doubleSortBits(d: Double): Long = {
    if (d == 0.0) return 0L
    val b = java.lang.Double.doubleToLongBits(d)
    if (b < 0) b ^ 0x7fffffffffffffffL else b
  }

  def dot(a: ArrayData, b: ArrayData): Double = dot(a, b, false, false)

  def dot(a: ArrayData, b: ArrayData, aD: Boolean, bD: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elemAt(a, i, aD) * elemAt(b, i, bD); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = cosine(a, b, false, false)

  def cosine(a: ArrayData, b: ArrayData, aD: Boolean, bD: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elemAt(a, i, aD)
      val y = elemAt(b, i, bD)
      dp += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dp / denom
  }

  def l2(a: ArrayData, b: ArrayData): Double = l2(a, b, false, false)

  def l2(a: ArrayData, b: ArrayData, aD: Boolean, bD: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = elemAt(a, i, aD) - elemAt(b, i, bD)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Precomputed hyperplane matrices, keyed by (table, dim). Weights are
    * deterministic functions of (bit, i, table-seed) — the cache only
    * avoids re-deriving O(nBits·dim) hashes per ROW (they were previously
    * recomputed inside the hot loop). Table 0 reproduces the original
    * round-1 weights exactly; tables > 0 reseed so each LSH table uses an
    * independent plane set (independent collisions → real recall gain).
    */
  private val MaxBits = 64
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()
  private def planeMatrix(table: Int, dim: Int): Array[Double] = {
    val key = (table.toLong << 32) | dim.toLong
    var m = planeCache.get(key)
    if (m == null) {
      val seed = if (table == 0) Seed else XXH64.hashLong(table.toLong, Seed)
      m = new Array[Double](MaxBits * dim)
      var bit = 0
      while (bit < MaxBits) {
        var i = 0
        while (i < dim) {
          // deterministic N(0,1)-ish weight from (bit, i) via hash → uniform
          val h = XXH64.hashLong(bit.toLong * 1000003L + i, seed)
          // map to [-1, 1) uniform — sufficient for sign-projection LSH
          m(bit * dim + i) = (h >> 11).toDouble / (1L << 52).toDouble
          i += 1
        }
        bit += 1
      }
      planeCache.putIfAbsent(key, m)
    }
    m
  }

  /** Random-hyperplane LSH bucket (Charikar '02): sign bits of `nBits`
    * deterministic pseudo-random projections packed into a long.
    * Vectors with high cosine land in the same bucket w.h.p.
    * `table` selects an independent plane set (multi-table LSH).
    */
  def hyperplaneBucket(v: ArrayData, nBits: Int): Long =
    hyperplaneBucket(v, nBits, 0)

  def hyperplaneBucket(v: ArrayData, nBits: Int, table: Int): Long =
    hyperplaneBucket(v, nBits, table, false)

  def hyperplaneBucket(v: ArrayData, nBits: Int, table: Int, vD: Boolean): Long = {
    // 63, not 64: the plane matrix holds MaxBits rows, and 1L << 63 would
    // flip the sign bit — callers treat buckets as non-negative keys
    require(nBits > 0 && nBits <= 63 && nBits <= MaxBits,
      s"hyperplaneBucket: nBits must be in [1, 63], got $nBits")
    val dim = v.numElements()
    val m = planeMatrix(table, dim)
    var out = 0L
    var bit = 0
    while (bit < nBits) {
      var s = 0.0
      var i = 0
      val off = bit * dim
      while (i < dim) {
        s += m(off + i) * elemAt(v, i, vD)
        i += 1
      }
      if (s > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Multi-probe buckets (Lv et al., VLDB '07): the base hyperplane
    * bucket plus `nFlips` perturbed buckets obtained by flipping, one
    * at a time, the sign bits whose projection margin |s| is smallest —
    * the bits a true near-neighbor is most likely to disagree on.
    * Probing these buckets recovers most of the recall an extra hash
    * table would buy at zero extra corpus rows: the corpus still emits
    * one bucket per table; only the (tiny) probe side fans out.
    */
  def hyperplaneProbes(v: ArrayData, nBits: Int, table: Int, nFlips: Int): ArrayData =
    hyperplaneProbes(v, nBits, table, nFlips, false)

  def hyperplaneProbes(v: ArrayData, nBits: Int, table: Int, nFlips: Int,
      vD: Boolean): ArrayData = {
    require(nBits > 0 && nBits <= 63 && nBits <= MaxBits,
      s"hyperplaneProbes: nBits must be in [1, 63], got $nBits")
    require(nFlips >= 0 && nFlips <= nBits,
      s"hyperplaneProbes: nFlips must be in [0, $nBits], got $nFlips")
    val dim = v.numElements()
    val m = planeMatrix(table, dim)
    val margins = new Array[Double](nBits)
    var base = 0L
    var bit = 0
    while (bit < nBits) {
      var s = 0.0
      var i = 0
      val off = bit * dim
      while (i < dim) {
        s += m(off + i) * elemAt(v, i, vD)
        i += 1
      }
      if (s > 0) base |= (1L << bit)
      margins(bit) = math.abs(s)
      bit += 1
    }
    // order bits by ascending margin (nBits ≤ 63 — selection sort is
    // cheaper than boxing a sort for arrays this small)
    val order = Array.tabulate(nBits)(identity)
    var a = 0
    while (a < math.min(nFlips, nBits)) {
      var best = a
      var b = a + 1
      while (b < nBits) {
        if (margins(order(b)) < margins(order(best))) best = b
        b += 1
      }
      val tmp = order(a); order(a) = order(best); order(best) = tmp
      a += 1
    }
    val out = new Array[Long](1 + nFlips)
    out(0) = base
    var f = 0
    while (f < nFlips) {
      out(f + 1) = base ^ (1L << order(f))
      f += 1
    }
    new GenericArrayData(out)
  }

  // ---- Bloom filter kernels (per-file equality skipping) ----------
  //
  // Classic Bloom filter over a 64-bit element hash, double-hashed per
  // Kirsch–Mitzenmacher '06 ("Less Hashing, Same Performance"): the k
  // probe positions are h1 + i·h2 where h2 is an odd remix of h1, so
  // one upstream xxhash64 per element suffices. Build and probe share
  // these two kernels, which is what makes "bit set at build" ⇒ "bit
  // found at probe" a structural guarantee (no false negatives).

  /** SplitMix64 finalizer — decorrelates h2 from h1. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set element-hash `h`'s k bits in `words` (64 bits per word). */
  def bloomSet(words: Array[Long], h: Long, k: Int): Unit = {
    val nBits = words.length.toLong * 64L
    val h2 = mix64(h) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h + i * h2) & Long.MaxValue) % nBits
      words((pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
  }

  /** Greedy LEFT-TO-RIGHT NON-OVERLAPPING BPE pair rewrite of one
    * symbol array: every (a, b) adjacency becomes `ab`, consuming both
    * symbols before the scan continues ("aaa" under (a,a) → [aa, a]).
    * O(len) with ONE output buffer — the kernel behind
    * [[graft.functions.VectorExpressions.bpe_merge]], replacing the
    * HOF fold whose per-position accumulator concat copied the prefix
    * every step (O(len²) per word — latent for no-delimiter corpora
    * where a "word" is the whole document). Output strings are
    * references into the input array, consumed row-locally by the
    * projection that copies them out.
    */
  def bpeMerge(syms: ArrayData, a: UTF8String, b: UTF8String,
      ab: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[Any](n)
    var i = 0
    var m = 0
    while (i < n) {
      // null elements pass through untouched (a null never equals the
      // merge pair); the explicit isNullAt guards matter because an
      // UnsafeArrayData's getUTF8String does not null-check
      if (syms.isNullAt(i)) {
        out(m) = null; m += 1; i += 1
      } else {
        val cur = syms.getUTF8String(i)
        if (i + 1 < n && !syms.isNullAt(i + 1) && a.equals(cur) &&
            b.equals(syms.getUTF8String(i + 1))) {
          out(m) = ab; m += 1; i += 2
        } else {
          out(m) = cur; m += 1; i += 1
        }
      }
    }
    new GenericArrayData(if (m == n) out else out.take(m))
  }

  /** Membership probe: false ⇒ the element was NEVER added. */
  def bloomMightContain(words: Array[Long], h: Long, k: Int): Boolean = {
    val nBits = words.length.toLong * 64L
    val h2 = mix64(h) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h + i * h2) & Long.MaxValue) % nBits
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}
