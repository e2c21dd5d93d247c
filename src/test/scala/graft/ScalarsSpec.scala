package graft

import org.apache.spark.sql.functions._

/** Value-level checks for the Spark-native hash families that the
  * q_hash_spark DERIVED oracle cannot check cross-engine (DuckDB has
  * no xxhash64/murmur3 twin). The reference kernels below are
  * implemented from the PUBLIC algorithm specs (xxHash by Yann Collet;
  * MurmurHash3 x86_32 by Austin Appleby, with Spark's documented
  * per-byte tail handling and its multi-column seed chaining), fully
  * independently of Spark's classes — a match is a genuine
  * cross-implementation verification of every hash value.
  */
class ScalarsSpec extends SparkSuite {

  // ---- standalone XXH64 (reference algorithm, little-endian) ----
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl64(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private def read64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 7
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
    v
  }

  private def read32(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 3
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
    v
  }

  private def xxhRound(acc: Long, input: Long): Long =
    rotl64(acc + input * P2, 31) * P1

  private def xxhMerge(h0: Long, v: Long): Long =
    (h0 ^ xxhRound(0L, v)) * P1 + P4

  def xxh64(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (len - i >= 32) {
          v1 = xxhRound(v1, read64(bytes, i))
          v2 = xxhRound(v2, read64(bytes, i + 8))
          v3 = xxhRound(v3, read64(bytes, i + 16))
          v4 = xxhRound(v4, read64(bytes, i + 24))
          i += 32
        }
        var hh = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18)
        hh = xxhMerge(hh, v1); hh = xxhMerge(hh, v2)
        hh = xxhMerge(hh, v3); xxhMerge(hh, v4)
      } else seed + P5
    h += len
    while (len - i >= 8) {
      h = rotl64(h ^ xxhRound(0L, read64(bytes, i)), 27) * P1 + P4
      i += 8
    }
    if (len - i >= 4) {
      h = rotl64(h ^ (read32(bytes, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl64(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^ (h >>> 32)
  }

  // ---- standalone Murmur3 x86_32, Spark variant ----
  private def mixK1(k0: Int): Int = {
    var k = k0 * 0xcc9e2d51
    k = Integer.rotateLeft(k, 15)
    k * 0x1b873593
  }

  private def mixH1(h0: Int, k: Int): Int = {
    var h = h0 ^ k
    h = Integer.rotateLeft(h, 13)
    h * 5 + 0xe6546b64
  }

  private def fmix(h0: Int, len: Int): Int = {
    var h = h0 ^ len
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** Spark's string hashing: 4-byte LE words, then REMAINING BYTES ONE
    * AT A TIME (signed byte each fed through mixK1/mixH1) — this tail
    * treatment is Spark's documented deviation from canonical murmur3.
    */
  def murmurBytes(bytes: Array[Byte], seed: Int): Int = {
    val len = bytes.length
    val aligned = len - len % 4
    var h = seed
    var i = 0
    while (i < aligned) {
      val word = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      h = mixH1(h, mixK1(word))
      i += 4
    }
    while (i < len) { h = mixH1(h, mixK1(bytes(i).toInt)); i += 1 }
    fmix(h, len)
  }

  def murmurLong(input: Long, seed: Int): Int = {
    var h = mixH1(seed, mixK1(input.toInt))
    h = mixH1(h, mixK1((input >>> 32).toInt))
    fmix(h, 8)
  }

  test("xxhash64 matches an independent XXH64 implementation (seed 42)") {
    val rows = Tables(spark, sf, "customer")
      .select(col("c_name"), xxhash64(col("c_name")).as("h"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val expected = xxh64(r.getString(0).getBytes("UTF-8"), 42L)
      assert(r.getLong(1) === expected, s"name=${r.getString(0)}")
    }
  }

  test("hash() matches independent Murmur3 with Spark's seed chaining") {
    // hash(c_name, c_custkey): seed 42 -> bytes of name -> long custkey
    val rows = Tables(spark, sf, "customer")
      .select(col("c_name"), col("c_custkey"),
        hash(col("c_name"), col("c_custkey")).as("h"))
      .collect()
    rows.foreach { r =>
      val h1 = murmurBytes(r.getString(0).getBytes("UTF-8"), 42)
      val expected = murmurLong(r.getLong(1), h1)
      assert(r.getInt(2) === expected, s"name=${r.getString(0)}")
    }
  }

  test("crc32 matches java.util.zip.CRC32") {
    val rows = Tables(spark, sf, "customer")
      .select(col("c_name"), crc32(col("c_name").cast("binary")).as("h"))
      .collect()
    rows.foreach { r =>
      val c = new java.util.zip.CRC32()
      c.update(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) === c.getValue, s"name=${r.getString(0)}")
    }
  }

  test("q_hash_spark invariants row is all-TRUE") {
    val rows = SparkEntry.queries("q_hash_spark")(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_rows") > 0)
    assert(r.getAs[Boolean]("xx64_injective"))
    assert(r.getAs[Boolean]("crc32_ok"))
    assert(r.getAs[Boolean]("murmur_ok"))
    assert(r.getAs[Boolean]("roundtrip_stable"))
  }
}
