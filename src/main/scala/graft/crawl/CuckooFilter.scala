package graft.crawl

/** From-scratch cuckoo filter — Fan, Andersen, Kaminsky, Mitzenmacher,
  * "Cuckoo Filter: Practically Better Than Bloom" (CoNEXT 2014, public
  * paper). Power-of-two bucket count, 4 slots per bucket, 16-bit nonzero
  * fingerprints, partial-key cuckoo hashing: the alternate bucket of a
  * fingerprint at bucket `i` is `i XOR h(fp)`, so an entry's candidate pair
  * is recoverable from its stored position alone — which is what makes
  * same-geometry segment MERGE possible (reinsert every stored entry by its
  * current bucket), the operation the crawl's per-wave segment fold needs.
  *
  * Role: a drop-in alternative to the sharded Bloom segments behind the
  * URL-seen pre-filter (`CrawlConfig.seenFilter = "cuckoo"`). Differences
  * that matter at the 10^10-url design point:
  *
  *   - ~12 bits/url per 16-bit-fingerprint entry at 0.84 load vs Bloom's
  *     ~9.6 bits at 1% fpp, but fpp ≈ 2·4·2^-16 ≈ 0.012% — ~80× fewer
  *     false probes falling through to the exact anti-join.
  *   - DELETION: a crawl that retires seen-set segments (e.g. recrawl
  *     windows aging out) can remove urls without rebuilding, which no
  *     Bloom variant supports.
  *
  * Correctness contract (same as the Bloom path): NEVER a false negative.
  * An insert that still fails after [[CuckooFilter.MaxKicks]] evictions
  * marks the filter saturated, after which `mightContain` answers true for
  * everything — degrading that segment to the exact anti-join, never to a
  * missed duplicate. The wave loop's outgrow-rebuild keeps load ≤ ~0.5, so
  * saturation is a never-in-practice safety net (forced in the spec).
  *
  * Determinism: FNV-1a/mix64 hashing over UTF-8 bytes and a
  * kick-count-derived eviction slot — identical results on every JVM.
  */
final class CuckooFilter private (
    val numBuckets: Int,
    private val table: Array[Short],
    private var nEntries: Int,
    private var saturatedFlag: Boolean) extends Serializable {

  import CuckooFilter._

  require(Integer.bitCount(numBuckets) == 1, s"numBuckets $numBuckets not a power of two")

  def size: Int = nEntries
  def saturated: Boolean = saturatedFlag

  @inline private def altIndex(i: Int, fp: Short): Int =
    i ^ (fpHash(fp) & (numBuckets - 1))

  @inline private def slot(b: Int, s: Int): Short = table(b * SlotsPerBucket + s)

  private def tryInsertAt(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == Empty) { table(b * SlotsPerBucket + s) = fp; return true }
      s += 1
    }
    false
  }

  private def bucketHas(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == fp) return true
      s += 1
    }
    false
  }

  /** Insert a fingerprint whose candidate pair includes bucket `i0` (for a
    * fresh url i0 = primary index; for a merged entry i0 = its stored
    * bucket — the XOR pair is position-invariant either way).
    */
  private def insertFp(i0: Int, fp0: Short): Unit = {
    if (saturatedFlag) return
    if (tryInsertAt(i0, fp0) || tryInsertAt(altIndex(i0, fp0), fp0)) {
      nEntries += 1
      return
    }
    // both candidate buckets full: cuckoo-kick a resident to its alternate
    var cur = i0
    var fp = fp0
    var kick = 0
    while (kick < MaxKicks) {
      val victim = (kick + (fp & 0x7fff)) % SlotsPerBucket // deterministic
      val pos = cur * SlotsPerBucket + victim
      val evicted = table(pos)
      table(pos) = fp
      fp = evicted
      cur = altIndex(cur, fp)
      if (tryInsertAt(cur, fp)) { nEntries += 1; return }
      kick += 1
    }
    // table effectively full: degrade to all-maybe, never lose an entry
    saturatedFlag = true
  }

  def put(url: String): Unit = {
    val h = hash64(url)
    insertFp((h & (numBuckets - 1)).toInt, fingerprint(h))
  }

  def mightContain(url: String): Boolean = {
    if (saturatedFlag) return true
    val h = hash64(url)
    val fp = fingerprint(h)
    val i1 = (h & (numBuckets - 1)).toInt
    bucketHas(i1, fp) || bucketHas(altIndex(i1, fp), fp)
  }

  /** Remove one stored copy of `url`'s fingerprint. Only meaningful on an
    * unsaturated filter whose url WAS inserted (deleting a never-inserted
    * url can evict a colliding entry — the standard cuckoo-filter caveat).
    */
  def delete(url: String): Boolean = {
    if (saturatedFlag) return false
    val h = hash64(url)
    val fp = fingerprint(h)
    val i1 = (h & (numBuckets - 1)).toInt
    var b = i1
    var attempt = 0
    while (attempt < 2) {
      var s = 0
      while (s < SlotsPerBucket) {
        if (slot(b, s) == fp) {
          table(b * SlotsPerBucket + s) = Empty
          nEntries -= 1
          return true
        }
        s += 1
      }
      b = altIndex(i1, fp)
      attempt += 1
    }
    false
  }

  /** Fold `other`'s entries into this filter (same numBuckets required —
    * both sides of a merge are built from the same generation's
    * `segCapacity`, mirroring Bloom's mergeInPlace contract).
    */
  def mergeInPlace(other: CuckooFilter): Unit = {
    require(other.numBuckets == numBuckets,
      s"merge across generations: $numBuckets vs ${other.numBuckets}")
    if (other.saturatedFlag) { saturatedFlag = true; return }
    var b = 0
    while (b < other.numBuckets && !saturatedFlag) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.slot(b, s)
        if (fp != Empty) insertFp(b, fp)
        s += 1
      }
      b += 1
    }
  }

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13 + table.length * 2)
    bb.putInt(Magic).putInt(numBuckets).putInt(nEntries)
      .put(if (saturatedFlag) 1.toByte else 0.toByte)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {

  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** Design load factor: 4-slot tables fill to ~95% before kicks fail (Fan
    * et al. §5); sizing to 0.84 keeps the kick chains short.
    */
  val TargetLoad = 0.84

  private val Magic = 0xc0c0f117
  private val Empty: Short = 0

  /** Hard per-segment bucket cap: all size arithmetic must stay within
    * Int/JVM-array bounds — table slots = numBuckets·4 and the serialized
    * form is 13 + slots·2 bytes, so numBuckets ≤ 2^27 keeps the byte count
    * at 2^30+13 < Int.MaxValue. One segment then holds ~4.5e8 urls at
    * [[TargetLoad]]; the 10^10-url design point is reached by SHARDING
    * (WaveCrawler's per-bucket segments), never by one giant table.
    */
  val MaxBuckets: Int = 1 << 27

  /** Filter sized for `capacity` expected urls at [[TargetLoad]]. */
  def create(capacity: Long): CuckooFilter = {
    val wantBuckets = math.ceil(capacity / TargetLoad / SlotsPerBucket).toLong max 1L
    val numBuckets = java.lang.Long.highestOneBit(
      math.min(wantBuckets * 2L - 1L, MaxBuckets.toLong)).toInt
    new CuckooFilter(numBuckets,
      new Array[Short](numBuckets * SlotsPerBucket), 0, false)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == Magic, "not a serialized CuckooFilter")
    val numBuckets = bb.getInt()
    require(numBuckets > 0 && numBuckets <= MaxBuckets,
      s"corrupt segment: numBuckets=$numBuckets outside (0, $MaxBuckets]")
    val n = bb.getInt()
    val sat = bb.get() == 1.toByte
    val table = new Array[Short](numBuckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort(); i += 1 }
    new CuckooFilter(numBuckets, table, n, sat)
  }

  /** FNV-1a over UTF-8 bytes, finalized through mix64 — deterministic
    * across JVMs and platforms (no dependence on String.hashCode).
    */
  def hash64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    graft.pipeline.TextAnalysis.mix64(h)
  }

  /** 16-bit fingerprint from the hash's high bits; 0 is the empty-slot
    * sentinel so it maps to 1.
    */
  @inline def fingerprint(h: Long): Short = {
    val fp = ((h >>> 32) & 0xffffL).toShort
    if (fp == 0) 1.toShort else fp
  }

  /** Bucket-displacement hash of a fingerprint for the XOR alternate
    * index — must not be identity or the pair collapses.
    */
  @inline def fpHash(fp: Short): Int =
    (graft.pipeline.TextAnalysis.mix64(fp.toLong & 0xffffL) >>> 17).toInt
}
