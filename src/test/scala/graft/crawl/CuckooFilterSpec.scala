package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the from-scratch cuckoo filter (Fan et al. 2014):
  * never a false negative, fpp far below Bloom's 1%, deletion, merge by
  * stored-bucket reinsertion, serialization round-trip, and the saturation
  * safety net (degrade to all-maybe rather than ever losing an entry).
  */
class CuckooFilterSpec extends AnyFunSuite {

  private def urls(n: Int, prefix: String): IndexedSeq[String] =
    (0 until n).map(i => s"http://$prefix.test/page-$i?x=$i")

  test("no false negatives at design load; fpp far below bloom") {
    val n = 50000
    val cf = CuckooFilter.create(n.toLong)
    val in = urls(n, "in")
    in.foreach(cf.put)
    assert(!cf.saturated, "should not saturate at design load")
    assert(cf.size == n)
    in.foreach(u => assert(cf.mightContain(u), s"false negative: $u"))
    val out = urls(n, "out")
    val fp = out.count(cf.mightContain)
    // theory: ~2 buckets × 4 slots × 2^-16 ≈ 0.012%; allow 10× slack
    assert(fp < n / 800, s"fpp degenerate: $fp of $n")
  }

  test("delete removes a member without disturbing the rest") {
    val n = 2000
    val cf = CuckooFilter.create(n.toLong)
    val in = urls(n, "del")
    in.foreach(cf.put)
    val removed = in.filter(_.hashCode % 5 == 0)
    removed.foreach(u => assert(cf.delete(u), s"delete failed for member $u"))
    val kept = in.filterNot(_.hashCode % 5 == 0)
    kept.foreach(u => assert(cf.mightContain(u), s"false negative after deletes: $u"))
    assert(cf.size == kept.size)
    // deleted urls are (almost) all gone — only fingerprint collisions remain
    assert(removed.count(cf.mightContain) < removed.size / 50)
  }

  test("serialize round-trips exactly") {
    val cf = CuckooFilter.create(1000L)
    val in = urls(800, "ser")
    in.foreach(cf.put)
    val back = CuckooFilter.deserialize(cf.serialize)
    assert(back.numBuckets == cf.numBuckets && back.size == cf.size)
    in.foreach(u => assert(back.mightContain(u)))
    assert(!back.saturated)
  }

  test("merge holds the union with no false negatives") {
    val a = CuckooFilter.create(4000L)
    val b = CuckooFilter.create(4000L)
    assert(a.numBuckets == b.numBuckets, "same capacity must give same geometry")
    val ua = urls(1500, "a")
    val ub = urls(1500, "b")
    ua.foreach(a.put)
    ub.foreach(b.put)
    a.mergeInPlace(b)
    assert(!a.saturated)
    (ua ++ ub).foreach(u => assert(a.mightContain(u), s"lost in merge: $u"))
    assert(a.size == 3000)
  }

  test("overflow saturates to all-maybe — never a false negative") {
    val cf = CuckooFilter.create(8L) // tiny: a few buckets
    val in = urls(5000, "sat")
    in.foreach(cf.put)
    assert(cf.saturated, "5000 urls into an 8-capacity filter must saturate")
    in.foreach(u => assert(cf.mightContain(u)))
    // and everything else too: saturated = conservative
    assert(cf.mightContain("http://never.inserted/q"))
    // saturation survives serialization
    assert(CuckooFilter.deserialize(cf.serialize).mightContain("http://other/u"))
  }

  test("sizing: power-of-two buckets covering capacity at target load") {
    for (cap <- Seq(1L, 10L, 1000L, 123457L)) {
      val cf = CuckooFilter.create(cap)
      assert(Integer.bitCount(cf.numBuckets) == 1)
      assert(cf.numBuckets.toLong * CuckooFilter.SlotsPerBucket >=
        (cap / CuckooFilter.TargetLoad).toLong,
        s"cap $cap under-provisioned: ${cf.numBuckets} buckets")
    }
    // 10^10-url design point: 4096 segments → ~2.4M urls each → ~8 MB tables
    val seg = CuckooFilter.create(WaveCrawler.segCapacityFor(10000000000L, 4096, 1024L))
    val mb = seg.numBuckets.toLong * CuckooFilter.SlotsPerBucket * 2 / 1e6
    assert(mb > 4 && mb < 40, s"per-segment $mb MB off the design envelope")
  }

  test("sizing: a huge capacity clamps to MaxBuckets with Int-safe arithmetic") {
    // capacity far beyond one segment's range: the old Int arithmetic threw
    // NegativeArraySizeException here (numBuckets·4 overflowed Int); the
    // clamp keeps the table and its serialized form within JVM array bounds
    val cf = CuckooFilter.create(Long.MaxValue)
    assert(cf.numBuckets == CuckooFilter.MaxBuckets)
    val slots = cf.numBuckets.toLong * CuckooFilter.SlotsPerBucket
    assert(13L + slots * 2L <= Int.MaxValue.toLong,
      "serialized form would overflow a byte array")
    // the clamped filter still works
    cf.put("http://clamp.test/a")
    assert(cf.mightContain("http://clamp.test/a"))
  }

  test("deserialize rejects a corrupt bucket count instead of allocating garbage") {
    val bb = java.nio.ByteBuffer.allocate(13)
    bb.putInt(0xc0c0f117).putInt(-7).putInt(0).put(0.toByte)
    val e = intercept[IllegalArgumentException](CuckooFilter.deserialize(bb.array()))
    assert(e.getMessage.contains("numBuckets"))
  }
}
