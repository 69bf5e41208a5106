package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** LEB128 gap codec: boundary sweep, closed-form length, round-trips, and
  * agreement between the sizing query's threshold ladder and the real
  * encoder.
  */
class VarintSpec extends AnyFunSuite {

  private val boundaries: Seq[Long] =
    (0 to 8).flatMap { k =>
      val t = 1L << (7 * k)
      Seq(t - 1, t, t + 1)
    }.filter(_ >= 0L).distinct :+ Long.MaxValue

  test("lengthOf equals encode().length across the full boundary sweep") {
    for (v <- boundaries) {
      val enc = Varint.encodeGaps(Array(v))
      assert(Varint.lengthOf(v) == enc.length, s"v=$v")
      assert(Varint.decodeGaps(enc).toSeq == Seq(v), s"v=$v")
    }
    assert(Varint.lengthOf(0L) == 1)
    assert(Varint.lengthOf(127L) == 1)
    assert(Varint.lengthOf(128L) == 2)
    assert(Varint.lengthOf(Long.MaxValue) == 9)
  }

  test("delta round-trip on sorted id lists, including dup-free tight runs") {
    val lists = Seq(
      Array(0L),
      Array(0L, 1L, 2L, 3L),
      Array(5L, 130L, 16385L, 16386L, 1L << 40),
      (0L until 1000L by 7L).toArray)
    for (ids <- lists) {
      val enc = Varint.encodeGaps(ids)
      assert(Varint.decodeGaps(enc).toSeq == ids.toSeq)
      // encoded size = sum of per-gap lengths (first gap = first id)
      val gaps = ids.head +: ids.sliding(2).filter(_.length == 2)
        .map(p => p(1) - p(0)).toSeq
      assert(enc.length == gaps.map(Varint.lengthOf).sum)
    }
  }

  test("malformed input raises a descriptive error, never AIOOBE or a wrong value") {
    // truncated mid-varint: continuation bit set on the final byte
    val truncated = Array(0x80.toByte)
    val e1 = intercept[IllegalArgumentException](Varint.decodeGaps(truncated))
    assert(e1.getMessage.contains("truncated"))
    // over-long varint: 11 continuation bytes would shift past bit 63
    val overlong = Array.fill(11)(0x81.toByte) :+ 0x01.toByte
    val e2 = intercept[IllegalArgumentException](Varint.decodeGaps(overlong))
    assert(e2.getMessage.contains("malformed"))
    // a valid max-width varint still decodes (Long.MaxValue = 9 bytes)
    val max = Varint.encodeGaps(Array(Long.MaxValue))
    assert(Varint.decodeGaps(max).toSeq == Seq(Long.MaxValue))
  }

  test("the sizing query's threshold ladder equals the encoder length") {
    // the columnar formula: 1 + Σ_k [gap >= 2^(7k)]
    def ladder(gap: Long): Long =
      1L + (1 to 8).count(k => gap >= (1L << (7 * k)))
    for (v <- boundaries ++ Seq(1L, 99L, 12345L, 999999999L))
      assert(ladder(v) == Varint.lengthOf(v).toLong, s"v=$v")
  }

  test("postingsVarbyte sizes match a local encode of every posting list") {
    val spark = graft.SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val got = graft.pipeline.Search.postingsVarbyte(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
    val lists = docs.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sorted }
    val expected = lists.map { case (w, ids) =>
      w -> ((ids.length.toLong, Varint.encodeGaps(ids.toArray).length.toLong,
        ids.length * 8L))
    }
    assert(got == expected)
    // compression is real on this corpus: varint strictly beats fixed-8
    val (tv, tf) = got.values.foldLeft((0L, 0L)) {
      case ((a, b), (_, v, f)) => (a + v, b + f)
    }
    assert(tv < tf / 2, s"varint $tv vs fixed $tf")
  }
}
