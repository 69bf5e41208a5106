package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Hand-assembled binaries (independent of the corpus generator's encoder)
  * pin the from-scratch BMP/WAV decoders to the public format layouts.
  */
class DecodersSpec extends AnyFunSuite {

  private def u16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32(v: Long): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)

  /** A 2x2 24-bit BMP, rows padded to 8 bytes, assembled byte-by-byte.
    * Bottom row first: pixels (B,G,R) = (1,2,3), (4,5,6); top row:
    * (7,8,9), (10,11,12).
    */
  private val bmp2x2: Array[Byte] = {
    val rowSize = 8 // 3*2=6 padded to 8
    val data = Seq[Byte](1, 2, 3, 4, 5, 6, 0, 0, 7, 8, 9, 10, 11, 12, 0, 0)
    (Seq[Byte]('B', 'M') ++ u32(54 + 16) ++ u16(0) ++ u16(0) ++ u32(54) ++
      u32(40) ++ u32(2) ++ u32(2) ++ u16(1) ++ u16(24) ++ u32(0) ++
      u32(rowSize * 2) ++ u32(2835) ++ u32(2835) ++ u32(0) ++ u32(0) ++ data).toArray
  }

  test("BMP: dimensions, channel sums, row padding") {
    val info = Decoders.decodeBmp(bmp2x2).toOption.get
    assert(info.width == 2 && info.height == 2)
    // B bytes: 1+4+7+10=22, G: 2+5+8+11=26, R: 3+6+9+12=30; padding excluded
    assert(info.sumB == 22 && info.sumG == 26 && info.sumR == 30)
  }

  test("BMP: malformed inputs rejected, not thrown") {
    assert(Decoders.decodeBmp(Array[Byte]('B', 'M', 1, 2)).isLeft) // truncated
    assert(Decoders.decodeBmp("XXXX".getBytes ++ bmp2x2.drop(4)).isLeft) // bad magic
    val bpp8 = bmp2x2.clone(); bpp8(28) = 8 // unsupported bit depth
    assert(Decoders.decodeBmp(bpp8).isLeft)
    val shortData = bmp2x2.take(60) // pixel data truncated
    assert(Decoders.decodeBmp(shortData).isLeft)
  }

  test("BMP: strided decode = nearest-neighbor downsample dims and sums") {
    // stride 2 on the 2x2 keeps only storage (x=0, y=0) → pixel (1,2,3)
    val half = Decoders.decodeBmpStrided(bmp2x2, 2).toOption.get
    assert(half.width == 1 && half.height == 1)
    assert(half.sumB == 1 && half.sumG == 2 && half.sumR == 3)
    // stride 1 ≡ full decode
    assert(Decoders.decodeBmpStrided(bmp2x2, 1) == Decoders.decodeBmp(bmp2x2))
  }

  test("BMP: Int-overflow-crafted headers rejected, not thrown") {
    // width = 715,827,883 makes 3*width overflow Int; the Long bounds check
    // must reject it as truncated instead of indexing b(negative)
    val huge = bmp2x2.clone()
    u32(715827883L).zipWithIndex.foreach { case (b, i) => huge(18 + i) = b }
    assert(Decoders.decodeBmp(huge).isLeft)
    // giant pixel-data offset: need > length must fail cleanly too
    val offs = bmp2x2.clone()
    u32(0xfffffff0L).zipWithIndex.foreach { case (b, i) => offs(10 + i) = b }
    assert(Decoders.decodeBmp(offs).isLeft)
  }

  /** Mono 16-bit 8000 Hz WAV with samples [100, -200, 32767, -32768]. */
  private val wav4: Array[Byte] = {
    val samples = Seq(100, -200, 32767, -32768)
    (Seq[Byte]('R', 'I', 'F', 'F') ++ u32(36 + 8) ++ Seq[Byte]('W', 'A', 'V', 'E') ++
      Seq[Byte]('f', 'm', 't', ' ') ++ u32(16) ++ u16(1) ++ u16(1) ++ u32(8000) ++
      u32(16000) ++ u16(2) ++ u16(16) ++
      Seq[Byte]('d', 'a', 't', 'a') ++ u32(8) ++
      samples.flatMap(s => u16(s & 0xffff))).toArray
  }

  test("WAV: rate, sample count, absolute amplitude sum") {
    val info = Decoders.decodeWav(wav4).toOption.get
    assert(info.sampleRate == 8000)
    assert(info.nSamples == 4)
    assert(info.ampSum == 100L + 200L + 32767L + 32768L)
  }

  test("WAV: unknown chunks are skipped (word-aligned)") {
    // insert a 3-byte "junk" chunk (padded to 4) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val junk = (Seq[Byte]('j', 'u', 'n', 'k') ++ u32(3) ++ Seq[Byte](9, 9, 9, 0)).toArray
    val withJunk = wav4.take(fmtEnd) ++ junk ++ wav4.drop(fmtEnd)
    // RIFF size field is not re-checked against total length by the parser
    val info = Decoders.decodeWav(withJunk).toOption.get
    assert(info.nSamples == 4 && info.ampSum == 100L + 200L + 32767L + 32768L)
  }

  test("WAV: malformed inputs rejected, not thrown") {
    assert(Decoders.decodeWav(wav4.take(20)).isLeft) // truncated
    val stereo = wav4.clone(); stereo(22) = 2 // channels=2 unsupported
    assert(Decoders.decodeWav(stereo).isLeft)
    val notWave = wav4.clone(); notWave(8) = 'X' // RIFF but not WAVE
    assert(Decoders.decodeWav(notWave).isLeft)
    val overrun = wav4.clone()
    overrun(40) = 0x7f // data chunk claims more bytes than exist
    assert(Decoders.decodeWav(overrun).isLeft)
  }

  test("WAV: strided decode keeps every stride-th sample") {
    // samples [100, -200, 32767, -32768], stride 2 keeps [100, 32767]
    val fs = Decoders.decodeWavStrided(wav4, 2).toOption.get
    assert(fs.nSamples == 2 && fs.ampSum == 100L + 32767L)
    assert(Decoders.decodeWavStrided(wav4, 1) == Decoders.decodeWav(wav4))
  }

  test("WAV: Int-overflow-crafted chunk size rejected, not thrown") {
    // chunk size near 2^31: i + 8 + size must be checked in Long, or the
    // overflowed negative sum slips past the bounds check
    val huge = wav4.clone()
    u32(0x7ffffffdL).zipWithIndex.foreach { case (b, i) => huge(16 + i) = b }
    assert(Decoders.decodeWav(huge).isLeft)
    // unsigned size ≥ 2^31 (would be negative as Int)
    val neg = wav4.clone()
    u32(0xfffffff0L).zipWithIndex.foreach { case (b, i) => neg(16 + i) = b }
    assert(Decoders.decodeWav(neg).isLeft)
  }
}
