package graft.pipeline

/** From-scratch binary decoders for the multimodal pipeline — no codec
  * libraries: a minimal 24-bit uncompressed BMP parser and a 16-bit PCM
  * mono WAV parser, both implemented directly from the public file-format
  * layouts (BITMAPFILEHEADER/BITMAPINFOHEADER; RIFF/fmt/data chunks).
  *
  * The decoders are pure byte-array functions so the Spark side stays a
  * plain mapPartitions batch over the opaque `payload` column; failures
  * return Left and the pipeline classifies the blob as `unknown` rather
  * than failing the task (a corrupt blob must never kill a 100 TB job).
  */
object Decoders {

  final case class BmpInfo(width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)
  final case class WavInfo(sampleRate: Int, nSamples: Int, ampSum: Long)

  /** Pipeline-standard strides: images half-size (nearest-neighbor), audio
    * kept at every 4th sample. The corpus generator computes the
    * ground-truth features for exactly these strides while ENCODING.
    */
  val ResizeStride = 2
  val FrameStride = 4

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], i: Int): Int = u32(b, i).toInt

  /** 24-bit uncompressed bottom-up BMP: 14-byte file header ("BM", size,
    * pixel-data offset) + 40-byte BITMAPINFOHEADER (width, height, planes=1,
    * bpp=24, compression=0), rows padded to 4 bytes, pixels stored B,G,R.
    */
  def decodeBmp(b: Array[Byte]): Either[String, BmpInfo] = decodeBmpStrided(b, 1)

  /** Decode with a sampling stride — the RESIZE operator's kernel: stride=2
    * is a nearest-neighbor half-size downsample (pixels at even x,y), and
    * the returned dims are the resized image's. stride=1 is the full
    * decode. Separate row/col strides are a trivial extension; the Spark
    * side treats this as any other batched per-payload kernel.
    */
  def decodeBmpStrided(b: Array[Byte], stride: Int): Either[String, BmpInfo] = {
    if (b == null || b.length < 54) return Left("too short for BMP headers")
    if (b(0) != 'B' || b(1) != 'M') return Left("bad BMP magic")
    val pixelOffset = u32(b, 10)
    val headerSize = u32(b, 14)
    if (headerSize < 40) return Left(s"unsupported DIB header size $headerSize")
    val width = i32(b, 18)
    val height = i32(b, 22)
    val planes = u16(b, 26)
    val bpp = u16(b, 28)
    val compression = u32(b, 30)
    if (width <= 0 || height == 0) return Left(s"bad dimensions ${width}x$height")
    if (planes != 1) return Left(s"planes=$planes")
    if (bpp != 24) return Left(s"unsupported bpp=$bpp (24-bit only)")
    if (compression != 0) return Left(s"unsupported compression=$compression")
    val rows = math.abs(height.toLong) // negative height = top-down; sums unaffected
    // ALL size arithmetic in Long: header fields are attacker-controlled, and
    // 3*width or i+8+size overflowing Int would slip a negative value past
    // the bounds check and crash the task on a crafted payload — the exact
    // "corrupt blob kills the job" failure this module promises away.
    // rowSize*rows can overflow even LONG when width and height are both
    // near Int.MaxValue (~1.4e19 > 2^63), flipping `need` negative and
    // bypassing the truncation check — so bound each dim against the payload
    // FIRST (any genuine image needs ≥3 bytes/pixel-row-unit of payload)
    if (3L * width > b.length) return Left(s"width $width exceeds payload")
    if (rows > b.length) return Left(s"height $height exceeds payload")
    val rowSize = (3L * width + 3) / 4 * 4
    val need = pixelOffset + rowSize * rows
    if (need > b.length) return Left(s"pixel data truncated: need $need have ${b.length}")
    if (stride < 1) return Left(s"bad stride $stride")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < rows) {
      var i = (pixelOffset + y * rowSize).toInt
      var x = 0
      while (x < width) {
        sumB += b(i) & 0xff
        sumG += b(i + 1) & 0xff
        sumR += b(i + 2) & 0xff
        i += 3 * stride
        x += stride
      }
      y += stride
    }
    // rows*rowSize ≤ length ⇒ everything fits Int
    Right(BmpInfo((width + stride - 1) / stride, ((rows + stride - 1) / stride).toInt,
      sumR, sumG, sumB))
  }

  /** 16-bit PCM mono WAV: RIFF/"WAVE" container, "fmt " chunk with
    * audioFormat=1, channels=1, bits=16, then the "data" chunk of
    * little-endian signed samples. Chunks may appear in any order; unknown
    * chunks are skipped (word-aligned).
    */
  def decodeWav(b: Array[Byte]): Either[String, WavInfo] = decodeWavStrided(b, 1)

  /** Decode keeping every stride-th sample — the FRAME-SAMPLE operator's
    * kernel (stride=4 ≙ downsampling the clip 4×); nSamples/ampSum are the
    * sampled clip's. stride=1 is the full decode.
    */
  def decodeWavStrided(b: Array[Byte], stride: Int): Either[String, WavInfo] = {
    if (b == null || b.length < 44) return Left("too short for WAV headers")
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F')
      return Left("bad RIFF magic")
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return Left("not a WAVE container")
    var sampleRate = -1
    var dataStart = -1
    var dataLen = -1
    // cursor and chunk sizes in Long: a u32 size near 2^31 would overflow an
    // Int cursor past the bounds check (see the BMP note above)
    var i = 12L
    while (i + 8 <= b.length && (sampleRate < 0 || dataStart < 0)) {
      val ii = i.toInt
      val id = new String(b, ii, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(b, ii + 4)
      if (i + 8 + size > b.length)
        return Left(s"chunk '$id' overruns the payload")
      if (id == "fmt ") {
        if (size < 16) return Left("fmt chunk too small")
        val audioFormat = u16(b, ii + 8)
        val channels = u16(b, ii + 10)
        val bits = u16(b, ii + 22)
        if (audioFormat != 1) return Left(s"unsupported audioFormat=$audioFormat")
        if (channels != 1) return Left(s"unsupported channels=$channels (mono only)")
        if (bits != 16) return Left(s"unsupported bits=$bits (16-bit only)")
        sampleRate = u32(b, ii + 12).toInt
      } else if (id == "data") {
        dataStart = ii + 8
        dataLen = size.toInt // ≤ b.length by the overrun check ⇒ fits Int
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate < 0) return Left("missing fmt chunk")
    if (dataStart < 0) return Left("missing data chunk")
    if (stride < 1) return Left(s"bad stride $stride")
    val n = dataLen / 2
    var ampSum = 0L
    var k = 0
    var kept = 0
    while (k < n) {
      val s = (u16(b, dataStart + 2 * k).toShort).toInt
      ampSum += math.abs(s)
      kept += 1
      k += stride
    }
    Right(WavInfo(sampleRate, kept, ampSum))
  }
}
