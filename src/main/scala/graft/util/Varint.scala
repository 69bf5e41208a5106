package graft.util

/** Unsigned LEB128 varints over delta-encoded posting lists — the storage
  * format at-scale inverted indexes actually write (postings compression as
  * in Manning et al., "Introduction to Information Retrieval" ch. 5 —
  * public). A sorted doc-id list is stored as gaps (first gap = the first
  * id, later gaps = consecutive differences, all ≥ 0) with each gap in
  * 7-bit groups, low group first, high bit = continuation.
  *
  * [[lengthOf]] is the closed-form byte count the sizing query
  * (`search_postings_varbyte`) computes columnar-side; the spec pins
  * `lengthOf(v) == encode(v).length` across the full boundary sweep and
  * `decodeGaps(encodeGaps(ids)) == ids`, so the sizing report measures the
  * real format, not a formula that could drift from it.
  */
object Varint {

  /** Bytes the LEB128 encoding of v occupies: max(1, ⌈bits(v)/7⌉). */
  def lengthOf(v: Long): Int = {
    require(v >= 0L, s"varint of negative $v")
    var n = 1
    var x = v >>> 7
    while (x != 0L) { n += 1; x >>>= 7 }
    n
  }

  private def put(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a sorted doc-id list as delta varints. */
  def encodeGaps(sortedIds: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sortedIds.length * 2)
    var prev = 0L
    var i = 0
    while (i < sortedIds.length) {
      val id = sortedIds(i)
      require(if (i == 0) id >= 0L else id >= prev,
        s"posting $id after $prev (ids must be non-negative and sorted)")
      put(out, if (i == 0) id else id - prev)
      prev = id
      i += 1
    }
    out.toByteArray
  }

  /** Decode [[encodeGaps]] output back to the doc-id list. */
  def decodeGaps(bytes: Array[Byte]): Array[Long] = {
    val out = Array.newBuilder[Long]
    var i = 0
    var prev = 0L
    var first = true
    while (i < bytes.length) {
      var v = 0L
      var shift = 0
      var b = 0
      while ({
        if (i >= bytes.length)
          throw new IllegalArgumentException(
            s"truncated varint: continuation bit set on final byte (offset $i)")
        if (shift > 63)
          throw new IllegalArgumentException(
            s"malformed varint: more than 10 bytes at offset $i")
        b = bytes(i) & 0xff; i += 1; (b & 0x80) != 0
      }) {
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      if (shift > 63)
        throw new IllegalArgumentException(
          s"malformed varint: more than 10 bytes at offset $i")
      v |= b.toLong << shift
      prev = if (first) v else prev + v
      first = false
      out += prev
    }
    out.result()
  }
}
