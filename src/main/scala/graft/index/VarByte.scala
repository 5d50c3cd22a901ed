package graft.index

import scala.collection.mutable.ArrayBuffer

/** Delta-gap + variable-byte codec for posting blocks.
  *
  * Encoding: each Long is emitted as 7-bit groups, low to high, MSB of each
  * byte = continuation flag (1 = more bytes follow). Doc ids are sorted
  * ascending and delta-gapped (first value absolute, then gaps ≥ 1 when ids
  * are strictly increasing); tf values are encoded raw (small positive ints).
  *
  * This is the classic inverted-index block format (Manning/Raghavan/Schütze,
  * IIR §5.3); structurally it replaces the reference's pickled sorted blocks
  * (reference: index/hash_index.py:113-124 `_dump_block`) with a compact,
  * splittable binary column inside Parquet.
  */
object VarByte {

  def encodeLong(v0: Long, out: ArrayBuffer[Byte]): Unit = {
    require(v0 >= 0, s"varbyte requires non-negative values, got $v0")
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out += ((v & 0x7F) | 0x80).toByte
      v >>>= 7
    }
    out += (v & 0x7F).toByte
  }

  /** Encode an array of non-negative longs (no delta). */
  def encode(xs: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](xs.length * 2)
    var i = 0
    while (i < xs.length) { encodeLong(xs(i), out); i += 1 }
    out.toArray
  }

  /** Encode a sorted-ascending array as first-value + gaps. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](sorted.length * 2)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      val d = if (i == 0) v else v - prev
      require(i == 0 || d >= 0, s"doc ids not sorted: $prev then $v")
      encodeLong(d, out)
      prev = v
      i += 1
    }
    out.toArray
  }

  /** Decode n varbyte longs from bytes. */
  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(pos) & 0xFF
        v |= (b & 0x7FL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v
      i += 1
    }
    out
  }

  /** Decode n delta-gapped longs back to absolute sorted values. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = decode(bytes, n)
    var i = 1
    while (i < n) { out(i) += out(i - 1); i += 1 }
    out
  }
}
