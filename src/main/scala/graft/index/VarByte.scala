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
  *
  * The encoders write into a primitive growable byte array — the original
  * `ArrayBuffer[Byte]` accumulator boxed every emitted byte (generic Scala
  * collections erase to Array[AnyRef]), which at ~11 bytes per posting made
  * the encode allocation-bound; with run-generation encoding each posting
  * twice (map-side run + final block) the boxing dominated GC at high
  * parallelism.
  */
object VarByte {

  /** Primitive growable byte sink (no per-byte boxing). */
  private final class ByteSink(initCap: Int) {
    var buf = new Array[Byte](math.max(16, initCap))
    var n = 0
    def add(b: Byte): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
      buf(n) = b; n += 1
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  private def encodeLong(v0: Long, out: ByteSink): Unit = {
    require(v0 >= 0, s"varbyte requires non-negative values, got $v0")
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.add(((v & 0x7F) | 0x80).toByte)
      v >>>= 7
    }
    out.add((v & 0x7F).toByte)
  }

  /** Append one non-negative long to a byte buffer (kept for API
    * compatibility; the hot paths use the primitive sink internally). */
  def encodeLong(v0: Long, out: ArrayBuffer[Byte]): Unit = {
    val s = new ByteSink(10)
    encodeLong(v0, s)
    var i = 0
    while (i < s.n) { out += s.buf(i); i += 1 }
  }

  /** Encode an array of non-negative longs (no delta). */
  def encode(xs: Array[Long]): Array[Byte] = {
    val out = new ByteSink(xs.length * 2)
    var i = 0
    while (i < xs.length) { encodeLong(xs(i), out); i += 1 }
    out.result()
  }

  /** Encode a sorted-ascending array as first-value + gaps. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ByteSink(sorted.length * 2)
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
    out.result()
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
