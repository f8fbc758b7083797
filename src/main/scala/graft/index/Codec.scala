package graft.index

import java.nio.{ByteBuffer, ByteOrder}

/** Posting-block codecs (SURVEY.md §2.1 S4 / §4 O2): the Spark-native
  * upgrade of the reference's CSR contiguity (tokenizer.rs:68-74,
  * main.rs:77-83) — docIds delta+varint compressed, BM25 weights as raw
  * little-endian doubles (raw, not quantized, because the north rule's
  * rank-identity gate requires *exact* score equality), term frequencies
  * varint.
  *
  * Pure Scala, no Spark types: usable from executors, tests, and the
  * single-node oracle alike.
  */
object Codec {

  /** Unsigned LEB128 varint append. Accepts any Long bit pattern (negative
    * longs take 10 bytes); docId deltas are always positive.
    */
  def writeVarLong(out: java.io.ByteArrayOutputStream, vIn: Long): Unit = {
    var v = vIn
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  final class VarLongReader(bytes: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < bytes.length
    def next(): Long = {
      var v = 0L
      var shift = 0
      var b = 0L
      do {
        b = bytes(pos) & 0xFFL
        v |= (b & 0x7F) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      v
    }
  }

  /** Delta+varint encode a strictly-increasing docId sequence: first id
    * absolute, then gaps.
    */
  def encodeDocIds(ids: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ids.length * 2)
    var prev = 0L
    var i = 0
    while (i < ids.length) {
      writeVarLong(out, if (i == 0) ids(0) else ids(i) - prev)
      prev = ids(i)
      i += 1
    }
    out.toByteArray
  }

  def decodeDocIds(bytes: Array[Byte], n: Int): Array[Long] = {
    val r = new VarLongReader(bytes)
    val out = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = if (i == 0) r.next() else prev + r.next()
      out(i) = prev
      i += 1
    }
    out
  }

  def encodeVarLongs(xs: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(xs.length * 2)
    var i = 0
    while (i < xs.length) { writeVarLong(out, xs(i)); i += 1 }
    out.toByteArray
  }

  def decodeVarLongs(bytes: Array[Byte], n: Int): Array[Long] = {
    val r = new VarLongReader(bytes)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = r.next(); i += 1 }
    out
  }

  /** Raw little-endian IEEE-754 doubles (bit-exact round trip). */
  def encodeDoubles(xs: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < xs.length) { bb.putDouble(xs(i)); i += 1 }
    bb.array()
  }

  def decodeDoubles(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }
}
