package graft.pbf

/** Minimal protobuf wire-format writer — the encoding twin of
  * [[ProtoReader]], enough to emit the OSM PBF container (fileformat.proto /
  * osmformat.proto, wiki.openstreetmap.org/wiki/PBF_Format). */
final class ProtoWriter(initial: Int = 1 << 16) {
  private var buf = new Array[Byte](initial)
  private var len = 0

  def size: Int = len
  def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)

  private def ensure(n: Int): Unit =
    if (len + n > buf.length) {
      var cap = buf.length * 2
      while (cap < len + n) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }

  @inline def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def writeVarint(v0: Long): Unit = {
    var v = v0
    ensure(10)
    while ((v & ~0x7fL) != 0) {
      buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1
      v >>>= 7
    }
    buf(len) = v.toByte; len += 1
  }

  @inline def writeSVarint(v: Long): Unit = writeVarint((v << 1) ^ (v >> 63))

  @inline def writeTag(field: Int, wireType: Int): Unit =
    writeVarint((field.toLong << 3) | wireType)

  def writeBytes(field: Int, b: Array[Byte]): Unit = {
    writeTag(field, 2)
    writeVarint(b.length)
    ensure(b.length)
    System.arraycopy(b, 0, buf, len, b.length)
    len += b.length
  }

  def writeString(field: Int, s: String): Unit =
    writeBytes(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def writeMessage(field: Int, m: ProtoWriter): Unit = writeBytes(field, m.toBytes)

  def writeVarintField(field: Int, v: Long): Unit = { writeTag(field, 0); writeVarint(v) }
  def writeSVarintField(field: Int, v: Long): Unit = { writeTag(field, 0); writeSVarint(v) }

  def writePackedVarints(field: Int, vs: Array[Long]): Unit = {
    val m = new ProtoWriter(vs.length * 2 + 16)
    vs.foreach(m.writeVarint)
    writeBytes(field, m.toBytes)
  }

  def writePackedSVarints(field: Int, vs: Array[Long]): Unit = {
    val m = new ProtoWriter(vs.length * 2 + 16)
    vs.foreach(m.writeSVarint)
    writeBytes(field, m.toBytes)
  }

  /** Packed sint64 with delta encoding — DenseNodes ids/coords, way refs,
    * relation memids. */
  def writePackedDeltaSVarints(field: Int, vs: Array[Long]): Unit = {
    val m = new ProtoWriter(vs.length * 2 + 16)
    var prev = 0L
    vs.foreach { v => m.writeSVarint(v - prev); prev = v }
    writeBytes(field, m.toBytes)
  }
}
