package graft.pbf

/** Minimal protobuf wire-format reader over a byte-array slice — enough to
  * decode the OSM PBF container (fileformat.proto / osmformat.proto from the
  * public spec, wiki.openstreetmap.org/wiki/PBF_Format). Zero-copy: nested
  * messages are views (new reader over the same array).
  *
  * Reference behavior being reproduced: DuckDB's ST_ReadOSM scan, see
  * /root/reference/quackosm/pbf_file_reader.py:1199 and SURVEY.md §1.2.
  */
final class ProtoReader(val buf: Array[Byte], var pos: Int, val end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)

  @inline def hasMore: Boolean = pos < end

  @inline def readVarint(): Long = {
    var r = 0L
    var s = 0
    while (true) {
      val b = buf(pos)
      pos += 1
      r |= (b & 0x7fL) << s
      if ((b & 0x80) == 0) return r
      s += 7
    }
    r
  }

  /** zigzag-decoded signed varint (sint64). */
  @inline def readSVarint(): Long = {
    val n = readVarint()
    (n >>> 1) ^ -(n & 1)
  }

  /** Returns (fieldNumber, wireType). */
  @inline def readTag(): (Int, Int) = {
    val t = readVarint().toInt
    (t >>> 3, t & 7)
  }

  /** Length-delimited payload as a sub-reader (no copy). */
  def readMessage(): ProtoReader = {
    val len = readVarint().toInt
    val r = new ProtoReader(buf, pos, pos + len)
    pos += len
    r
  }

  def readByteSlice(): (Int, Int) = {
    val len = readVarint().toInt
    val start = pos
    pos += len
    (start, len)
  }

  def readString(): String = {
    val (start, len) = readByteSlice()
    new String(buf, start, len, java.nio.charset.StandardCharsets.UTF_8)
  }

  def skip(wireType: Int): Unit = wireType match {
    case 0 => readVarint()
    case 1 => pos += 8
    case 2 => val len = readVarint().toInt; pos += len
    case 5 => pos += 4
    case other => throw new IllegalStateException(s"pbf: wire type $other")
  }

  def readPackedVarints(): Array[Long] = {
    val m = readMessage()
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    while (m.hasMore) out += m.readVarint()
    out.toArray
  }

  def readPackedSVarints(): Array[Long] = {
    val m = readMessage()
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    while (m.hasMore) out += m.readSVarint()
    out.toArray
  }

  /** Packed sint64 with cumulative (delta) decoding — DenseNodes ids/coords,
    * way refs, relation memids. */
  def readPackedDeltaSVarints(): Array[Long] = {
    val a = readPackedSVarints()
    var i = 1
    while (i < a.length) { a(i) += a(i - 1); i += 1 }
    a
  }
}
