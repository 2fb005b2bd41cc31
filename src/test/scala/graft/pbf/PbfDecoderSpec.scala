package graft.pbf

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the Blob inflater (fileformat.proto semantics). */
class PbfDecoderSpec extends AnyFunSuite {

  /** Encode a Blob message with only zlib_data (field 3) — raw_size (field
    * 2) deliberately OMITTED, the case the zLen*8 fallback used to
    * truncate. */
  private def deflate(payload: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(payload)
    deflater.finish()
    val buf = new Array[Byte](payload.length + 64)
    val zLen = deflater.deflate(buf)
    deflater.end()
    java.util.Arrays.copyOf(buf, zLen)
  }

  private def blobOfZlib(z: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write((3 << 3) | 2) // field 3, wiretype 2 (length-delimited)
    var v = z.length // varint length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    out.write(z, 0, z.length)
    out.toByteArray
  }

  private def blobWithoutRawSize(payload: Array[Byte]): Array[Byte] =
    blobOfZlib(deflate(payload))

  test("inflateBlob grows past 8x compression when raw_size is absent") {
    // 1 MiB of zeros deflates ~1000x — far beyond the old zLen*8 cap
    val payload = new Array[Byte](1024 * 1024)
    val blob = blobWithoutRawSize(payload)
    val back = PbfDecoder.inflateBlob(blob)
    assert(back.length == payload.length)
    assert(java.util.Arrays.equals(back, payload))
  }

  test("inflateBlob round-trips incompressible data without raw_size") {
    val rnd = new java.util.Random(42)
    val payload = new Array[Byte](100000)
    rnd.nextBytes(payload)
    val blob = blobWithoutRawSize(payload)
    val back = PbfDecoder.inflateBlob(blob)
    assert(java.util.Arrays.equals(back, payload))
  }

  test("inflateBlob fails fast on truncated zlib data") {
    val payload = Array.fill[Byte](50000)(7)
    val z = deflate(payload)
    // valid protobuf frame around a zlib stream chopped mid-way: the
    // decoder must throw, not spin forever
    val truncated = blobOfZlib(java.util.Arrays.copyOf(z, z.length / 2))
    assertThrows[IllegalStateException](PbfDecoder.inflateBlob(truncated))
  }
}
