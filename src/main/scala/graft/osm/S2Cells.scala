package graft.osm

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}

/** S2 cell token → boundary polygon, from the public S2 geometry spec
  * (s2geometry.io/devguide/s2cell_hierarchy; the cube-face Hilbert curve
  * with the quadratic ST→UV projection). The reference converts S2 tokens
  * via the `s2sphere` package (cli.py:227-257); this is a dependency-free
  * port of the same cell decomposition.
  *
  * Layout of a 64-bit cell id: 3 face bits, 2·level Hilbert position
  * bits, then a trailing 1 followed by zeros. A token is the id in hex
  * with trailing zeros stripped.
  */
object S2Cells {

  private val MaxLevel = 30
  private val gf = new GeometryFactory()

  // Hilbert-curve sub-cell traversal tables (public S2 constants).
  private val SwapMask = 0x01
  private val InvertMask = 0x02
  private val PosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 2, 3, 1), // swap
    Array(3, 2, 0, 1), // invert
    Array(3, 1, 0, 2)) // swap + invert
  private val PosToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  def cellIdFromToken(token: String): Long = {
    require(token.nonEmpty && token.length <= 16, s"bad S2 token: $token")
    val padded = token.toLowerCase(java.util.Locale.ROOT) + "0" * (16 - token.length)
    java.lang.Long.parseUnsignedLong(padded, 16)
  }

  def tokenFromCellId(id: Long): String = {
    val hex = f"$id%016x"
    hex.reverse.dropWhile(_ == '0').reverse match {
      case "" => "X" // invalid-id sentinel, matches s2 convention
      case t => t
    }
  }

  def level(id: Long): Int = {
    require(id != 0, "invalid S2 cell id")
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)
  }

  /** Decode (face, i, j, orientation) of the cell's leaf-min corner. */
  private def toFaceIJ(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    var i = 0
    var j = 0
    var orientation = face & SwapMask
    val lvl = level(id)
    var bitPos = 59 // top position pair sits at bits 60-59
    var l = 0
    while (l < lvl) {
      val pos = ((id >>> bitPos) & 3).toInt
      val ij = PosToIJ(orientation)(pos)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      orientation ^= PosToOrientation(pos)
      bitPos -= 2
      l += 1
    }
    (face, i, j)
  }

  /** Quadratic ST→UV projection (the S2 default). s ∈ [0,1] → u ∈ [-1,1]. */
  private def stToUV(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  /** (face, u, v) → unit-sphere direction (public face frames). */
  private def faceUVToXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  private def xyzToLonLat(x: Double, y: Double, z: Double): (Double, Double) = {
    val lng = math.atan2(y, x).toDegrees
    val lat = math.atan2(z, math.hypot(x, y)).toDegrees
    (lng, lat)
  }

  /** The 4 cell corners as (lon, lat), counter-clockwise. */
  def cellVertices(id: Long): Seq[(Double, Double)] = {
    val lvl = level(id)
    val (face, i, j) = toFaceIJ(id)
    val cellSize = 1 << (MaxLevel - lvl) // in leaf-ij units
    val scale = 1.0 / (1L << MaxLevel)
    val sLo = i.toLong * cellSize * scale
    val sHi = (i.toLong + 1) * cellSize * scale
    val tLo = j.toLong * cellSize * scale
    val tHi = (j.toLong + 1) * cellSize * scale
    val uLo = stToUV(sLo); val uHi = stToUV(sHi)
    val vLo = stToUV(tLo); val vHi = stToUV(tHi)
    Seq((uLo, vLo), (uHi, vLo), (uHi, vHi), (uLo, vHi)).map { case (u, v) =>
      val (x, y, z) = faceUVToXYZ(face, u, v)
      xyzToLonLat(x, y, z)
    }
  }

  /** Cell boundary as a JTS polygon (lon/lat degrees, closed ring). */
  def cellPolygon(id: Long): Geometry = {
    val vs = cellVertices(id)
    val ring = (vs :+ vs.head).map { case (lon, lat) => new Coordinate(lon, lat) }
    gf.createPolygon(ring.toArray)
  }

  /** Comma-separated S2 tokens → union geometry (cli.py:241-257). */
  def tokensToGeometry(tokens: Seq[String]): Geometry =
    tokens.map(t => cellPolygon(cellIdFromToken(t.trim)))
      .reduce(_.union(_))

  // ------------------------------------------------- encode (for tests) --

  /** UV→ST inverse of [[stToUV]]. */
  private def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u)
    else 1 - 0.5 * math.sqrt(1 - 3 * u)

  /** (lat, lng) degrees → leaf cell id (level 30), then truncate to
    * `lvl` — the inverse used by the self-consistency tests. */
  def cellIdFromLonLat(lon: Double, lat: Double, lvl: Int = MaxLevel): Long = {
    val phi = lat.toRadians
    val theta = lon.toRadians
    val x = math.cos(phi) * math.cos(theta)
    val y = math.cos(phi) * math.sin(theta)
    val z = math.sin(phi)
    // largest-component face selection
    val absX = math.abs(x); val absY = math.abs(y); val absZ = math.abs(z)
    val face =
      if (absX >= absY && absX >= absZ) { if (x > 0) 0 else 3 }
      else if (absY >= absZ) { if (y > 0) 1 else 4 }
      else { if (z > 0) 2 else 5 }
    val (u, v) = face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }
    val iLeaf = math.min((1L << MaxLevel) - 1,
      math.max(0L, (uvToST(u) * (1L << MaxLevel)).toLong)).toInt
    val jLeaf = math.min((1L << MaxLevel) - 1,
      math.max(0L, (uvToST(v) * (1L << MaxLevel)).toLong)).toInt
    fromFaceIJ(face, iLeaf, jLeaf, lvl)
  }

  /** Encode (face, leaf i, leaf j) to a cell id at `lvl` (inverse Hilbert). */
  private def fromFaceIJ(face: Int, i: Int, j: Int, lvl: Int): Long = {
    var id = face.toLong << 61
    var orientation = face & SwapMask
    var bitPos = 59
    var l = 0
    while (l < lvl) {
      val shift = MaxLevel - 1 - l
      val ij = (((i >> shift) & 1) << 1) | ((j >> shift) & 1)
      val pos = PosToIJ(orientation).indexOf(ij)
      id |= pos.toLong << bitPos
      orientation ^= PosToOrientation(pos)
      bitPos -= 2
      l += 1
    }
    // trailing marker bit for this level
    id | (1L << (2 * (MaxLevel - lvl)))
  }
}
