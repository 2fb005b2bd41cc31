package graft.pbf

import java.util.zip.Inflater

/** One decoded OSM element (the §1.2 schema of SURVEY.md — mirrors the
  * relation produced by DuckDB's ST_ReadOSM, usage at
  * /root/reference/quackosm/pbf_file_reader.py:1546-1573).
  *
  * Null-ability contract (matches the reference scan):
  *  - tags: null when the element has no tags
  *  - refs: null for nodes; way node-refs; relation member ids
  *  - refTypes/refRoles: null except for relations
  *  - lat/lon: NaN (→ SQL null) except for nodes
  */
final case class OsmElement(
    kind: String,
    id: Long,
    tags: Array[(String, String)],
    refs: Array[Long],
    refTypes: Array[String],
    refRoles: Array[String],
    lat: Double,
    lon: Double)

/** Streaming decoder: Blob bytes → OSM elements. Pure function of the input
  * bytes — safe to call concurrently from many partition readers. */
object PbfDecoder {

  val KindNode = "node"
  val KindWay = "way"
  val KindRelation = "relation"
  private val MemberTypes = Array(KindNode, KindWay, KindRelation)

  /** Blob (fileformat.proto): raw(1) | raw_size(2) | zlib_data(3). */
  def inflateBlob(blob: Array[Byte]): Array[Byte] = {
    val r = new ProtoReader(blob)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zStart = -1
    var zLen = -1
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      f match {
        case 1 =>
          val (s, l) = r.readByteSlice()
          raw = java.util.Arrays.copyOfRange(r.buf, s, s + l)
        case 2 => rawSize = r.readVarint().toInt
        case 3 =>
          val (s, l) = r.readByteSlice(); zStart = s; zLen = l
        case _ => r.skip(wt)
      }
    }
    if (raw != null) raw
    else if (zStart >= 0) {
      val inf = new Inflater()
      inf.setInput(blob, zStart, zLen)
      var out = new Array[Byte](if (rawSize > 0) rawSize else math.max(zLen * 8, 1 << 16))
      var n = 0
      while (!inf.finished()) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        val got = inf.inflate(out, n, out.length - n)
        if (got == 0 && !inf.finished())
          throw new IllegalStateException(
            s"pbf: malformed zlib blob (inflater stalled at $n bytes, " +
              s"needsInput=${inf.needsInput()}, needsDict=${inf.needsDictionary()})")
        n += got
      }
      inf.end()
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    } else throw new IllegalStateException("pbf: blob has neither raw nor zlib data")
  }

  /** Decode one PrimitiveBlock; `kinds` prunes whole PrimitiveGroups (each
    * group holds a single element type per the spec), which makes the
    * ubiquitous kind = 'node'/'way'/'relation' filters skip-scan cheap. */
  def decodeBlock(block: Array[Byte], kinds: Set[String]): Iterator[OsmElement] = {
    val r = new ProtoReader(block)
    var strings: Array[String] = null
    val groups = new scala.collection.mutable.ArrayBuffer[ProtoReader](4)
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      f match {
        case 1 => // StringTable: repeated bytes s = 1
          val st = r.readMessage()
          val acc = new scala.collection.mutable.ArrayBuffer[String](1024)
          while (st.hasMore) {
            val (ff, wwt) = st.readTag()
            if (ff == 1) acc += st.readString() else st.skip(wwt)
          }
          strings = acc.toArray
        case 2  => groups += r.readMessage()
        case 17 => granularity = r.readVarint()
        case 19 => latOffset = r.readVarint()
        case 20 => lonOffset = r.readVarint()
        case _  => r.skip(wt)
      }
    }
    val st = if (strings == null) Array.empty[String] else strings
    groups.iterator.flatMap(g =>
      decodeGroup(g, st, granularity, latOffset, lonOffset, kinds))
  }

  private def coord(offset: Long, granularity: Long, v: Long): Double =
    1e-9 * (offset + granularity * v)

  private def tagArray(st: Array[String], keys: Array[Long], vals: Array[Long]): Array[(String, String)] =
    if (keys == null || keys.isEmpty) null
    else {
      val out = new Array[(String, String)](keys.length)
      var i = 0
      while (i < keys.length) {
        out(i) = (st(keys(i).toInt), st(vals(i).toInt))
        i += 1
      }
      out
    }

  private def decodeGroup(
      g: ProtoReader,
      st: Array[String],
      gran: Long,
      latOff: Long,
      lonOff: Long,
      kinds: Set[String]): Iterator[OsmElement] = {
    val out = new scala.collection.mutable.ArrayBuffer[OsmElement](1024)
    while (g.hasMore) {
      val (f, wt) = g.readTag()
      f match {
        case 1 if kinds(KindNode) => // plain Node
          val m = g.readMessage()
          var id = 0L
          var keys: Array[Long] = null
          var vals: Array[Long] = null
          var lat = 0L
          var lon = 0L
          while (m.hasMore) {
            val (ff, wwt) = m.readTag()
            ff match {
              case 1 => id = m.readSVarint()
              case 2 => keys = m.readPackedVarints()
              case 3 => vals = m.readPackedVarints()
              case 8 => lat = m.readSVarint()
              case 9 => lon = m.readSVarint()
              case _ => m.skip(wwt)
            }
          }
          out += OsmElement(KindNode, id, tagArray(st, keys, vals), null, null,
            null, coord(latOff, gran, lat), coord(lonOff, gran, lon))
        case 2 if kinds(KindNode) => // DenseNodes
          val m = g.readMessage()
          var ids: Array[Long] = null
          var lats: Array[Long] = null
          var lons: Array[Long] = null
          var kv: Array[Long] = null
          while (m.hasMore) {
            val (ff, wwt) = m.readTag()
            ff match {
              case 1  => ids = m.readPackedDeltaSVarints()
              case 8  => lats = m.readPackedDeltaSVarints()
              case 9  => lons = m.readPackedDeltaSVarints()
              case 10 => kv = m.readPackedVarints()
              case _  => m.skip(wwt)
            }
          }
          var kvPos = 0
          var i = 0
          while (i < ids.length) {
            var tags: scala.collection.mutable.ArrayBuffer[(String, String)] = null
            if (kv != null) {
              while (kvPos < kv.length && kv(kvPos) != 0) {
                if (tags == null) tags = new scala.collection.mutable.ArrayBuffer(4)
                tags += ((st(kv(kvPos).toInt), st(kv(kvPos + 1).toInt)))
                kvPos += 2
              }
              kvPos += 1 // the 0 separator
            }
            out += OsmElement(KindNode, ids(i),
              if (tags == null) null else tags.toArray, null, null, null,
              coord(latOff, gran, lats(i)), coord(lonOff, gran, lons(i)))
            i += 1
          }
        case 3 if kinds(KindWay) => // Way
          val m = g.readMessage()
          var id = 0L
          var keys: Array[Long] = null
          var vals: Array[Long] = null
          var refs: Array[Long] = null
          while (m.hasMore) {
            val (ff, wwt) = m.readTag()
            ff match {
              case 1 => id = m.readVarint()
              case 2 => keys = m.readPackedVarints()
              case 3 => vals = m.readPackedVarints()
              case 8 => refs = m.readPackedDeltaSVarints()
              case _ => m.skip(wwt)
            }
          }
          out += OsmElement(KindWay, id, tagArray(st, keys, vals), refs, null,
            null, Double.NaN, Double.NaN)
        case 4 if kinds(KindRelation) => // Relation
          val m = g.readMessage()
          var id = 0L
          var keys: Array[Long] = null
          var vals: Array[Long] = null
          var roles: Array[Long] = null
          var memids: Array[Long] = null
          var types: Array[Long] = null
          while (m.hasMore) {
            val (ff, wwt) = m.readTag()
            ff match {
              case 1  => id = m.readVarint()
              case 2  => keys = m.readPackedVarints()
              case 3  => vals = m.readPackedVarints()
              case 8  => roles = m.readPackedVarints() // roles_sid
              case 9  => memids = m.readPackedDeltaSVarints()
              case 10 => types = m.readPackedVarints()
              case _  => m.skip(wwt)
            }
          }
          val refTypes =
            if (types == null) null else types.map(t => MemberTypes(t.toInt))
          val refRoles =
            if (roles == null) null
            else roles.map(s => { val v = st(s.toInt); if (v.isEmpty) null else v })
          out += OsmElement(KindRelation, id, tagArray(st, keys, vals),
            if (memids == null) Array.empty[Long] else memids,
            refTypes, refRoles, Double.NaN, Double.NaN)
        case _ => g.skip(wt)
      }
    }
    out.iterator
  }
}
