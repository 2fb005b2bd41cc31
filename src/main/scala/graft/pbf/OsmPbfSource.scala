package graft.pbf

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for OpenStreetMap `*.osm.pbf` files —
  * `spark.read.format("osmpbf").load(path)`.
  *
  * Re-expresses the reference's DuckDB `ST_ReadOSM` scan
  * (/root/reference/quackosm/pbf_file_reader.py:1199; schema per SURVEY §1.2)
  * Spark-first:
  *
  *  - **Parallelism**: a PBF file is a sequence of independently-compressed
  *    Blobs (~8k elements each). The driver scans only the 4-byte length +
  *    BlobHeader chain (cheap metadata pass, no data read) and packs
  *    consecutive OSMData blobs into input partitions of
  *    `spark.sql.files.maxPartitionBytes`-ish size. A planet-scale file
  *    (~80 GB, ~100k blobs) therefore yields thousands of parallel splits —
  *    the multithreading claim of the reference (README.md:30-32) becomes
  *    multi-executor for free.
  *  - **Column pruning** (SupportsPushDownRequiredColumns): tag/ref/coord
  *    decoding is skipped for columns the query never reads.
  *  - **Kind pushdown** (SupportsPushDownFilters on `kind =`/`IN`): a
  *    PrimitiveGroup holds one element type, so the ubiquitous per-kind
  *    passes (pbf_file_reader.py:1546-1573) skip whole groups without
  *    decoding them.
  */
class OsmPbfSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "osmpbf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmPbfSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OsmPbfTable(OsmPbfSource.resolvePaths(properties))
}

object OsmPbfSource {
  val Schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = true),
    StructField("refs", ArrayType(LongType), nullable = true),
    StructField("ref_types", ArrayType(StringType), nullable = true),
    StructField("ref_roles", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true)))

  def resolvePaths(properties: util.Map[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).map { json =>
      json.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    }.getOrElse(Seq.empty)
    val single = Option(properties.get("path")).toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "osmpbf: no path specified")
    all
  }

  /** One compressed OSMData blob: where its payload lives in the file. */
  case class BlobRef(path: String, offset: Long, length: Int)

  /** Driver-side metadata pass: walk the BlobHeader chain (4-byte BE length
    * + header message + payload skip). Reads ~64 bytes per ~1 MB blob. */
  def scanBlobs(paths: Seq[String], conf: Configuration): Seq[BlobRef] = {
    paths.flatMap { p =>
      val hPath = new Path(p)
      val fs = hPath.getFileSystem(conf)
      val statuses = fs.globStatus(hPath) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case arr  => arr
      }
      require(statuses.nonEmpty, s"osmpbf: no files match $p")
      statuses.flatMap { status =>
        val len = status.getLen
        val in = fs.open(status.getPath)
        try {
          val refs = scala.collection.mutable.ArrayBuffer.empty[BlobRef]
          var pos = 0L
          val lenBuf = new Array[Byte](4)
          while (pos + 4 <= len) {
            in.readFully(pos, lenBuf, 0, 4)
            val hLen = ((lenBuf(0) & 0xff) << 24) | ((lenBuf(1) & 0xff) << 16) |
              ((lenBuf(2) & 0xff) << 8) | (lenBuf(3) & 0xff)
            val hBuf = new Array[Byte](hLen)
            in.readFully(pos + 4, hBuf, 0, hLen)
            var bType: String = null
            var dataSize = 0
            val r = new ProtoReader(hBuf)
            while (r.hasMore) {
              val (f, wt) = r.readTag()
              f match {
                case 1 => bType = r.readString()
                case 3 => dataSize = r.readVarint().toInt
                case _ => r.skip(wt)
              }
            }
            val dataPos = pos + 4 + hLen
            if (bType == "OSMData")
              refs += BlobRef(status.getPath.toString, dataPos, dataSize)
            pos = dataPos + dataSize
          }
          refs.toSeq
        } finally in.close()
      }
    }
  }
}

class OsmPbfTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"osmpbf(${paths.mkString(",")})"
  override def schema(): StructType = OsmPbfSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OsmPbfScanBuilder(paths)
}

class OsmPbfScanBuilder(paths: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var requiredSchema: StructType = OsmPbfSource.Schema
  private var kinds: Set[String] = Set("node", "way", "relation")
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("kind", _: String) => true
      case In("kind", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    if (accepted.nonEmpty) {
      kinds = accepted.map {
        case EqualTo(_, v: String) => Set(v)
        case In(_, vs) => vs.map(_.asInstanceOf[String]).toSet
        case _ => Set.empty[String]
      }.reduce(_ intersect _)
      pushed = accepted
    }
    // kind filters are exact on whole groups but we keep them in the plan
    // (rest ++ accepted would double-eval; Spark re-applies `rest` only).
    rest ++ accepted
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new OsmPbfScan(paths, requiredSchema, kinds)
}

class OsmPbfScan(paths: Seq[String], requiredSchema: StructType, kinds: Set[String])
    extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def description(): String =
    s"osmpbf kinds=${kinds.mkString("|")} cols=${requiredSchema.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val blobs = OsmPbfSource.scanBlobs(paths, conf)
    // Pack consecutive blobs (locality) into compressed splits. Cap at
    // ~32 MB (blobs inflate ~2×, tracking maxPartitionBytes-ish sizes at
    // cluster scale) but ALSO divide small inputs across the available
    // cores — a 24 MB extract must not become one single-threaded split.
    val parallelism =
      try org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism
      catch { case scala.util.control.NonFatal(_) => 8 }
    val totalBytes = blobs.map(_.length.toLong).sum
    val target = math.max(1L << 20,
      math.min(32L * 1024 * 1024, totalBytes / math.max(1, parallelism) + 1))
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    var cur = scala.collection.mutable.ArrayBuffer.empty[OsmPbfSource.BlobRef]
    var curBytes = 0L
    blobs.foreach { b =>
      if (curBytes + b.length > target && cur.nonEmpty) {
        parts += OsmPbfPartition(cur.toArray)
        cur = scala.collection.mutable.ArrayBuffer.empty
        curBytes = 0L
      }
      cur += b
      curBytes += b.length
    }
    if (cur.nonEmpty) parts += OsmPbfPartition(cur.toArray)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OsmPbfReaderFactory(requiredSchema, kinds)
}

case class OsmPbfPartition(blobs: Array[OsmPbfSource.BlobRef]) extends InputPartition

class OsmPbfReaderFactory(requiredSchema: StructType, kinds: Set[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OsmPbfPartitionReader(
      partition.asInstanceOf[OsmPbfPartition], requiredSchema, kinds)
}

class OsmPbfPartitionReader(
    partition: OsmPbfPartition,
    requiredSchema: StructType,
    kinds: Set[String]) extends PartitionReader[InternalRow] {

  private val fieldIdx: Array[Int] =
    requiredSchema.fieldNames.map(OsmPbfSource.Schema.fieldIndex)
  private val conf = new Configuration()
  private var fs: FileSystem = _
  private var in: org.apache.hadoop.fs.FSDataInputStream = _
  private var openPath: String = _
  private var blobIdx = 0
  private var elems: Iterator[OsmElement] = Iterator.empty
  private var current: OsmElement = _

  private def nextBlob(): Boolean = {
    if (blobIdx >= partition.blobs.length) return false
    val b = partition.blobs(blobIdx)
    blobIdx += 1
    if (openPath != b.path) {
      if (in != null) in.close()
      val p = new Path(b.path)
      fs = p.getFileSystem(conf)
      in = fs.open(p)
      openPath = b.path
    }
    val buf = new Array[Byte](b.length)
    in.readFully(b.offset, buf, 0, b.length)
    elems = PbfDecoder.decodeBlock(PbfDecoder.inflateBlob(buf), kinds)
    true
  }

  override def next(): Boolean = {
    while (!elems.hasNext) if (!nextBlob()) return false
    current = elems.next()
    true
  }

  override def get(): InternalRow = {
    val e = current
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fieldIdx.length)
    var i = 0
    while (i < fieldIdx.length) {
      row.update(i, fieldIdx(i) match {
        case 0 => UTF8String.fromString(e.kind)
        case 1 => e.id
        case 2 =>
          if (e.tags == null) null
          else new ArrayBasedMapData(
            new GenericArrayData(e.tags.map(t => UTF8String.fromString(t._1)).asInstanceOf[Array[Any]]),
            new GenericArrayData(e.tags.map(t => UTF8String.fromString(t._2)).asInstanceOf[Array[Any]]))
        case 3 =>
          if (e.refs == null) null
          else new GenericArrayData(e.refs.map(Long.box).asInstanceOf[Array[Any]])
        case 4 =>
          if (e.refTypes == null) null
          else new GenericArrayData(e.refTypes.map(s =>
            if (s == null) null else UTF8String.fromString(s)).asInstanceOf[Array[Any]])
        case 5 =>
          if (e.refRoles == null) null
          else new GenericArrayData(e.refRoles.map(s =>
            if (s == null) null else UTF8String.fromString(s)).asInstanceOf[Array[Any]])
        case 6 => if (e.lat.isNaN) null else e.lat
        case 7 => if (e.lon.isNaN) null else e.lon
      })
      i += 1
    }
    row
  }

  override def close(): Unit = if (in != null) in.close()
}
