package graft.ingest

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-zip` — a DataSourceV2 connector over [[ZipEntrySplits]]: zip
  * archives as a TABLE of entries, with the two scale properties a file
  * format needs baked into the SCAN, not the caller:
  *
  *  - **one InputPartition per entry** (central-directory-driven): a
  *    single multi-gigabyte archive fans out across the cluster instead
  *    of serializing into one task — zip itself is not splittable, so the
  *    split unit has to be the entry, planned from a driver-side ranged
  *    read of the directory only;
  *  - **column pruning reaches the byte reads**: the scan implements
  *    `SupportsPushDownRequiredColumns`, so a metadata query
  *    (`SELECT entry, size`) plans readers that never open the archive
  *    body at all — the listing already carried every non-content column.
  *
  * Usage: `spark.read.format("graft-zip").load(globOrPath)` →
  * (archive string, entry string, size long, content binary). Flat-
  * archive semantics match [[ZipSource]]/[[ZipExtract]] (entries with
  * path separators are skipped by the listing); zip64 rejects loudly.
  *
  * Scaladoc-level comparison with the reference's approach
  * (/root/reference/src/main.rs:153-170 — whole archive unzipped
  * driver-side, sequentially): the connector holds O(entries) metadata on
  * the driver and streams no content through it.
  */
class ZipDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zip"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipDataSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-zip: a path is required — spark.read.format(\"graft-zip\").load(path)"))
    new ZipTable(path)
  }
}

object ZipDataSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("entry", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))
}

private[ingest] class ZipTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-zip `$path`"
  override def schema(): StructType = ZipDataSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(path)
}

private[ingest] class ZipScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = ZipDataSource.fullSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Metadata-column predicates prune SPLITS at planning time — a
    * `WHERE entry LIKE '%.csv'` never even creates InputPartitions for
    * the other entries, the connector-level analogue of partition
    * pruning. Only exactly-evaluable entry/archive predicates are
    * accepted (and still re-checked by Spark post-scan is unnecessary:
    * we return them as fully handled). Everything else stays with Spark. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
  : Array[org.apache.spark.sql.sources.Filter] = {
    val (accepted, rejected) = filters.partition(ZipScanBuilder.evaluable)
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = new ZipScan(path, required, pushed)
}

private[ingest] object ZipScanBuilder {
  import org.apache.spark.sql.sources._
  /** Filters this connector can evaluate EXACTLY against split metadata. */
  def evaluable(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => meta(a)
    case StringStartsWith(a, _) => meta(a)
    case StringEndsWith(a, _) => meta(a)
    case StringContains(a, _) => meta(a)
    case In(a, vs) => meta(a) && vs.forall(_.isInstanceOf[String])
    case And(l, r) => evaluable(l) && evaluable(r)
    case Or(l, r) => evaluable(l) && evaluable(r)
    case Not(c) => evaluable(c)
    case _ => false
  }
  private def meta(attr: String): Boolean = attr == "entry" || attr == "archive"

  /** Evaluate an accepted filter against one split. */
  def matches(f: Filter, s: ZipEntrySplits.EntrySplit): Boolean = {
    def v(attr: String): String = if (attr == "entry") s.entry else s.archive
    f match {
      case EqualTo(a, x: String) => v(a) == x
      case StringStartsWith(a, p) => v(a).startsWith(p)
      case StringEndsWith(a, p) => v(a).endsWith(p)
      case StringContains(a, p) => v(a).contains(p)
      case In(a, vs) => vs.exists(_ == v(a))
      case And(l, r) => matches(l, s) && matches(r, s)
      case Or(l, r) => matches(l, s) || matches(r, s)
      case Not(c) => !matches(c, s)
      case _ => true
    }
  }
}

private[ingest] class ZipScan(path: String, required: StructType,
                              pushed: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    ZipEntrySplits.listEntries(spark, path)
      .filter(s => pushed.forall(ZipScanBuilder.matches(_, s)))
      .map(s => ZipEntryPartition(s): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Configuration is not serializable: ship the session's hadoop conf
    // as entries so fs impls/credentials reach the readers (same contract
    // as ZipEntrySplits.expand)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val it = conf.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    ZipReaderFactory(required.fieldNames.toSeq, b.result())
  }
}

private[ingest] case class ZipEntryPartition(split: ZipEntrySplits.EntrySplit)
    extends InputPartition

private[ingest] case class ZipReaderFactory(
    fields: Seq[String], confEntries: Seq[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[ZipEntryPartition].split
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        lazy val content: Array[Byte] = {
          val conf = new Configuration(false)
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          val p = new Path(split.archive)
          val fs = p.getFileSystem(conf)
          ZipEntrySplits.readEntry(fs, split)
        }
        // only the requested columns materialize — `content` inflates the
        // entry iff it was NOT pruned away
        InternalRow.fromSeq(fields.map {
          case "archive" => UTF8String.fromString(split.archive)
          case "entry" => UTF8String.fromString(split.entry)
          case "size" => split.uncompressedSize
          case "content" => content
          case other => throw new IllegalArgumentException(
            s"graft-zip: unknown column $other")
        })
      }
      override def close(): Unit = ()
    }
  }
}
