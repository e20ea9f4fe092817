package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native DataSource V2 table over the reference's entire data model: a
  * directory of line-oriented text files (reference
  * manager/__main__.py:371-374 enumerates the dir SORTED BY FILENAME;
  * a record is one line, worker/__main__.py:137).
  *
  * `spark.read.format("linedir").load(dir)` yields
  * `(value STRING, file STRING, line BIGINT)` — the record, its source
  * file's name, and its 1-based line number (provenance columns the
  * reference loses the moment lines leave the mapper).
  *
  * Split parity: ONE InputPartition PER FILE, in sorted filename order —
  * exactly the reference's file-granular split unit (it never splits
  * within a file, so a Spark byte-range split would diverge for
  * stateful per-file mappers; see MapReduceJob.inputRddPerFile for the
  * RDD-side twin). Column pruning is pushed into the reader
  * (SupportsPushDownRequiredColumns): a `select(file)` never
  * materializes line strings.
  *
  * Scale posture: file listing happens once on the driver (names only);
  * readers stream lines off a BufferedReader — no whole-file buffering,
  * so a 1000-executor cluster reading a million-file dir is bounded by
  * one file handle per task. At 100 TB one would add multi-file
  * coalescing per partition (like maxPartitionBytes); the reference
  * semantics cap parallelism at #files, which this faithfully keeps.
  */
class LineDir extends TableProvider with DataSourceRegister {
  override def shortName(): String = "linedir"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineDir.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("linedir requires .load(path)"))
    new LineDirTable(path)
  }
}

object LineDir {
  val SCHEMA: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("line", LongType, nullable = false)))

  /** Sorted file list — the reference's deterministic enumeration. */
  def listSorted(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(_.getFileName.toString).toSeq.sorted
}

private[sources] class LineDirTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"linedir($path)"
  override def schema(): StructType = LineDir.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LineDirScanBuilder(path)
}

private[sources] class LineDirScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = LineDir.SCHEMA

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new LineDirScan(path, required)
}

private[sources] class LineDirScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    LineDir.listSorted(path)
      .map(f => LineDirPartition(path, f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new LineDirReaderFactory(required.fieldNames)
}

private[sources] case class LineDirPartition(dir: String, file: String)
    extends InputPartition

private[sources] class LineDirReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LineDirPartition]
    new LineDirReader(p.dir, p.file, fields)
  }
}

private[sources] class LineDirReader(dir: String, file: String,
    fields: Array[String]) extends PartitionReader[InternalRow] {
  private val reader = Files.newBufferedReader(
    Paths.get(dir, file), StandardCharsets.UTF_8)
  private val fileUtf8 = UTF8String.fromString(file)
  private var lineNo = 0L
  private var current: String = _

  override def next(): Boolean = {
    current = reader.readLine()
    lineNo += 1
    current != null
  }

  override def get(): InternalRow =
    new GenericInternalRow(fields.map[Any] {
      case "value" => UTF8String.fromString(current)
      case "file"  => fileUtf8
      case "line"  => lineNo
    })

  override def close(): Unit = reader.close()
}
