package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Custom DataSourceV2 micro-batch source: tails an append-only
  * change-event log — the engine-side realization of "Structured
  * Streaming reading the MySQL binlog" (St2, SURVEY §2.9/§7.4; the
  * reference only records the binlog coordinates for this consumer,
  * mysql_to_clickhouse_sync.py:175-181).
  *
  * Log format: one TSV line per row-event,
  * `op\ttable\tkey\ttsMicros\tseq\tpayload` — the shape a binlog
  * decoder (or Debezium feed) would append. The streaming OFFSET is the
  * line count: `latestOffset` observes the current end of log, each
  * micro-batch reads `[start, end)` lines, and Spark's checkpoint
  * persists the committed offset — exactly the role the reference's
  * `metadata.txt` file position plays, but transactional with the sink.
  *
  * A binlog is inherently a serial stream per source server, so each
  * batch is one input partition (ordering preserved); parallelism at
  * 100 TB comes from many source servers → many streams, and from the
  * downstream keyed shuffle, not from splitting one server's log.
  * `maxLinesPerTrigger` bounds micro-batch size (backpressure).
  *
  * Usage:
  *   spark.readStream.format(classOf[BinlogSourceProvider].getName)
  *     .option("path", log).option("maxLinesPerTrigger", "1000").load()
  */
class BinlogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BinlogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new BinlogTable(properties.asScala.toMap)
}

object BinlogSource {
  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** Append change events to a log file in the source's TSV format. */
  def append(path: String, events: Seq[ChangeEvent]): Unit = {
    val lines = events.map { e =>
      val payload = Option(e.payload).getOrElse("\\N")
      s"${e.op}\t${e.table}\t${e.key}\t${e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000}\t${e.seq}\t$payload"
    }
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path),
      (lines.mkString("", "\n", "\n")).getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  private[streaming] def countLines(path: String): Long = {
    if (!Files.exists(Paths.get(path))) return 0L
    val in = Files.newInputStream(Paths.get(path))
    try {
      var count = 0L
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) { if (buf(i) == '\n') count += 1; i += 1 }
        n = in.read(buf)
      }
      count
    } finally in.close()
  }
}

class BinlogTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("binlog source requires 'path' option"))
  override def name(): String = s"binlog($path)"
  override def schema(): StructType = BinlogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BinlogSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new BinlogMicroBatchStream(path,
            options.getLong("maxLinesPerTrigger", Long.MaxValue))
      }
    }
}

case class BinlogOffset(line: Long) extends Offset {
  override def json(): String = s"""{"line":$line}"""
}

class BinlogMicroBatchStream(path: String, maxLinesPerTrigger: Long)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  override def initialOffset(): Offset = BinlogOffset(0L)

  /** Saturating add — `maxLinesPerTrigger` may be Long.MaxValue. */
  private def capped(start: Long): Long = {
    val cap = start + maxLinesPerTrigger
    val end = BinlogSource.countLines(path)
    if (cap < start) end else math.min(end, cap)
  }

  /** Admission control: the END offset Spark commits is already clamped
    * to `maxLinesPerTrigger`, so no line between the clamp and a larger
    * observed end can ever be skipped. (Clamping in planInputPartitions
    * instead would silently drop the lines between the clamp and the
    * committed end.)
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    BinlogOffset(capped(start.asInstanceOf[BinlogOffset].line))

  override def reportLatestOffset(): Offset =
    BinlogOffset(BinlogSource.countLines(path))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset =
    BinlogOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BinlogOffset].line
    val e = end.asInstanceOf[BinlogOffset].line
    if (e <= s) Array.empty
    else Array(BinlogPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new BinlogPartitionReader(partition.asInstanceOf[BinlogPartition])
    }
}

case class BinlogPartition(path: String, startLine: Long, endLine: Long)
  extends InputPartition

/** Reads lines [startLine, endLine) of the log, parsing TSV → rows. */
class BinlogPartitionReader(p: BinlogPartition) extends PartitionReader[InternalRow] {
  private val reader = Files.newBufferedReader(
    Paths.get(p.path), StandardCharsets.UTF_8)
  private var lineNo = 0L
  private var current: InternalRow = _
  // skip to startLine
  while (lineNo < p.startLine && reader.readLine() != null) lineNo += 1

  override def next(): Boolean = {
    if (lineNo >= p.endLine) return false
    val line = reader.readLine()
    if (line == null) return false
    lineNo += 1
    val f = line.split("\t", -1)
    current = new GenericInternalRow(Array[Any](
      UTF8String.fromString(f(0)),
      UTF8String.fromString(f(1)),
      f(2).toLong,
      f(3).toLong,                       // micros since epoch (TimestampType)
      f(4).toLong,
      if (f(5) == "\\N") null else UTF8String.fromString(f(5))))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
