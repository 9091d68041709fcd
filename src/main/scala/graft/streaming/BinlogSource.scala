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
  * BYTE position of a line boundary — the same coordinate system as the
  * reference's `SHOW MASTER STATUS` binlog position
  * (mysql_to_clickhouse_sync.py:175-181), persisted by Spark's
  * checkpoint transactionally with the sink. Byte offsets make every
  * trigger O(newly-appended bytes): `latestOffset` seeks to the last
  * committed position and scans only forward, and the reader seeks
  * straight to its start — line-number offsets would force a full-file
  * count per trigger plus an O(offset) skip per batch, O(n²) over a
  * long-running stream.
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

  /** Byte position after the last newline within the next `maxLines`
    * complete lines starting at `startByte` — i.e. the furthest offset a
    * micro-batch may commit. Seeks to `startByte` and scans FORWARD only
    * (never the history before it), so the total scan work over a
    * stream's lifetime is O(log length), not O(n²). A trailing partial
    * line (a writer mid-append) is never admitted: only positions
    * directly after a '\n' are returned.
    */
  private[streaming] def advance(path: String, startByte: Long,
                                 maxLines: Long): Long = {
    if (!Files.exists(Paths.get(path))) return startByte
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(path), java.nio.file.StandardOpenOption.READ)
    try {
      ch.position(startByte)
      val in = java.nio.channels.Channels.newInputStream(ch)
      val buf = new Array[Byte](1 << 16)
      var pos = startByte
      var lastNl = startByte
      var lines = 0L
      var n = in.read(buf)
      while (n > 0 && lines < maxLines) {
        var i = 0
        while (i < n && lines < maxLines) {
          pos += 1
          if (buf(i) == '\n') { lines += 1; lastNl = pos }
          i += 1
        }
        n = if (lines < maxLines) in.read(buf) else 0
      }
      lastNl
    } finally ch.close()
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

case class BinlogOffset(bytes: Long) extends Offset {
  override def json(): String = s"""{"bytes":$bytes}"""
}

class BinlogMicroBatchStream(path: String, maxLinesPerTrigger: Long)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  override def initialOffset(): Offset = BinlogOffset(0L)

  /** Admission control: the END offset Spark commits is already clamped
    * to `maxLinesPerTrigger`, so no line between the clamp and a larger
    * observed end can ever be skipped. (Clamping in planInputPartitions
    * instead would silently drop the lines between the clamp and the
    * committed end.) The scan starts at the committed offset — per
    * trigger it touches only the bytes it admits.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    BinlogOffset(BinlogSource.advance(path,
      start.asInstanceOf[BinlogOffset].bytes, maxLinesPerTrigger))

  /** Monitoring only (never committed): the raw file size is an O(1)
    * upper bound on the latest line boundary.
    */
  override def reportLatestOffset(): Offset =
    BinlogOffset(
      if (Files.exists(Paths.get(path))) Files.size(Paths.get(path)) else 0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset = {
    // refuse pre-byte-offset checkpoints outright: a line NUMBER read as
    // a byte position would silently start mid-line (corrupt rows or a
    // reader crash) — an explicit restart-from-scratch beats either
    if (json.contains("\"line\""))
      throw new IllegalStateException(
        s"incompatible binlog checkpoint (line-based): $json — " +
          "delete the checkpoint dir to restart from the log head")
    BinlogOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BinlogOffset].bytes
    val e = end.asInstanceOf[BinlogOffset].bytes
    if (e <= s) Array.empty
    else Array(BinlogPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new BinlogPartitionReader(partition.asInstanceOf[BinlogPartition])
    }
}

case class BinlogPartition(path: String, startByte: Long, endByte: Long)
  extends InputPartition

/** Reads bytes [startByte, endByte) of the log — a seek, then a single
  * forward pass splitting on '\n' and parsing TSV → rows. Both bounds
  * are line-boundary positions produced by [[BinlogSource.advance]], so
  * the range always holds complete lines.
  */
class BinlogPartitionReader(p: BinlogPartition) extends PartitionReader[InternalRow] {
  private val channel = java.nio.channels.FileChannel.open(
    Paths.get(p.path), java.nio.file.StandardOpenOption.READ)
  channel.position(p.startByte)
  private val in = java.nio.channels.Channels.newInputStream(channel)
  private var pos = p.startByte
  // chunked scan: refill a 64 KB buffer and slice lines out of it — no
  // per-byte stream calls on the per-row hot path
  private val buf = new Array[Byte](1 << 16)
  private var bufLen = 0
  private var bufPos = 0
  private val lineBuf = new java.io.ByteArrayOutputStream(256)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (pos >= p.endByte) return false
    lineBuf.reset()
    while (true) {
      if (bufPos >= bufLen) {
        bufLen = in.read(buf)
        bufPos = 0
        if (bufLen <= 0) return false    // EOF inside range: partial write
      }
      var i = bufPos
      while (i < bufLen && buf(i) != '\n') i += 1
      lineBuf.write(buf, bufPos, i - bufPos)
      pos += i - bufPos
      bufPos = i
      if (i < bufLen) {                  // consumed the newline
        bufPos += 1
        pos += 1
        val f = new String(lineBuf.toByteArray, StandardCharsets.UTF_8)
          .split("\t", -1)
        current = new GenericInternalRow(Array[Any](
          UTF8String.fromString(f(0)),
          UTF8String.fromString(f(1)),
          f(2).toLong,
          f(3).toLong,                   // micros since epoch (TimestampType)
          f(4).toLong,
          if (f(5) == "\\N") null else UTF8String.fromString(f(5))))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
