package graft.sources.cdc

import java.util
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 Structured Streaming source for the MaxScale CDC
  * protocol: `spark.readStream.format("maxscale-cdc")` with options
  * `host, port, user, password, database, table [, uuid, version,
  * gtid]` (SURVEY.md §4.2 "custom pieces", reference operators A1–A8).
  *
  * Rows carry the fixed DML metadata envelope plus the raw JSON payload;
  * downstream projects columns with `from_json(payload,
  * registry.latest(db, table))` — the same lazy schema-on-read split as
  * the reference's `RawData` (`types.go:182-190`), but the registry is
  * fed in-band by DDL events (kind = "ddl" rows carry the schema JSON).
  *
  * Offsets are the count of events ingested since source start; a
  * restart re-subscribes from the checkpointed GTID (the reference's
  * resume mechanism, `gomaxscale_options.go:53-57`), upgrading its
  * at-most-once delivery to micro-batch replay.
  *
  * Scale note: one TCP subscription is inherently a single-reader
  * stream — the parallelism lever is downstream (`repartition` after
  * `load()`), matching how one binlog shard maps onto one source task;
  * multi-table fan-in = one source per table, unioned.
  */
object MaxScaleCdc {
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false), // ddl | dml | corrupt
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("op", StringType), // insert|update_before|update_after|delete for dml
    StructField("domain", IntegerType),
    StructField("server_id", IntegerType),
    StructField("sequence", LongType),
    StructField("event_number", LongType),
    StructField("ts", TimestampType),
    StructField("gtid", StringType), // set on ddl events
    StructField("schema_version", IntegerType), // set on ddl events
    StructField("payload", StringType))) // raw event JSON / error text

  /** Serializable row snapshot buffered on the driver. */
  final case class EventRow(
      kind: String, database: String, table: String, op: String,
      domain: java.lang.Integer, serverId: java.lang.Integer,
      sequence: java.lang.Long, eventNumber: java.lang.Long,
      tsMicros: java.lang.Long, gtid: String,
      schemaVersion: java.lang.Integer, payload: String)

  def toRow(db: String, tbl: String, ev: Either[String, CdcEvent]): EventRow = ev match {
    case Right(d: DdlEvent) =>
      EventRow("ddl", d.database, d.table, null, null, null, null, null, null,
        d.gtid, d.version, d.rawJson)
    case Right(m: DmlEvent) =>
      EventRow("dml", db, tbl, m.eventKind, m.domain, m.serverId, m.sequence,
        m.eventNumber, m.timestamp * 1000000L, null, null, m.rawJson)
    case Left(err) =>
      EventRow("corrupt", db, tbl, null, null, null, null, null, null, null, null, err)
  }
}

final class MaxScaleCdcProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "maxscale-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MaxScaleCdc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MaxScaleCdcTable(properties.asScala.toMap)
}

final class MaxScaleCdcTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"maxscale-cdc(${options.getOrElse("database", "?")}.${options.getOrElse("table", "?")})"
  override def schema(): StructType = MaxScaleCdc.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = MaxScaleCdc.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MaxScaleCdcMicroBatchStream(options)
    }
}

final case class CdcOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** Pluggable warn channel for non-fatal receiver conditions (decode
  * failures, interleaved server messages) — the analog of the
  * reference's injectable logger (`gomaxscale_options.go:98-107`) and
  * its log-and-continue error policy (`gomaxscale.go:154-157`). The
  * default logs at WARN; embedders may swap the sink. Corrupt rows
  * still flow in-stream regardless, so no information is lost when the
  * sink is left alone.
  */
object CdcWarnings {
  @volatile var sink: (String, String) => Unit =
    (src, msg) => org.slf4j.LoggerFactory.getLogger("graft.cdc").warn(s"[$src] $msg")
  def emit(source: String, msg: String): Unit = sink(source, msg)
}

final class MaxScaleCdcMicroBatchStream(options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def opt(k: String): String = options.getOrElse(k,
    throw new IllegalArgumentException(s"maxscale-cdc: missing option '$k'"))

  private val database = opt("database")
  private val table = opt("table")
  val registry = new SchemaRegistry

  // Driver-side receiver, like Spark's own socket source: the TCP pump
  // fills `buffer`; micro-batches slice [start, end) out of it.
  private val buffer = mutable.ArrayBuffer.empty[MaxScaleCdc.EventRow]
  private var base = 0L // events trimmed after commit
  private val stopped = new AtomicBoolean(false)
  @volatile private var receiverError: Throwable = _

  // Backpressure parity with the reference's unbuffered channel
  // (`gomaxscale.go:25,160-162`): the buffer is BOUNDED; when full the
  // receiver blocks in `append`, which stops draining the socket and
  // pushes the pressure onto TCP flow control instead of growing driver
  // memory without bound under a stalled/slow query. Commits trim and
  // wake the receiver.
  private val maxBufferedEvents =
    options.getOrElse("maxBufferedEvents", "1000000").toLong

  private val client = new MaxScaleClient(
    host = opt("host"), port = opt("port").toInt,
    user = options.getOrElse("user", ""), password = options.getOrElse("password", ""),
    uuid = options.getOrElse("uuid", "XXX-YYY_YYY"),
    database = database, table = table,
    version = options.get("version").map(_.toInt),
    gtid = options.get("gtid"),
    connectTimeoutMs = options.getOrElse("connectTimeoutMs", "2000").toInt,
    readTimeoutMs = options.getOrElse("readTimeoutMs", "200").toInt,
    bufferSize = options.getOrElse("bufferSize", "4096").toInt,
    wireType = options.getOrElse("wireType", "JSON").toUpperCase)

  /** Client network config, exposed for option-passthrough tests. */
  private[cdc] def clientConfig: (Int, Int) = (client.connectTimeoutMs, client.bufferSize)

  /** Registered wire format, exposed for option-passthrough tests. */
  private[cdc] def clientWireType: String = client.wireType

  /** Blocking bounded append (see `maxBufferedEvents` above). */
  private def append(row: MaxScaleCdc.EventRow): Unit = buffer.synchronized {
    while (buffer.size >= maxBufferedEvents && !stopped.get) buffer.wait(100)
    if (!stopped.get) buffer += row
  }

  private val receiver = new Thread(() => {
    try {
      client.connect()
      var eof = false
      // schema version in effect at ingest time: stamped onto DML rows
      // so downstream projection can pick the right registry schema per
      // row even across in-band schema evolution (SURVEY.md §7.3)
      var currentVersion: java.lang.Integer =
        options.get("version").map(v => Int.box(v.toInt)).orNull
      while (!stopped.get && !eof) {
        val res = client.poll()
        eof = res.eof
        res.events.foreach {
          case e @ Right(d: DdlEvent) =>
            registry.register(d)
            currentVersion = Int.box(d.version)
            append(MaxScaleCdc.toRow(database, table, e))
          case e @ Right(_: DmlEvent) =>
            append(MaxScaleCdc.toRow(database, table, e)
              .copy(schemaVersion = currentVersion))
          case e @ Left(err) =>
            CdcWarnings.emit(s"$database.$table", s"decode: $err")
            append(MaxScaleCdc.toRow(database, table, e))
        }
        res.serverMessages.foreach { m =>
          CdcWarnings.emit(s"$database.$table", s"server: $m")
          append(MaxScaleCdc.toRow(database, table, Left(s"server: $m")))
        }
      }
    } catch {
      case _: InterruptedException if stopped.get => ()
      case t: Throwable => receiverError = t
    } finally client.close()
  }, s"maxscale-cdc-receiver-$database.$table")
  receiver.setDaemon(true)
  receiver.start()

  override def initialOffset(): Offset = CdcOffset(0L)

  override def latestOffset(): Offset = {
    if (receiverError != null) throw receiverError
    buffer.synchronized(CdcOffset(base + buffer.size))
  }

  // ---- admission control: `maxEventsPerTrigger` caps batch size, the
  // micro-batch analog of the reference's bounded read buffer (A5/§4.1)
  override def getDefaultReadLimit: ReadLimit =
    options.get("maxEventsPerTrigger").map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  // Trigger.AvailableNow: drain the server's current backlog, then
  // terminate — the batch-catchup mode. The wire has no backlog-end
  // marker, so "available now" is detected by the feed going idle (or
  // EOF): prepare blocks until the buffer is stable for `idleMs`.
  @volatile private var availableNowBound: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit = {
    val idleMs = options.getOrElse("availableNowIdleMs", "1000").toLong
    val deadline = System.currentTimeMillis() +
      options.getOrElse("availableNowMaxWaitMs", "15000").toLong
    var last = -1L
    var stableSince = System.currentTimeMillis()
    var done = false
    while (!done && System.currentTimeMillis() < deadline) {
      val size = buffer.synchronized(base + buffer.size)
      val now = System.currentTimeMillis()
      if (size != last) { last = size; stableSince = now }
      done = (size > 0 || !receiver.isAlive) && now - stableSince >= idleMs
      if (!done) Thread.sleep(50)
    }
    availableNowBound = buffer.synchronized(base + buffer.size)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    if (receiverError != null) throw receiverError
    val s = start.asInstanceOf[CdcOffset].index
    val avail0 = buffer.synchronized { rebaseIfBeyondLocked(s); base + buffer.size }
    val avail = if (availableNowBound >= 0) math.min(avail0, availableNowBound) else avail0
    limit match {
      case m: ReadMaxRows => CdcOffset(math.min(avail, s + m.maxRows))
      case _ => CdcOffset(avail)
    }
  }

  override def reportLatestOffset(): Offset =
    buffer.synchronized(CdcOffset(base + buffer.size))

  override def deserializeOffset(json: String): Offset = CdcOffset(json.toLong)

  /** Checkpoint restart: a committed index beyond everything this fresh
    * connection has buffered means the counter must continue from the
    * checkpoint. Rebase so numbering resumes there; the wire position is
    * governed by the configured GTID (DML events carry no per-event GTID
    * to resume finer — the same granularity as the reference's
    * WithGTID). Called with the buffer lock held.
    */
  private def rebaseIfBeyondLocked(start: Long): Unit =
    if (start > base + buffer.size) base = start

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset].index
    val e = end.asInstanceOf[CdcOffset].index
    val rows = buffer.synchronized {
      rebaseIfBeyondLocked(s)
      val lo = math.max(0, (s - base).toInt)
      val hi = math.max(lo, math.min(buffer.size, (e - base).toInt))
      buffer.slice(lo, hi).toArray
    }
    Array(CdcInputPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory = new CdcReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[CdcOffset].index
    buffer.synchronized {
      val drop = (e - base).toInt
      if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); base = e }
      buffer.notifyAll() // wake a receiver blocked on the full buffer
    }
  }

  override def stop(): Unit = {
    stopped.set(true)
    buffer.synchronized(buffer.notifyAll())
    receiver.interrupt()
  }
}

final case class CdcInputPartition(rows: Array[MaxScaleCdc.EventRow]) extends InputPartition

final class CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[CdcInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val r = rows(i)
        def s(x: String) = if (x == null) null else UTF8String.fromString(x)
        InternalRow(s(r.kind), s(r.database), s(r.table), s(r.op),
          r.domain, r.serverId, r.sequence, r.eventNumber, r.tsMicros,
          s(r.gtid), r.schemaVersion, s(r.payload))
      }
      override def close(): Unit = ()
    }
  }
}
