package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 streaming source speaking the gun wire protocol — the
  * reference's transport + receive loop (A22/A20: gun/websocket.go:125-161,
  * gun/gun.go:236-259) as a Spark `MicroBatchStream`.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("gun")
  *     .option("conn", "<registered InMemoryPeerConn name>")  // or
  *     .option("url", "ws://host:port/gun")
  *     .load()                                 // → one STRING column `frame`
  * }}}
  * Each output row is ONE message JSON (batch frames are already split via
  * the double-encoded-array rule, gun/websocket.go:141-159); pipe through
  * [[GunWire.framesToCells]] → `HamStream.updates` for the standing ingest
  * dataflow (SURVEY §3.3).
  *
  * DAM handshake messages are handled INSIDE the source (they are
  * transport control, not data): a `dam:"?"` without pid is answered with
  * our peer id (gun/gun.go:309-325) and consumed; a reply with pid is
  * recorded and consumed.
  *
  * Delivery semantics: frames buffer on the driver between offsets;
  * `commit` drops delivered messages. Like the reference (a live socket
  * with no journal, gun/gun.go:236-259), this is at-most-once across
  * restarts — durability belongs to the merged store the stream feeds.
  */
class GunSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gun"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GunSourceProvider.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GunSourceTable(properties)
}

object GunSourceProvider {
  val schema: StructType = StructType(Seq(StructField("frame", StringType)))
}

final class GunSourceTable(properties: util.Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "gun-wire-source"
  override def schema(): StructType = GunSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GunSourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GunMicroBatchStream(options)
      }
    }
}

/** Offset = count of messages ever received on this source instance. */
final case class GunOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class GunMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  // A conn looked up by name is BORROWED from the application (which may
  // keep using it after the query stops); only a conn this source dialed
  // itself is closed on stop().
  private val (conn: PeerConn, ownsConn: Boolean) = {
    val byName = Option(options.get("conn")).map { key =>
      InMemoryPeerConn.lookup(key).getOrElse(
        throw new IllegalArgumentException(s"no registered conn named '$key'")) -> false
    }
    byName.orElse(Option(options.get("url")).map(WebSocketPeerConn.dial(_) -> true))
      .getOrElse(throw new IllegalArgumentException(
        "gun source requires option 'conn' (registered name) or 'url'"))
  }
  private val myPid: String =
    Option(options.get("pid")).getOrElse(graft.core.SoulGen())

  // driver-side message buffer: (firstOffsetInBuffer, messages)
  private var base: Long = 0L
  private val buffered = new scala.collection.mutable.ArrayBuffer[String]()

  /** Drain the conn; answer/record DAM control messages, buffer the rest. */
  private def poll(): Unit = synchronized {
    conn.drain().foreach { frame =>
      WireCodec.splitFrame(frame).foreach { msg =>
        val env = WireCodec.decodeEnvelope(msg)
        env.dam match {
          case Some(_) if env.pid.isEmpty => conn.send(WireCodec.damReply(myPid))
          case Some(_)                    => () // peer's id recorded implicitly; control-only
          case None                       => buffered += msg
        }
      }
    }
  }

  override def initialOffset(): Offset = GunOffset(0L)

  /** On checkpoint restart the driver buffer is empty but Spark replays
    * offsets from its log (e.g. start=100): anchor `base` at the highest
    * restored offset so NEW messages map to offsets beyond the
    * checkpointed position. Without this, post-restart messages landed at
    * offsets 0..n and were silently swallowed until the count caught up
    * with the old offset. The replayed in-flight range itself still yields
    * an empty batch (`planInputPartitions` clamps below `base`) — the
    * documented at-most-once loss for messages in flight at the crash, not
    * an ongoing loss of new traffic. Only bumps while the buffer is empty:
    * once polling has buffered frames, `base` is already anchored.
    */
  override def deserializeOffset(json: String): Offset = synchronized {
    val n = json.toLong
    if (buffered.isEmpty && n > base) base = n
    GunOffset(n)
  }

  override def latestOffset(): Offset = synchronized {
    poll()
    GunOffset(base + buffered.length)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[GunOffset].n
      val e = end.asInstanceOf[GunOffset].n
      // Clamp below base: a replayed pre-restart range has no buffered
      // data (at-most-once across restarts) and must not mis-slice.
      val lo = math.max(0L, s - base).toInt
      val hi = math.max(0L, e - base).toInt
      val msgs = buffered.slice(lo, hi).toArray
      if (msgs.isEmpty) Array.empty
      else Array(GunFramesPartition(msgs))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GunFrameReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[GunOffset].n
    val drop = (e - base).toInt
    if (drop > 0) { buffered.remove(0, math.min(drop, buffered.length)); base = e }
  }

  override def stop(): Unit = if (ownsConn) conn.close()
}

final case class GunFramesPartition(frames: Array[String]) extends InputPartition

final class GunFrameReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val frames = partition.asInstanceOf[GunFramesPartition].frames
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < frames.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(frames(i))))
      override def close(): Unit = ()
    }
  }
}
