package graft.sources

import java.math.BigInteger
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow

/** Custom DataSource V2 SINK — the write half of the connector story
  * ([[SynthSource]] is the read half): a fingerprinting sink that
  * aggregates the table-checksum triple through the DSv2 two-phase
  * commit protocol. Each `DataWriter` folds its partition's pre-hashed
  * rows into `(count, exact sum, xor)` — O(1) state, nothing buffered —
  * and ships the triple as its `WriterCommitMessage`; the driver-side
  * `commit` merges the messages with the SAME commutative algebra. The
  * committed fingerprint must therefore equal `TableChecksum.checksum`
  * computed as a query — and the declared `s18_checksum_sink` pins that
  * against the identical DuckDB oracle as `dq_table_checksum`, making
  * the WRITE path's distributed commit cross-engine-checked, not just
  * exercised.
  *
  * Input contract: one LONG column `_h` (the per-row
  * [[graft.ops.TableChecksum.rowHash]]) — hashing stays in Catalyst
  * (codegen'd); the sink only aggregates. Results land in a
  * session-wide registry keyed by the `key` option (a real deployment
  * would commit to a manifest/metastore; the registry stands in for
  * that metadata store).
  *
  * Abort semantics: task writers hold only their local triple, so a
  * failed/speculative task simply drops its message — the protocol's
  * exactly-once aggregation comes from Spark committing ONE message per
  * partition.
  */
class ChecksumSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChecksumSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChecksumSinkTable(properties.getOrDefault("key", "default"))
}

object ChecksumSink {
  val schema: StructType = StructType(Seq(StructField("_h", LongType, nullable = false)))

  /** Committed fingerprints by `key` option: (n_rows, hash_sum, hash_xor). */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, BigInteger, Long)]()

  def result(key: String): Option[(Long, BigInteger, Long)] = Option(registry.get(key))
  private[sources] def put(key: String, v: (Long, BigInteger, Long)): Unit =
    registry.put(key, v)
}

private class ChecksumSinkTable(key: String) extends Table with SupportsWrite {
  override def name(): String = s"checksum_sink($key)"
  override def schema(): StructType = ChecksumSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("_h", LongType)),
      s"ChecksumSink expects a single LONG column _h, got ${info.schema().simpleString}")
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ChecksumBatchWrite(key)
      }
    }
  }
}

private case class ChecksumMsg(cnt: Long, sum: BigInteger, xor: Long)
  extends WriterCommitMessage

private class ChecksumBatchWrite(key: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // driver-side merge: the same commutative algebra as the writers'
    var cnt = 0L
    var sum = BigInteger.ZERO
    var xor = 0L
    messages.foreach { case ChecksumMsg(c, s, x) =>
      cnt += c; sum = sum.add(s); xor ^= x
    }
    ChecksumSink.put(key, (cnt, sum, xor))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class ChecksumWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var cnt = 0L
      private var sum = BigInteger.ZERO
      private var xor = 0L
      override def write(record: InternalRow): Unit = {
        val h = record.getLong(0)
        cnt += 1
        sum = sum.add(BigInteger.valueOf(h))
        xor ^= h
      }
      override def commit(): WriterCommitMessage = ChecksumMsg(cnt, sum, xor)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
