package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow

/** Custom DataSource V2 connector: a deterministic synthetic-corpus
  * generator (`spark.read.format("graft.sources.SynthSource")`) — the
  * Spark-native extension point for adding a SOURCE, demonstrated
  * end-to-end: `TableProvider` → `ScanBuilder` with COLUMN PRUNING and
  * PREDICATE PUSHDOWN (id-range filters are consumed by the source and
  * shrink the generated splits — `.explain` shows `PushedFilters` and the
  * scan does strictly less work) → parallel `InputPartition` splits →
  * per-partition readers. No files, no shuffle: rows materialize
  * executor-side from the split bounds.
  *
  * Determinism contract: every generated cell derives from the row id
  * through the repo's portable md5 primitive (the same rendering as
  * `TextOps.md5Hash60`), so the whole table — any split count, any
  * pushed range — is exactly reproducible in DuckDB from `range()` +
  * `md5()`. That makes a CUSTOM SOURCE oracle-checkable, not just
  * spec-trusted.
  *
  * Options: `rows` (total ids, default 100000), `parts` (splits,
  * default 8), `salt` (hash salt, default ":synth").
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("parts", "8").toInt,
      properties.getOrDefault("salt", ":synth"))
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** The portable 60-bit md5 permille — byte-identical to
    * `TextOps.md5Hash60(concat(id, salt)) % 1000` and to the DuckDB
    * rendering `CAST('0x' || substr(md5(id || salt), 1, 15) AS BIGINT) % 1000`.
    */
  def permille(id: Long, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id$salt".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000L
  }
}

private class SynthTable(rows: Long, parts: Int, salt: String)
  extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts, salt)
}

private class SynthScanBuilder(rows: Long, parts: Int, salt: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SynthSource.schema
  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // id-range predicates are CONSUMED (they shrink the generated splits);
  // everything else stays with Spark
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, keep) = filters.partition {
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Integer) => true
      case _ => false
    }
    take.foreach {
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue)
      case _ =>
    }
    pushed = take
    keep
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SynthScan(lo, hi, parts, salt, required)
}

private case class SynthSplit(start: Long, end: Long) extends InputPartition

private class SynthScan(lo: Long, hi: Long, parts: Int, salt: String,
                        required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the STREAMING face of the same generator: offsets are id positions,
  // each micro-batch materializes one [start, end) slice through the
  // identical reader — the custom-source trilogy's third member
  // (batch read / batch write / micro-batch stream)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, parts, salt, required)
  // surfaces the consumed range in explain output — the DSv2 equivalent
  // of a file scan's PushedFilters line
  override def description(): String =
    s"SynthScan PushedRange: [$lo, $hi) columns: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0L) return Array.empty
    val per = math.max(1L, (n + parts - 1) / parts)
    (lo until hi by per).map(s => SynthSplit(s, math.min(s + per, hi))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(salt, required.fieldNames)
}

private case class SynthOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

private class SynthMicroBatchStream(lo: Long, hi: Long, parts: Int,
                                    salt: String, required: StructType)
  extends MicroBatchStream {
  override def initialOffset(): Offset = SynthOffset(lo)
  override def latestOffset(): Offset = SynthOffset(hi)
  override def deserializeOffset(json: String): Offset = SynthOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].v
    val e = end.asInstanceOf[SynthOffset].v
    val n = math.max(0L, e - s)
    if (n == 0L) return Array.empty
    val per = math.max(1L, (n + parts - 1) / parts)
    (s until e by per).map(x => SynthSplit(x, math.min(x + per, e))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(salt, required.fieldNames)
}

private class SynthReaderFactory(salt: String, cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[SynthSplit]
    new PartitionReader[InternalRow] {
      private var cur = s.start - 1
      override def next(): Boolean = { cur += 1; cur < s.end }
      override def get(): InternalRow = {
        // columns materialize lazily per required field — a pruned scan
        // never computes the hash for an unread column. The `: Any`
        // ascription matters: without it Scala unifies the Long and
        // Double branches by NUMERIC WIDENING and every column silently
        // becomes Double (CCE at read time).
        val values: IndexedSeq[Any] = cols.toIndexedSeq.map[Any] {
          case "id" => cur
          case "bucket" => SynthSource.permille(cur, salt)
          case "score" => SynthSource.permille(cur, salt).toDouble / 1000.0
        }
        InternalRow.fromSeq(values)
      }
      override def close(): Unit = ()
    }
  }
}
