package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Order-invariant table content fingerprint — "are these two copies of
  * the table the same data" answered with ONE scan and a scalar, never a
  * row-level compare. The primitive behind replication validation, CDC
  * end-to-end checks, and cross-engine migration sign-off (the use here:
  * the DuckDB oracle recomputes the same fingerprint from the same
  * parquet, so engine-equality IS the check).
  *
  * Each row renders to a canonical string (explicit casts, '|' joined,
  * NULL → a sentinel that cannot collide with a real rendering), hashes
  * through the portable 60-bit md5 hash, and the row hashes combine with
  * COMMUTATIVE aggregates only — exact decimal SUM and bitwise XOR — so
  * the fingerprint is independent of row order, partitioning, and
  * parallelism by construction. Partial combines happen map-side;
  * nothing but three scalars crosses the wire per partition.
  *
  * Detection: any single-row change moves the sum (mod 2^60 arithmetic
  * never saturates inside decimal(38,0) below ~10^19 rows); XOR catches
  * the sum's blind spot of offsetting ± edits; the count pins
  * cardinality. Collisions need an adversary, not bad luck (60-bit
  * birthday at ~10^9 rows is 'real but engineered-against' — this is an
  * integrity check, not a security boundary).
  */
object TableChecksum {

  /** Canonical row rendering: each column cast to string with a
    * type-stable format, nulls replaced by a reserved sentinel, joined
    * with '|'. Caller chooses `cols` with portable renderings (ints,
    * decimals, dates, strings — NOT raw doubles, whose text form is
    * engine-specific; cast doubles to a fixed-scale decimal first).
    */
  private def canonical(cols: Seq[Column]): Column =
    concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit("\u0001NULL"))): _*)

  /** The per-row 60-bit content hash on its own — for consumers that
    * aggregate the fingerprint elsewhere (e.g. the ChecksumSink write
    * path, whose commit protocol must reproduce [[checksum]] exactly).
    */
  def rowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "rowHash needs at least one column")
    TextOps.md5Hash60(canonical(cols))
  }

  /** One row: (n_rows, hash_sum decimal(38,0), hash_xor). */
  def checksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "checksum needs at least one column")
    val h = TextOps.md5Hash60(canonical(cols))
    // hash_sum exceeds 63 bits (n × 2⁶⁰), so it is computed in exact
    // decimal and RENDERED AS A STRING: a decimal output column reads
    // back differently across consumers (pyarrow Decimal vs DuckDB
    // float64), while the digit string is the same fingerprint everywhere
    df.select(h.as("_h")).agg(
      count(lit(1)).as("n_rows"),
      sum(col("_h").cast("decimal(38,0)")).cast("string").as("hash_sum"),
      bit_xor(col("_h")).as("hash_xor"))
  }

  /** DuckDB mirror of [[checksum]]; `colSqls` must render each column
    * exactly as the Spark side's casts do. */
  def checksumOracleSql(table: String, colSqls: Seq[String]): String = {
    val canon = colSqls
      .map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1) || 'NULL')")
      .mkString("concat_ws('|', ", ", ", ")")
    s"""WITH h AS (
       |  SELECT CAST(concat('0x', substr(md5($canon), 1, 15)) AS BIGINT) AS h
       |  FROM $table
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(CAST(SUM(h) AS DECIMAL(38,0)) AS VARCHAR) AS hash_sum,
       |       bit_xor(h) AS hash_xor
       |FROM h""".stripMargin
  }
}
