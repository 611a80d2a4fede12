package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass table profiling — the data-card summary a pipeline records
  * before training on a new snapshot: per column, non-null count, null
  * count, exact distinct count, and min/max. All columns are profiled in
  * a SINGLE aggregation (the multi-distinct Expand strategy: one scan,
  * one exchange), then unpivoted to one row per column — never one job
  * per column, which is the difference between 1 scan and |cols| scans
  * of a 100 TB table.
  *
  * Numeric min/max emit as DOUBLE, string min/max as STRING (cross-engine
  * value rendering of doubles differs, so the two families keep separate
  * typed columns instead of a lossy common cast).
  */
object Profiler {

  /** Output: (column, n_nonnull, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str) — one row per requested column, numeric columns
    * fill `*_num`, string columns fill `*_str`.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach { c =>
      require(types.contains(c), s"no such column: $c")
      require(types(c).isInstanceOf[NumericType] || types(c) == StringType,
        s"profile supports numeric and string columns, got $c: ${types(c)}")
    }
    val total = count(lit(1))
    val aggs = cols.flatMap { c =>
      val isNum = types(c).isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double")).as(s"_minn_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double")).as(s"_maxn_$c"),
        (if (isNum) lit(null).cast("string") else min(col(c))).as(s"_mins_$c"),
        (if (isNum) lit(null).cast("string") else max(col(c))).as(s"_maxs_$c"))
    }
    val one = df.agg(total.as("_n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"_nn_$c").as("n_nonnull"),
        (col("_n") - col(s"_nn_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_minn_$c").as("min_num"), col(s"_maxn_$c").as("max_num"),
        col(s"_mins_$c").as("min_str"), col(s"_maxs_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** DuckDB mirror of [[profile]] — one UNION ALL branch per column over
    * the same min/max/distinct definitions. */
  def oracleSql(table: String, numericCols: Seq[String], stringCols: Seq[String]): String = {
    val numSel = numericCols.map { c =>
      s"""SELECT '$c' AS "column", count($c) AS n_nonnull,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM $table""".stripMargin
    }
    val strSel = stringCols.map { c =>
      s"""SELECT '$c' AS "column", count($c) AS n_nonnull,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  MIN($c) AS min_str, MAX($c) AS max_str
         |FROM $table""".stripMargin
    }
    (numSel ++ strSel).mkString("\nUNION ALL\n")
  }
}
