package graft.core

import graft.SparkSpecBase

/** SURVEY §2.1 S2's `format("jdbc")` alternative source: closed-loop
  * write→read through embedded Derby (the JDBC driver that ships with the
  * Spark distribution), proving the registry's non-file ingestion surface
  * round-trips types and values.
  */
class JdbcSourceSpec extends SparkSpecBase {
  import spark.implicits._

  test("jdbc sink + source round-trip values and types") {
    val url = "jdbc:derby:memory:graft_spec;create=true"
    val df = Seq((1L, "ALGERIA", 0L), (2L, "BRAZIL", 1L), (3L, "CANADA", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    Tables.jdbcWrite(df, url, "nation_spec")
    val back = Tables.jdbcTable(spark, url, "nation_spec")
    assert(back.schema.fieldNames.toSet == Set("n_nationkey", "n_name", "n_regionkey"))
    val rows = back.collect().map(r =>
      (r.getLong(r.fieldIndex("n_nationkey")), r.getString(r.fieldIndex("n_name")),
        r.getLong(r.fieldIndex("n_regionkey")))).toSet
    assert(rows == Set((1L, "ALGERIA", 0L), (2L, "BRAZIL", 1L), (3L, "CANADA", 1L)))
  }

  test("jdbc overwrite replaces, not appends") {
    val url = "jdbc:derby:memory:graft_spec2;create=true"
    val df1 = Seq((1L, "A")).toDF("k", "v")
    val df2 = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    Tables.jdbcWrite(df1, url, "t_spec")
    Tables.jdbcWrite(df2, url, "t_spec")
    assert(Tables.jdbcTable(spark, url, "t_spec").count() == 2L)
  }
}
