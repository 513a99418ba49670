package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in [[graft.Queries]]; this object adapts it
  * to the driver's (queries, oracleSql) shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the multi-way star join + aggregate (the reference engine's core
    * name-intersection join, `dpl/processor/engine.py:108-109`). */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q02_region_revenue").impl(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (name, q) => name -> q.impl }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query has one (no rows-only checks). */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
