package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** One corpus entry: a Spark-side query plus (optionally) the ANSI SQL the
  * DuckDB oracle runs over the same parquet tables. Column names/aliases
  * must match between the two — the driver's compare sorts columns by name.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Query written in the dialect subset both Spark SQL and DuckDB parse:
    * one string serves as both the Spark plan and the oracle.
    */
  def sql(name: String, text: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(text) }, Some(text))

  /** Spark-side SQL differs from the DuckDB oracle SQL (dialect drift). */
  def sql2(name: String, sparkText: String, duckText: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sparkText) }, Some(duckText))

  /** DataFrame/Dataset-API query with a DuckDB oracle. */
  def df(name: String, duckText: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(duckText))

  /** Not SQL-expressible in DuckDB — driver records a rows-only check. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
