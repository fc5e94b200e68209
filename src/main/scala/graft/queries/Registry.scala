package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One declared capability query: the Spark implementation plus (when the
 * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL run
 * by the correctness driver on the same parquet tables. Column names and
 * row order match exactly between the two.
 */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def defs: Map[String, QueryDef]
}
