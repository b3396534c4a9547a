package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2 operator inventory, one runnable query per operator,
  * evaluated over the driver's testdata tables and cross-checked against
  * DuckDB via [[Verify]]. Filled in incrementally; keys stable. */
object Queries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  def oracle: Map[String, String] = Map.empty
}
