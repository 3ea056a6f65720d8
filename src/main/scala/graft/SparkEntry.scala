package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each operator module contributes a `queries` map (Spark plan) and an
  * `oracle` map (equivalent DuckDB SQL); this object is just the union.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ StarSchema.queries ++ Temporal.queries ++ TextOps.queries ++
      Dedup.queries ++ Ann.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ StarSchema.oracle ++ Temporal.oracle ++ TextOps.oracle ++
      Dedup.oracle ++ Ann.oracle
}
