package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of declared queries plus (where SQL-expressible) their
  * DuckDB oracle SQL. SparkEntry aggregates all modules; the driver runs
  * each query via Verify and hash-compares against the oracle.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  /** DuckDB SQL per query key; omit a key for rows-only checks. */
  def oracles: Map[String, String]
}
