package graft

import org.apache.spark.sql.SparkSession

/** Engine registration: exposes the custom Catalyst expressions to
  * SQL so `spark.sql("SELECT simhash64(...)")` works alongside the
  * Column API. One call per session.
  */
object Graft {
  def register(spark: SparkSession): SparkSession = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => expressions.SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("float_dot",
      exprs => expressions.FloatDot(exprs.head, exprs(1)), "scala_udf")
    spark
  }
}
