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
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      exprs => expressions.SortedIntersectCount(exprs.head, exprs(1)),
      "scala_udf")
    // int-literal arity params resolved at registration call sites:
    // shingle_hashes(text, k), minhash_sig(set, numPerm),
    // lsh_codes(vec, numTables, bitsPerTable)
    reg.createOrReplaceTempFunction("shingle_hashes",
      exprs => expressions.ShingleHashes(exprs.head,
        intLit(exprs(1), "shingle_hashes k")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => expressions.MinHashSig(exprs.head,
        intLit(exprs(1), "minhash_sig numPerm")), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_codes",
      exprs => expressions.LshCodes(exprs.head,
        intLit(exprs(1), "lsh_codes numTables"),
        intLit(exprs(2), "lsh_codes bitsPerTable")), "scala_udf")
    reg.createOrReplaceTempFunction("py_json",
      exprs => expressions.PyJson(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("full_change_rows",
      exprs => expressions.FullChangeRows(exprs.head), "scala_udf")
    // aggregate: the analyzer wraps a bare AggregateFunction builder
    reg.createOrReplaceTempFunction("kmv_smallest",
      exprs => expressions.KmvSmallest(exprs.head,
        intLit(exprs(1), "kmv_smallest k")), "scala_udf")
    spark
  }

  private def intLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
