package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine registration: exposes the custom Catalyst expressions to
  * SQL so `spark.sql("SELECT simhash64(...)")` works alongside the
  * Column API. Two entry points over one definition list:
  *
  *  - [[Graft.register]]: imperative, one call on an existing session
  *    (temp functions in that session only);
  *  - [[GraftExtensions]]: the declarative deployment path —
  *    `--conf spark.sql.extensions=graft.GraftExtensions` registers
  *    every function at session build on every JVM of a cluster, no
  *    code change in the user's job. This is how a Spark library
  *    ships its surface.
  */
object Graft {

  /** Every native function: (name, builder from resolved children).
    * Int-literal arity params are resolved at registration call sites:
    * shingle_hashes(text, k), minhash_sig(set, numPerm),
    * lsh_codes(vec, numTables, bitsPerTable), kmv_smallest(h, k). */
  private[graft] val functionDefs
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (exprs => expressions.SimHash64(exprs.head)),
    "float_dot" -> (exprs => expressions.FloatDot(exprs.head, exprs(1))),
    "sorted_intersect_count" ->
      (exprs => expressions.SortedIntersectCount(exprs.head, exprs(1))),
    "shingle_hashes" -> (exprs => expressions.ShingleHashes(exprs.head,
      intLit(exprs(1), "shingle_hashes k"))),
    "minhash_sig" -> (exprs => expressions.MinHashSig(exprs.head,
      intLit(exprs(1), "minhash_sig numPerm"))),
    "lsh_codes" -> (exprs => expressions.LshCodes(exprs.head,
      intLit(exprs(1), "lsh_codes numTables"),
      intLit(exprs(2), "lsh_codes bitsPerTable"))),
    "token_md5_60" -> (exprs => expressions.TokenMd5(exprs.head)),
    "md5_shingles32" -> (exprs => expressions.Md5Shingles(exprs.head,
      intLit(exprs(1), "md5_shingles32 k"))),
    "winnow_fps32" -> (exprs => expressions.WinnowFps(exprs.head,
      intLit(exprs(1), "winnow_fps32 k"),
      intLit(exprs(2), "winnow_fps32 w"))),
    "block_mean_hash60" ->
      (exprs => expressions.BlockMeanHash60(exprs.head)),
    "frame_sums" -> (exprs => expressions.FrameSums(exprs.head,
      intLit(exprs(1), "frame_sums frameLen"))),
    "py_json" -> (exprs => expressions.PyJson(exprs.head)),
    "full_change_rows" -> (exprs => expressions.FullChangeRows(exprs.head)),
    "bloom_might_contain" ->
      (exprs => expressions.BloomMightContain(exprs.head, exprs(1))),
    // aggregates: the analyzer wraps a bare AggregateFunction builder
    "kmv_smallest" -> (exprs => expressions.KmvSmallest(exprs.head,
      intLit(exprs(1), "kmv_smallest k"))),
    "bloom_agg" -> (exprs => expressions.BloomAgg(exprs.head,
      intLit(exprs(1), "bloom_agg mBits"),
      intLit(exprs(2), "bloom_agg numHash"))),
    "space_saving_topk" -> (exprs => expressions.SpaceSavingTopK(exprs.head,
      intLit(exprs(1), "space_saving_topk capacity")))
  )

  def register(spark: SparkSession): SparkSession = {
    val reg = spark.sessionState.functionRegistry
    functionDefs.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    spark
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}

/** `spark.sql.extensions`-loadable injector (must be a zero-arg class,
  * not an object, per the extensions contract). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    Graft.functionDefs.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
