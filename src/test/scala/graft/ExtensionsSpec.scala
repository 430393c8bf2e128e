package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** The spark.sql.extensions deployment path: GraftExtensions must
  * inject every native function so a cluster configured with
  * `spark.sql.extensions=graft.GraftExtensions` resolves them with no
  * per-session register() call. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects every native function into a registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftExtensionsAccess
      .registerFunctions(ext, FunctionRegistry.builtin.clone())
    val expected = Seq("simhash64", "float_dot", "sorted_intersect_count",
      "shingle_hashes", "minhash_sig", "lsh_codes", "py_json",
      "full_change_rows", "kmv_smallest", "token_md5_60", "md5_shingles32",
      "block_mean_hash60", "frame_sums")
    expected.foreach { name =>
      assert(reg.functionExists(FunctionIdentifier(name)),
        s"$name not registered via extensions")
    }
  }

  test("an injected builder produces a working expression") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftExtensionsAccess
      .registerFunctions(ext, FunctionRegistry.builtin.clone())
    val arr = Literal.create(Array(1.0f, 2.0f, 3.0f), ArrayType(FloatType))
    val e = reg.lookupFunction(FunctionIdentifier("float_dot"), Seq(arr, arr))
    assert(e.eval() == (1.0 + 4.0 + 9.0))
    // and via SQL on the session-level registry (Graft.register parity)
    Graft.register(spark)
    val viaSql = spark.sql(
      "SELECT float_dot(array(cast(1 as float), cast(2 as float))," +
        " array(cast(3 as float), cast(4 as float))) AS d")
      .collect().head.getDouble(0)
    assert(viaSql == 11.0)
  }

  test("registry parity: extensions and register() expose the same names") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val viaExt = org.apache.spark.sql.GraftExtensionsAccess
      .registerFunctions(ext, FunctionRegistry.builtin.clone())
    Graft.register(spark)
    Graft.functionDefs.map(_._1).foreach { name =>
      assert(viaExt.functionExists(FunctionIdentifier(name)), s"ext: $name")
      assert(spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(name)), s"session: $name")
    }
  }
}
