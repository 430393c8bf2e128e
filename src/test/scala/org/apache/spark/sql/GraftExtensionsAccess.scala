package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge to the private[sql] registration step the session
  * builder runs when `spark.sql.extensions` is set — lets specs prove
  * the injector end-to-end without tearing down the shared session. */
object GraftExtensionsAccess {
  def registerFunctions(ext: SparkSessionExtensions,
      reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
