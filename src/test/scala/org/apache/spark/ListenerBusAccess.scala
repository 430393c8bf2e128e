package org.apache.spark

/** Test-only accessor: flush the (private[spark]) listener bus so a
  * spec can assert synchronously on listener-observed state. */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
