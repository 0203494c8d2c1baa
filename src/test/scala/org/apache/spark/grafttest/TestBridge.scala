package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` members PlanSpec needs for
  * deterministic listener assertions (the conventional test-shim
  * placement — same pattern as Spark's own test utilities).
  */
object TestBridge {

  /** Block until every event posted to the shared listener bus has been
    * delivered — QueryExecutionListener events ride this bus, so after
    * this returns a listener registered before an action has seen every
    * plan that action executed (no busy-wait, no flaky deadline).
    */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
