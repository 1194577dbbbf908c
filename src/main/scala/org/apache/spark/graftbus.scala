package org.apache.spark

/** Listener-bus drain for deterministic metric attribution. Task-end
  * events arrive asynchronously; a per-query shuffle-byte counter read
  * without draining would leak one query's tail into the next. The bus
  * handle is private[spark], so this one-liner lives in the
  * org.apache.spark package — same pattern as sql/graftbridge. */
object graftbus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
