package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** The one `private[spark]` reach-in the bench needs: block-update
  * events post to an ASYNC listener queue, so per-query storage/
  * eviction counters snapshotted right after a query returns would
  * race the tail of its own events (and misattribute them to the next
  * rep). `waitUntilEmpty` drains the queues; it runs OUTSIDE the
  * timers, so the wait costs the measurement nothing.
  */
object Bus {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
