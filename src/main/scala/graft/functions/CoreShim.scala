package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` core surface (lives under the
  * org.apache.spark package namespace solely to satisfy that access),
  * mirroring sql.graftshim.SqlShim for the SQL side. */
object CoreShim {
  /** Deterministically drain the async SparkListener bus: benchmark
    * stage-metric windows bounded by Thread.sleep mis-attribute stages
    * when the bus lags on a loaded box. */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
