package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`, so measurement mains
  * that read listener-accumulated counters (graft.tools.LadderProbe's
  * task-result-bytes sum) need an accessor compiled inside the
  * `org.apache.spark` package tree to DRAIN the async bus before reading
  * — a fixed sleep is a race on a loaded machine (round-12 ADVICE). Same
  * pattern as sql.graftshim.ColumnShim; no Spark internals modified. */
object ListenerShim {
  /** Block until every queued listener event has been delivered. */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
