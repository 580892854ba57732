package org.apache.spark

/** Test-only access to the listener bus's deterministic drain.
  * Suites that count job/task events (PreparedSuite's repeat-build
  * silence pin) used fixed Thread.sleep drains, which flake under CI
  * load when a late-delivered event from a warm loop lands inside the
  * measured window (r14 advice). `waitUntilEmpty` blocks until every
  * queued event has been dispatched — exact, no timing guess. The
  * method is `private[spark]`, hence this one-object shim package. */
object GraftTestHooks {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
