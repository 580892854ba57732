package org.apache.spark

/** Main-scope access to the listener bus's deterministic drain (the
  * twin of the test-scope GraftTestHooks shim): graft.Verify sums
  * spill bytes through a SparkListener to give the starved gate
  * POSITIVE evidence that the spill paths executed, and task-end
  * events are delivered asynchronously — without a drain the final
  * tally can miss the last tasks' metrics. `waitUntilEmpty` is
  * `private[spark]`, hence this one-object shim package. */
object GraftSparkHooks {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
