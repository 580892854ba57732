package graft

/** At-most-once memoizer for fit-once artifacts: checkpoint paths,
  * trained-index locations, gate counts, scoped sessions.
  *
  * `TrieMap.getOrElseUpdate` is not atomic for the by-name builder —
  * two concurrent first callers both run the full fill (a superstep
  * loop, a k-means train, a bucketed-table write) and one result is
  * orphaned in scratch, which is exactly the duplicated cost the cache
  * exists to avoid. `ConcurrentHashMap.computeIfAbsent` runs the fill
  * exactly once and blocks racing callers until it completes.
  *
  * Fills may run Spark jobs and may fill OTHER FitOnce instances
  * (e.g. the component checkpoint filling the pair-list checkpoint);
  * they must never re-enter the SAME instance — nesting across
  * instances only ever descends the build DAG, so no lock cycle is
  * possible.
  */
final class FitOnce[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()
  def apply(key: K)(fill: => V): V = m.computeIfAbsent(key, _ => fill)
}
