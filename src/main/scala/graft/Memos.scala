package graft

/** The ONE list of session-memo clear hooks. Harness teardown calls it
  * so no entry point can leak pinned frames past its session, and
  * Bench's cleared-memo pass (GRAFT_CLEARED_PASS=1) calls it BEFORE
  * each graded query so every number in bench_cleared.json is an
  * uncached BUILD — 58/289 graded warms are memo readouts, and without
  * this lane their build paths were gated only by the per-family
  * isolated cold column (round-16 brief #2 / round-15 advice #1).
  *
  * Completeness is test-enforced, not conventional: CacheHygieneSpec
  * populates at least one memo per module and asserts clearAll empties
  * EVERY declared TrieMap field (reflective scan), so a module added
  * here late — or a hook that misses a field — is a test failure, not
  * a silently-warm "cleared" pass. */
object Memos {
  def clearAll(): Unit = {
    queries.Generated.clearCaches()
    clearAllExceptGenerated()
  }

  /** The cleared-lane clear (Bench GRAFT_CLEARED_PASS, round-19
    * brief #4): everything clearAll clears EXCEPT the shared
    * armed-deployment triple (see Generated.clearCachesKeeping-
    * ArmedDeployment) — g09/g10/g21 are three readouts of ONE Derby
    * deployment, and the lane's convention for pass-scoped shared
    * state (its scratch artifact dir is likewise not wiped between
    * queries) is that the build cost lands in the first consumer in
    * sorted order. Harness teardown still uses clearAll, so nothing
    * survives a session. */
  def clearAllKeepingSharedDeployments(): Unit = {
    queries.Generated.clearCachesKeepingArmedDeployment()
    clearAllExceptGenerated()
  }

  private def clearAllExceptGenerated(): Unit = {
    queries.TextOps.clearCaches()
    queries.StreamOps.clearCaches()
    queries.EventOps.clearCaches()
    queries.Relational2.clearObservedCache()
    queries.VectorOps.clearCaches()
    queries.GraphOps.clearCaches()
    operators.CopyOnWrite.clearCaches()
    operators.MergeOnRead.clearCaches()
    multimodal.Multimodal.clearCaches()
    queries.MediaOps.clearCaches()
  }
}
