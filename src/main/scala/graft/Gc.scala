package graft

/** Operational entry point for the artifact-store GC: deletes artifact
  * dirs whose source fixtures changed or vanished (plus orphaned tmp
  * dirs) and prints what it removed. Run only when no build is active:
  * `sbt "runMain graft.Gc"`. Needs no SparkSession — the registry and
  * key recomputation are pure file metadata. */
object Gc {
  def main(args: Array[String]): Unit = {
    val deleted = sources.ArtifactStore.gc()
    if (deleted.isEmpty) println("[gc] nothing stale")
    else deleted.foreach(p => println(s"[gc] removed $p"))
  }
}
