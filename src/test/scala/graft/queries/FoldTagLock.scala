package graft.queries

/** Shared derivation for the artifact FOLD-SHAPE tag locks (round-15
  * advice, s31; extended to s29): a cross-run artifact persists a
  * fold's OUTPUT, so its key must change whenever the fold's source
  * changes — for folds with no scalar parameter to key on (the
  * capped_adj2/CapA route), the tag is the sha256 (first 8 hex) of the
  * defs the state derives from. Each spec recomputes the tag here and
  * fails — printing the new value to paste — the moment a derivation
  * def is edited without bumping the constant, so an edit can never
  * silently reuse a stale persisted state. */
object FoldTagLock {

  /** The module-level def body starting at `sig`, ending at the next
    * 2-space-indented member (inner lines are indented deeper). */
  private def moduleDefBody(text: String, sig: String): String = {
    val i = text.indexOf(sig)
    require(i >= 0, s"def not found: $sig")
    val rest = text.substring(i)
    val ends = Seq("\n  def ", "\n  private", "\n  /**")
      .map(rest.indexOf(_, 1)).filter(_ > 0)
    rest.substring(0, if (ends.nonEmpty) ends.min else rest.length)
  }

  def expectedTag(prefix: String, sourcePath: String, defSigs: Seq[String]): String = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sourcePath)), java.nio.charset.StandardCharsets.UTF_8)
    val region = defSigs.map(moduleDefBody(text, _)).mkString("\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(region.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    prefix + "-" + digest.take(4).map("%02x".format(_)).mkString
  }
}
