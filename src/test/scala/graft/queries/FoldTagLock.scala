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
    * 2-space-indented member of ANY form (inner lines are indented
    * deeper or blank). Matching `^  \S` — rather than an enumerated
    * def/private/doc-comment prefix list — keeps the region exactly the
    * fold's source: a trailing `val`/`//`/`final` member no longer gets
    * silently folded in, so the tag churns only on edits that touch
    * the derivation itself (round-16 advice). */
  private def moduleDefBody(text: String, sig: String): String = {
    val i = text.indexOf(sig)
    require(i >= 0, s"def not found: $sig")
    val rest = text.substring(i)
    val m = java.util.regex.Pattern.compile("\\n  \\S").matcher(rest)
    rest.substring(0, if (m.find(1)) m.start() else rest.length)
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
