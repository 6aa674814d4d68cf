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
    * the derivation itself (round-16 advice).
    *
    * A terminator candidate is accepted only if it leaves the region
    * BRACE-BALANCED — or is the def's own 2-space-indented closing
    * `}` with exactly the def's `{` open (region excludes it, matching
    * the pre-round-18 hashes). A 2-space-indented line INSIDE a
    * brace-delimited def (a chained continuation, a stripMargin line
    * at that indent) leaves extra `{` unmatched, so the region now
    * extends past it instead of silently truncating — truncation froze
    * later edits out of the tag (round-17 advice). */
  private def moduleDefBody(text: String, sig: String): String = {
    val i = text.indexOf(sig)
    require(i >= 0, s"def not found: $sig")
    val rest = text.substring(i)
    val m = java.util.regex.Pattern.compile("\\n  \\S").matcher(rest)
    var from = 1
    while (m.find(from)) {
      val cand = rest.substring(0, m.start())
      val open = cand.count(_ == '{') - cand.count(_ == '}')
      val termIsClose = rest.charAt(m.start() + 3) == '}'
      if (open == 0 || (open == 1 && termIsClose)) return cand
      from = m.start() + 1
    }
    rest
  }

  def expectedTag(prefix: String, sourcePath: String, defSigs: Seq[String]): String =
    expectedTagMulti(prefix, Seq(sourcePath -> defSigs))

  /** Multi-FILE tag region (round 18): a derivation that composes defs
    * across modules (m10's clusters = Multimodal pairs + TextOps CC)
    * hashes every contributing region, so an edit in ANY feeding module
    * churns the one tag that re-keys the persisted artifact. */
  def expectedTagMulti(prefix: String, parts: Seq[(String, Seq[String])]): String = {
    val region = parts.map { case (sourcePath, defSigs) =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sourcePath)), java.nio.charset.StandardCharsets.UTF_8)
      defSigs.map(moduleDefBody(text, _)).mkString("\n")
    }.mkString("\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(region.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    prefix + "-" + digest.take(4).map("%02x".format(_)).mkString
  }
}
