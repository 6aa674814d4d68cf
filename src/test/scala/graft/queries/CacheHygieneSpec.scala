package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** Cache-hygiene contract: every per-(session, dir) TrieMap memo in the
  * query/operator modules must be emptied by its module's clearCaches —
  * Harness calls those hooks at teardown, and a forgotten entry pins
  * DataFrames (and their checkpoint RDDs / persisted blocks) for the
  * JVM's lifetime. Round 14 added five caches by hand (partDeg,
  * cappedAdj, frontier, basketItems, resPqIndex, t27Model,
  * trainedGateStream) — each needed its clear-hook line remembered;
  * this spec makes the omission a test failure instead of a slow leak.
  *
  * The scan is reflective (all declared TrieMap fields, private
  * included), so a NEW cache is covered the moment it is declared.
  * Bucketing is exempt by design: its values are warehouse TABLE NAMES
  * whose backing data outlives any session, not pinned frames. */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"

  /** Exempt registries that must OUTLIVE clearCaches by design:
    * StreamOps.allScratch holds scratch-dir PATH STRINGS for the JVM
    * shutdown hook (a second-chance delete — the per-cache clears
    * already rmrf the dirs; dropping the strings would disarm the
    * hook). It pins no frames. */
  private val Exempt = Set("allScratch")

  private def trieMapFields(module: AnyRef): Seq[(String, TrieMap[_, _])] =
    module.getClass.getDeclaredFields.toSeq
      .filter(f => classOf[TrieMap[_, _]].isAssignableFrom(f.getType))
      .filterNot(f => Exempt(f.getName))
      .map { f => f.setAccessible(true); f.getName -> f.get(module).asInstanceOf[TrieMap[_, _]] }

  test("clearCaches empties every TrieMap memo in its module (reflective scan)") {
    // populate at least one memo in EVERY module that declares one
    // (round-14 advice: modules the populate phase skipped — StreamOps,
    // Generated, CopyOnWrite, MergeOnRead — passed vacuously on empty
    // maps, so a forgotten clear-hook line there was exactly the
    // omission this spec exists to catch). Each call is the module's
    // cheapest memoizing entry point at sf0.001.
    GraphOps.degreeHistogram(spark, d).count()
    TextOps.charTrigramFamiliarity(spark, d).count()
    EventOps.robustSpikes(spark, d).count()
    Relational2.basketRules(spark, d).count()
    VectorOps.ivfPqResidualTopK(spark, d).count()
    StreamOps.streamDedup(spark, d).count()
    Generated.federatedJoin(spark, d).count()
    graft.operators.CopyOnWrite.cowUpsert(spark, d).count()
    graft.operators.MergeOnRead.morTimeTravel(spark, d).count()
    MediaOps.mediaDupClusters(spark, d).count()
    graft.multimodal.Multimodal.chunkSimhashPairs(spark, d).count()
    // round-15 memos (advice: the populate phase never touched them, so
    // a forgotten clear-hook line passed the module-granular check)
    Relational2.fuzzyBlockedMatch(spark, d).count()   // q52CandCache
    TextOps.curationWaterfall(spark, d).count()       // t58Cache + swqCache
    TextOps.tokenBudgetSelect(spark, d).count()       // t22SelCache
    TextOps.bm25Topk(spark, d).count()                // postingsCache + dlCache
    val modules: Seq[(String, AnyRef)] = Seq(
      ("GraphOps", GraphOps),
      ("TextOps", TextOps),
      ("EventOps", EventOps),
      ("Relational2", Relational2),
      ("VectorOps", VectorOps),
      ("StreamOps", StreamOps),
      ("Generated", Generated),
      ("MediaOps", MediaOps),
      ("CopyOnWrite", graft.operators.CopyOnWrite),
      ("MergeOnRead", graft.operators.MergeOnRead),
      ("Multimodal", graft.multimodal.Multimodal))
    // PER-MODULE non-vacuity: every module that declares a memo must have
    // at least one populated before the clear (a global count let whole
    // modules slip through). Populating all ~70 FIELDS would re-run most
    // of the board — field-granular coverage is the STATIC test below,
    // which needs no populate at all.
    val unexercised = modules.collect {
      case (nm, m) if trieMapFields(m).nonEmpty &&
        trieMapFields(m).forall(_._2.isEmpty) => nm
    }
    assert(unexercised.isEmpty,
      s"populate phase left these modules' memos all-empty (their clear " +
        s"assertion would be vacuous): ${unexercised.mkString(", ")}")
    // the SINGLE production hook list (Harness teardown AND Bench's
    // cleared-memo pass call exactly this) — clearing per-module here
    // instead would let Memos.clearAll silently miss a module while the
    // spec stays green
    graft.Memos.clearAll()
    val leaked = for {
      (nm, m) <- modules
      (field, tm) <- trieMapFields(m)
      if tm.nonEmpty
    } yield s"$nm.$field (${tm.size} entries)"
    assert(leaked.isEmpty,
      s"caches not emptied by Memos.clearAll: ${leaked.mkString(", ")}")
  }

  test("every TrieMap field is referenced inside its module's clear hook (static, field-granular)") {
    // Field-granular companion to the runtime test above (round-15
    // advice: that test is only as granular as its populate phase, so a
    // field nothing populates — the round-15 memos, most StreamOps
    // scratch registries — would pass with its clear-hook line missing).
    // Populating every field would re-run most of the board; instead this
    // reads each module's SOURCE and asserts every reflected TrieMap
    // field name occurs as a word inside the clear hook's body — the
    // exact omission class (a forgotten `xCache.clear()` line) is a
    // failure for ALL fields, including ones added after this spec.
    val src = "src/main/scala/graft"
    val modules: Seq[(String, AnyRef, String, String)] = Seq(
      ("GraphOps", GraphOps, s"$src/queries/GraphOps.scala", "clearCaches"),
      ("TextOps", TextOps, s"$src/queries/TextOps.scala", "clearCaches"),
      ("EventOps", EventOps, s"$src/queries/EventOps.scala", "clearCaches"),
      ("Relational2", Relational2, s"$src/queries/Relational2.scala", "clearObservedCache"),
      ("VectorOps", VectorOps, s"$src/queries/VectorOps.scala", "clearCaches"),
      ("StreamOps", StreamOps, s"$src/queries/StreamOps.scala", "clearCaches"),
      ("Generated", Generated, s"$src/queries/Generated.scala", "clearCaches"),
      ("MediaOps", MediaOps, s"$src/queries/MediaOps.scala", "clearCaches"),
      ("CopyOnWrite", graft.operators.CopyOnWrite,
        s"$src/operators/CopyOnWrite.scala", "clearCaches"),
      ("MergeOnRead", graft.operators.MergeOnRead,
        s"$src/operators/MergeOnRead.scala", "clearCaches"),
      ("Multimodal", graft.multimodal.Multimodal,
        s"$src/multimodal/Multimodal.scala", "clearCaches"))
    val missing = modules.flatMap { case (nm, mod, path, hook) =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
      val defIdx = text.indexOf(s"def $hook")
      assert(defIdx >= 0, s"$nm: no `def $hook` in $path")
      // hook body = from the def to the next module-level (2-space) def;
      // handles both braced and expression-bodied one-liner hooks
      val rest = text.substring(defIdx + 4)
      val end = rest.indexOf("\n  def ")
      val body0 = if (end >= 0) rest.substring(0, end) else rest
      // follow ONE hop of local delegation (round 19: Generated's
      // clearCaches = armedFullCache.clear() + the cleared-lane
      // variant) — a field cleared inside a locally-defined
      // `clearX()` the hook calls is still cleared by the hook
      val delegated = "\\b(clear\\w+)\\(\\)".r.findAllMatchIn(body0)
        .map(_.group(1)).filterNot(_ == hook).toSeq.distinct
      val body = body0 + delegated.flatMap { dn =>
        // exact-name match (round-19 advice): indexOf("def " + dn)
        // prefix-matches a LONGER method name defined earlier (e.g.
        // `def clearX` binding to `def clearXKeepingY`), appending the
        // wrong body and potentially masking a missing clear line
        s"(?m)def ${java.util.regex.Pattern.quote(dn)}\\s*[(:=]".r
          .findFirstMatchIn(text).map { m =>
            val r2 = text.substring(m.start + 4)
            val e2 = r2.indexOf("\n  def ")
            if (e2 >= 0) r2.substring(0, e2) else r2
          }
      }.mkString("\n", "\n", "")
      trieMapFields(mod).collect {
        case (field, _) if !s"\\b${java.util.regex.Pattern.quote(field)}\\b".r
          .findFirstIn(body).isDefined => s"$nm.$field"
      }
    }
    assert(missing.isEmpty,
      s"TrieMap fields with no line in their module's clear hook: ${missing.mkString(", ")}")
  }

  test("cleared-lane clear keeps the shared armed deployment; the full clear drops it") {
    // round-19 brief #4: g09/g10/g21 are three readouts of ONE armed
    // Derby deployment — the cleared lane (which clears memos before
    // EVERY query) must keep that triple across the pass so the build
    // is graded once (in g09, first consumer in sorted order), while
    // Harness teardown's clearAll still drops it. Dummy frames stand in
    // for the deployment so this stays a metadata-only test.
    import spark.implicits._
    val dummy = Seq(1).toDF("x")
    Generated.armedFullCache.put(spark, (dummy, dummy, dummy))
    Generated.liveCache.put((spark, "hygiene-dummy"), dummy)
    graft.Memos.clearAllKeepingSharedDeployments()
    assert(Generated.armedFullCache.contains(spark),
      "the shared deployment triple must survive the cleared-lane clear " +
        "(g10/g21 read it; re-deploying would grade the same build thrice)")
    assert(Generated.liveCache.isEmpty,
      "single-query Derby lifetimes must still clear per query — their " +
        "isolation is the semantics under grade (OCC/rollback/idempotency)")
    graft.Memos.clearAll()
    assert(Generated.armedFullCache.isEmpty,
      "the full clear (Harness teardown) must drop the deployment memo")
  }
}
