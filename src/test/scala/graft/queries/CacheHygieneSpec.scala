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
    val modules: Seq[(String, AnyRef, () => Unit)] = Seq(
      ("GraphOps", GraphOps, () => GraphOps.clearCaches()),
      ("TextOps", TextOps, () => TextOps.clearCaches()),
      ("EventOps", EventOps, () => EventOps.clearCaches()),
      ("Relational2", Relational2, () => Relational2.clearObservedCache()),
      ("VectorOps", VectorOps, () => VectorOps.clearCaches()),
      ("StreamOps", StreamOps, () => StreamOps.clearCaches()),
      ("Generated", Generated, () => Generated.clearCaches()),
      ("MediaOps", MediaOps, () => MediaOps.clearCaches()),
      ("CopyOnWrite", graft.operators.CopyOnWrite,
        () => graft.operators.CopyOnWrite.clearCaches()),
      ("MergeOnRead", graft.operators.MergeOnRead,
        () => graft.operators.MergeOnRead.clearCaches()),
      ("Multimodal", graft.multimodal.Multimodal,
        () => graft.multimodal.Multimodal.clearCaches()))
    // PER-MODULE coverage: every module that declares a memo must have
    // at least one populated before the clear, or its assertion below
    // is vacuous (a global count let whole modules slip through). A
    // module with no TrieMap fields at all has nothing to leak and is
    // trivially covered — and the moment someone adds its first memo,
    // this assertion demands a populate line for it.
    val unexercised = modules.collect {
      case (nm, m, _) if trieMapFields(m).nonEmpty &&
        trieMapFields(m).forall(_._2.isEmpty) => nm
    }
    assert(unexercised.isEmpty,
      s"populate phase left these modules' memos all-empty (their clear " +
        s"assertion would be vacuous): ${unexercised.mkString(", ")}")
    modules.foreach { case (_, _, clear) => clear() }
    val leaked = for {
      (nm, m, _) <- modules
      (field, tm) <- trieMapFields(m)
      if tm.nonEmpty
    } yield s"$nm.$field (${tm.size} entries)"
    assert(leaked.isEmpty,
      s"caches not emptied by their module's clear hook: ${leaked.mkString(", ")}")
  }
}
