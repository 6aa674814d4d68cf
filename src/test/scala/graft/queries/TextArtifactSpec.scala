package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 (r16 brief #3): the minhash signature table and the
  * verified LSH pair frame are cross-run ArtifactStore artifacts now —
  * these tests lock (a) the fold-shape tags to the derivation source
  * (the IncCcFoldTag rule: an edit without a bump fails here and prints
  * the value to paste), and (b) the serving contract: after the session
  * memo is cleared, a re-invocation is served from the persisted
  * artifact with byte-identical rows. */
class TextArtifactSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.session
  val d = "/root/testdata/sf0.001"
  val src = "src/main/scala/graft/queries/TextOps.scala"

  /** The signature derivation region: normalization, shingling, the
    * sid hash, the min-hash aggregates, and every LSH constant. */
  private val SigSigs = Seq("def norm(", "def shingles(", "def shinglesOf(",
    "def sid(", "def mhAggs", "val NumHashes", "val BandRows", "val MhA",
    "val MhB", "val P31")

  /** The banding layout shared by t03 and t67's postings. */
  private val BandSigs = Seq("def bandsOf(", "val BandKeys")

  test("minhash_sig artifact fold-shape tag is locked to the derivation source") {
    val want = FoldTagLock.expectedTag("sig", src, SigSigs)
    assert(TextOps.SigFoldTag == want,
      s"signature derivation changed: bump TextOps.SigFoldTag to \"$want\" " +
        "(the persisted minhash_sig artifact must be invalidated with it)")
  }

  test("lsh_pairs artifact fold-shape tag is locked to the derivation source") {
    val want = FoldTagLock.expectedTag("lsh", src,
      SigSigs ++ BandSigs :+ "def lshNearDupPairsUncached(")
    assert(TextOps.LshPairsFoldTag == want,
      s"pair derivation changed: bump TextOps.LshPairsFoldTag to \"$want\" " +
        "(the persisted lsh_pairs artifact must be invalidated with it)")
  }

  test("corpus_sids/corpus_bands/rolled_bands (t67/t68) fold-shape tag is locked to the derivation source") {
    val want = FoldTagLock.expectedTag("dlt", src,
      SigSigs ++ BandSigs ++ Seq("val DeltaMod", "val DeltaRes",
        "def corpusDocs(", "def deltaDocs(", "def sidsOf(", "def deltaBands(",
        "def corpusSidsUncached(", "def corpusBandsUncached(",
        "def deltaDedupUncached(", "def deltaDedupBuild(",
        "def rolledBandsUncached("))
    assert(TextOps.DeltaFoldTag == want,
      s"delta-index derivation changed: bump TextOps.DeltaFoldTag to \"$want\" " +
        "(the persisted corpus_sids/corpus_bands/rolled_bands artifacts must be invalidated with it)")
  }

  test("t68 roll-forward ≡ rebuild: the rolled index census equals a from-scratch banding of all docs") {
    // the DuckDB oracle states this cross-engine; this states it
    // in-engine so the union write can never silently drop or duplicate
    // postings even where both engines would drift together
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, sum}
    val rebuilt = TextOps.minhashSignatures(spark, d) // full-corpus signatures
    val nBands = TextOps.NumHashes / TextOps.BandRows
    val bands = (0 until nBands).map { b =>
      rebuilt.select(col("doc_id"), lit(b).as("band"),
        col(s"mh${TextOps.BandRows * b}").as("h0"),
        col(s"mh${TextOps.BandRows * b + 1}").as("h1"),
        col(s"mh${TextOps.BandRows * b + 2}").as("h2"),
        col(s"mh${TextOps.BandRows * b + 3}").as("h3"))
    }.reduce(_ unionByName _)
    val want = bands.groupBy("band")
      .agg(count(lit(1)).as("n_postings"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(col("h0") + col("h1") + col("h2") + col("h3")).cast("long").as("h_checksum"))
      .orderBy("band").collect().map(_.toSeq).toSeq
    val got = TextOps.indexRoll(spark, d).collect().map(_.toSeq).toSeq
    assert(got == want, s"rolled census diverged from rebuild:\n got=$got\nwant=$want")
    assert(got.size == nBands)
  }

  test("t67 incremental ≡ batch: delta-dedup equals the full LSH pairs restricted to delta-touching") {
    // the DuckDB oracle states this cross-engine; this states it
    // IN-ENGINE against the t03 frame, so the two implementations (one
    // incremental over persisted postings, one static) cannot drift even
    // where the fixture has no discriminating pair
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val batch = TextOps.lshNearDupPairs(spark, d)
      .filter(pmod(col("a_id"), lit(TextOps.DeltaMod)) === TextOps.DeltaRes ||
        pmod(col("b_id"), lit(TextOps.DeltaMod)) === TextOps.DeltaRes)
      .collect().map(_.toSeq).toSeq
    val inc = TextOps.deltaDedup(spark, d).collect().map(_.toSeq).toSeq
    assert(inc == batch,
      s"incremental delta-dedup diverged from batch (inc=${inc.size}, batch=${batch.size})")
    assert(inc.nonEmpty, "fixture must have at least one delta-touching pair")
  }

  test("t67 planted geometry: delta↔corpus and delta↔delta dups found; corpus↔corpus gated out") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // The m13/m14 evidence bar applied to t67: plant KNOWN duplicates on
    // both sides of the delta boundary (delta = doc_id ≡ 7 mod 10) and
    // grade the census against hand-known truth. Identical texts ⇒
    // identical shingle sets ⇒ identical signatures ⇒ band candidates ⇒
    // jaccard exactly 1.0 — no hand-tracing of the hash needed:
    //   docs 3 (corpus) & 7 (delta): same text A  → MUST surface (3, 7)
    //   docs 17 & 27 (both delta):   same text B  → MUST surface (17, 27)
    //   docs 4 & 14 (both corpus):   same text C  → must be ABSENT
    //     (a dup, but not delta-touching — yesterday's backfill already
    //     reported it; the incremental pass must not re-emit it)
    //   docs 5, 8 (corpus): unique long texts     → absent
    val A = "the quick brown fox jumps over the lazy dog again and again tonight"
    val B = "completely different delta payload about streaming ingestion of text"
    val C = "a corpus only duplicate that the incremental pass must never re emit"
    val dir = java.nio.file.Files.createTempDirectory("graft_t67plant")
      .toFile.getAbsolutePath
    Seq(
      (3L, A, "en", "fx"), (7L, A, "en", "fx"),
      (17L, B, "en", "fx"), (27L, B, "en", "fx"),
      (4L, C, "en", "fx"), (14L, C, "en", "fx"),
      (5L, "unrelated corpus text number five with plenty of words inside", "en", "fx"),
      (8L, "another unrelated corpus document with its own distinct wording", "en", "fx"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.deltaDedup(spark, dir)
      .select("a_id", "b_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(p => (p._1, p._2)) == Seq((3L, 7L), (17L, 27L)),
      s"exactly the delta-touching dup pairs must surface: $out")
    assert(out.forall(_._3 == 1.0),
      s"identical texts must verify at jaccard exactly 1.0: $out")
    // and the corpus↔corpus dup really IS a dup the batch path sees —
    // only the delta restriction keeps it out of t67's census
    val batch = TextOps.lshNearDupPairs(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch.contains((4L, 14L)),
      s"fixture self-check: the corpus-only dup must exist in the batch frame: $batch")
    // t68 on the same planted corpus, from first principles: every doc
    // contributes EXACTLY one posting per band (4 bands, one signature
    // row each), so per band: 8 postings, 8 distinct docs, and
    // Σ doc_id = 3+7+17+27+4+14+5+8 = 85 — the rolled (corpus ∪ delta)
    // index must reconstruct the full population exactly
    val roll = TextOps.indexRoll(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(roll.map(_._1) == (0L until 4L), s"4 bands: $roll")
    assert(roll.forall(r => r._2 == 8L && r._3 == 8L && r._4 == 85L),
      s"per band the rolled index must hold all 8 docs once (Σid 85): $roll")
  }

  test("t67 serve plan scans the persisted corpus indices; only the delta is shingled fresh") {
    val plan = TextOps.deltaDedupUncached(spark, d)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("corpus_bands") && plan.contains("corpus_sids"),
      s"the corpus side must be served from the persisted postings artifacts:\n$plan")
    // the only fresh text scans are the delta slice: every scan of the
    // documents fixture must carry the delta residue filter
    val docScans = "documents\\.parquet".r.findAllIn(plan).size
    assert(docScans > 0, "delta side must read the documents fixture")
    assert(!plan.contains("NOT (pmod(doc_id"),
      s"no corpus-residue scan of the raw fixture may appear in the serve plan:\n$plan")
  }

  test("lsh_pairs: a cleared session is served from the artifact with identical rows") {
    val rows1 = TextOps.lshNearDupPairs(spark, d).collect().map(_.toSeq).toSeq
    assert(rows1.nonEmpty, "fixture must have near-dup pairs")
    TextOps.clearCaches()
    val loads0 = graft.sources.ArtifactStore.loads.get()
    val builds0 = graft.sources.ArtifactStore.builds.get()
    val rows2 = TextOps.lshNearDupPairs(spark, d).collect().map(_.toSeq).toSeq
    // lsh_pairs load + (possibly memoized-elsewhere) sig load — at least
    // the pair artifact itself must come from disk, never a rebuild
    assert(graft.sources.ArtifactStore.loads.get() > loads0,
      "second invocation must SCAN the persisted lsh_pairs artifact")
    assert(graft.sources.ArtifactStore.builds.get() == builds0,
      "second invocation must not rebuild")
    assert(rows2 == rows1, "artifact scan must equal the built frame")
  }
}
