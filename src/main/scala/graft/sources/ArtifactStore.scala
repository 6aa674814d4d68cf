package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-RUN persistence for derived index artifacts (gram / positioned
  * gram / bigram tables): the session-lifetime memos in TextOps make one
  * JVM cheap, but a FRESH JVM used to re-tokenize the whole corpus. This
  * is the "persisted table reused across decontamination runs" a real
  * deployment keeps — build once, write parquet, and every later run
  * (same JVM or not) serves its consumers from the artifact scan.
  *
  * Layout: `$GRAFT_ARTIFACT_DIR (default ./artifacts)/<kind>/<key>`,
  * where the key folds in the SOURCE FIXTURE's size+mtime — a
  * regenerated corpus can never silently serve a stale index (the
  * versioning a production feature store does with snapshot ids).
  *
  * Both the build path and the load path end in a parquet scan of the
  * artifact, so consumers see the identical plan shape either way, and
  * the frame's contents are byte-identical to the computed frame
  * (longs/strings round-trip parquet exactly).
  */
object ArtifactStore {

  def root: String =
    rootOverride.getOrElse(sys.env.getOrElse("GRAFT_ARTIFACT_DIR", "artifacts"))

  /** Test-only root redirection (round-18 advice: GcTagSpec used to
    * plant/reap kinds in the REAL shared store and append dead temp-dir
    * lines to the real _registry.tsv on every run). Set via
    * [[withRootForTest]]; production code never touches it. */
  @volatile private var rootOverride: Option[String] = None

  /** Run `body` against an isolated artifact root (registry included):
    * the in-memory registry mirror is reset on entry and on exit, so
    * digests recorded against the temp root never leak into the real
    * store's gc decisions and vice versa. Test use only; suites run
    * sequentially in the forked test JVM, so the swap is race-free. */
  def withRootForTest[T](dir: String)(body: => T): T = synchronized {
    val prev = rootOverride
    rootOverride = Some(dir)
    registry.clear(); registryLoaded = false
    try body
    finally {
      rootOverride = prev
      registry.clear(); registryLoaded = false
    }
  }

  /** Derivation-code version, folded into every artifact key. The
    * fixture key (size+mtime) catches data changes; THIS catches code
    * changes — bump it whenever the tokenization/normalization that
    * FEEDS an artifact changes (norm(), sid60, gram windows), or a
    * persisted index built by the old code will silently serve the new
    * engine and either fail the oracle confusingly or mask the fix.
    * Per-artifact DERIVATION PARAMETERS (capped_adj2's CapA, s31's CC
    * fold shape) ride in the artifact NAME instead — changing one
    * invalidates just that artifact, not the whole store; only
    * cross-cutting derivation code needs a bump here. (Parameters the
    * output is provably invariant to — e.g. the tournament slice
    * count — belong in NEITHER: they would only force spurious
    * rebuilds.) */
  val FormatVersion = 1

  /** Kind directories that no code path reads any more. The stale-key
    * check alone can't catch a kind RENAME (e.g. pq_cand → pq_cand64):
    * the old dir's registered digests still reproduce against the
    * unchanged fixture, so gc would keep it forever — a slow disk leak.
    * When retiring or renaming a kind, add the OLD name here; gc()
    * deletes the whole kind dir. */
  val RetiredKinds: Set[String] = Set(
    // r15: capped_adj keyed on the bare fixture digest; the key now
    // folds in CapA (kind renamed capped_adj2), and the old dirs'
    // digests still reproduce so only a kind retirement reaps them
    "capped_adj")

  /** Current fold-shape tag per TAGGED kind — the gc mirror of the
    * module tag constants (round-17 verdict #6 / advice: a fold-tag
    * BUMP inside a live kind stranded its old `<digest>-<oldTag>` dirs
    * forever, because the digest half still reproduces — the same slow
    * leak RetiredKinds closes for kind renames, per tag bump). gc()
    * reaps a key dir whose name is `<registeredDigest>-<suffix>` with
    * `suffix != currentTags(kind)`. Kinds NOT listed here keep the
    * conservative digest-only rule (capped_adj2-style parameter
    * suffixes are derivation inputs, not supersedable tags).
    * Completeness is test-enforced: GcTagSpec statically scans every
    * `loadOrBuild(..., key(...) + "-" + <X>FoldTag)` call site and
    * fails if its kind is missing here. */
  def currentTags: Map[String, String] = Map(
    "minhash_sig" -> graft.queries.TextOps.SigFoldTag,
    "lsh_pairs" -> graft.queries.TextOps.LshPairsFoldTag,
    "doc_sids" -> graft.queries.TextOps.DocSidsFoldTag,
    "corpus_sids" -> graft.queries.TextOps.DeltaFoldTag,
    "corpus_bands" -> graft.queries.TextOps.DeltaFoldTag,
    "rolled_bands" -> graft.queries.TextOps.DeltaFoldTag,
    "corpus_bands2" -> graft.queries.TextOps.BandRoll2FoldTag,
    "rolled_bands_s1" -> graft.queries.TextOps.BandRoll2FoldTag,
    "rolled_bands_s2" -> graft.queries.TextOps.BandRoll2FoldTag,
    "reaped_bands" -> graft.queries.TextOps.BandReapFoldTag,
    "cos_pairs" -> graft.queries.VectorOps.CosPairsFoldTag,
    "ann_index" -> graft.queries.VectorOps.AnnIndexFoldTag,
    "corpus_ann" -> graft.queries.VectorOps.AnnRollFoldTag,
    "rolled_ann" -> graft.queries.VectorOps.AnnRollFoldTag,
    "corpus_ann2" -> graft.queries.VectorOps.AnnRoll2FoldTag,
    "rolled_ann_s1" -> graft.queries.VectorOps.AnnRoll2FoldTag,
    "rolled_ann_s2" -> graft.queries.VectorOps.AnnRoll2FoldTag,
    "reaped_ann" -> graft.queries.VectorOps.AnnReapFoldTag,
    "edge_maint" -> graft.queries.StreamOps.EdgeMaintFoldTag,
    "inc_cc" -> graft.queries.StreamOps.IncCcFoldTag,
    "m_simhash_pairs" -> graft.multimodal.Multimodal.SimhashPairsFoldTag,
    "media_clusters" -> graft.queries.MediaOps.MediaClustersFoldTag)

  /** Observability for specs: how many artifacts were built vs served
    * from disk in this JVM. */
  val builds = new AtomicInteger(0)
  val loads = new AtomicInteger(0)

  /** Stale-proof key: md5 over the dir path and the source file's
    * (recursive) byte length and max mtime. Each digest's (dir, file)
    * inputs are recorded in `<root>/_registry.tsv` so gc() can later
    * recompute whether the digest is still CURRENT for its source —
    * the digest alone is one-way. */
  def key(sourceDir: String, sourceFile: String): String = {
    val digest = keyNoRecord(sourceDir, sourceFile)
    recordKey(digest, sourceDir, sourceFile)
    digest
  }

  private def keyNoRecord(sourceDir: String, sourceFile: String): String = {
    val p = Paths.get(sourceDir, sourceFile)
    var len = 0L; var mtime = 0L
    def walk(x: Path): Unit =
      if (Files.isDirectory(x)) {
        val st = Files.list(x)
        try st.forEach(walk(_)) finally st.close()
      } else if (Files.exists(x)) {
        len += Files.size(x)
        mtime = math.max(mtime, Files.getLastModifiedTime(x).toMillis)
      }
    walk(p)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$sourceDir|$len|$mtime|v$FormatVersion".getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(12)
  }

  // digest → (sourceDir, sourceFile); mirrors <root>/_registry.tsv.
  // Appended once per new digest per JVM (synchronized below).
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  @volatile private var registryLoaded = false

  private def registryPath: Path = Paths.get(root, "_registry.tsv")

  private def loadRegistry(): Unit = synchronized {
    if (!registryLoaded) {
      if (Files.exists(registryPath))
        Files.readAllLines(registryPath).forEach { line =>
          line.split("\t", -1) match {
            case Array(dg, sd, sf) => registry.putIfAbsent(dg, (sd, sf)); ()
            case _ => ()
          }
        }
      registryLoaded = true
    }
  }

  private def recordKey(digest: String, sourceDir: String, sourceFile: String): Unit =
    synchronized {
      loadRegistry()
      if (registry.putIfAbsent(digest, (sourceDir, sourceFile)).isEmpty) {
        try {
          Files.createDirectories(registryPath.getParent)
          Files.writeString(registryPath, s"$digest\t$sourceDir\t$sourceFile\n",
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
        } catch { case _: Throwable => () } // registry is advisory; gc just keeps more
      }
    }

  /** Garbage-collect stale artifacts: a long-lived checkout accumulates
    * one fixture-keyed dir per (kind, fixture state), and regenerated
    * or deleted fixtures strand their old keys forever. For every
    * artifact dir, split the (possibly `-`-concatenated) key into
    * digests and recompute each against its REGISTERED source: a digest
    * that no longer reproduces (fixture changed or gone) marks the dir
    * stale and it is deleted. Unregistered digests are kept —
    * conservative, never deletes what it can't prove stale. For kinds
    * in `tags`, a dir named `<registeredDigest>-<suffix>` whose suffix
    * is not the kind's CURRENT fold tag is superseded (the tag bump
    * re-keyed the artifact) and is reaped even though its digest still
    * reproduces. Also reaps orphaned `.tmp-*` dirs from crashed
    * builders — run gc only when no builder is concurrently active.
    * Returns the deleted paths. */
  def gc(retired: Set[String] = RetiredKinds,
      tags: Map[String, String] = currentTags): Seq[String] = synchronized {
    loadRegistry()
    val deleted = scala.collection.mutable.Buffer.empty[String]
    val rootP = Paths.get(root)
    if (Files.isDirectory(rootP)) {
      val kinds = Files.list(rootP)
      try kinds.forEach { kindDir =>
        if (Files.isDirectory(kindDir) &&
            retired.contains(kindDir.getFileName.toString)) {
          rmrf(kindDir); deleted += kindDir.toString
        } else if (Files.isDirectory(kindDir)) {
          val curTag = tags.get(kindDir.getFileName.toString)
          val keys = Files.list(kindDir)
          try keys.forEach { keyDir =>
            val name = keyDir.getFileName.toString
            // strip every leading `<registeredDigest>-` (multi-fixture
            // keys concatenate digests: edge_maint/inc_cc carry two);
            // what remains is the tag suffix the bump superseded
            @annotation.tailrec
            def stripDigests(n: String): String =
              registry.keysIterator.find(dg => n.startsWith(dg + "-")) match {
                case Some(dg) => stripDigests(n.drop(dg.length + 1))
                case None => n
              }
            val supersededTag = curTag.exists { t =>
              val suffix = stripDigests(name)
              // a residual 12-hex segment at the suffix head means a
              // LEADING digest failed to strip — the advisory registry
              // lost its line (recordKey best-effort append), not a
              // tag bump. That dir is "can't prove stale", never
              // "superseded": reaping it would delete a LIVE artifact
              // of a multi-digest kind (round-18 review finding). Tag
              // suffixes can't false-positive here: every fold tag is
              // `<3-4 letters>-<8 hex>`, so a dash lands inside the
              // first 12 chars.
              (suffix ne name) && suffix != t &&
                !suffix.matches("[0-9a-f]{12}-.*")
            }
            val stale =
              if (name.contains(".tmp-")) true
              else supersededTag || name.split("-").exists { dg =>
                registry.get(dg)
                  .exists { case (sd, sf) => keyNoRecord(sd, sf) != dg }
              }
            if (stale) { rmrf(keyDir); deleted += keyDir.toString }
          } finally keys.close()
        }
      } finally kinds.close()
    }
    deleted.toSeq
  }

  /** Serve the artifact at `<root>/<kind>/<name>`, building it with
    * `build` on first use. Returns a DataFrame that SCANS THE ARTIFACT
    * in both paths. Concurrency: synchronized JVM-wide (parallel test
    * suites in one JVM), and cross-PROCESS safe via write-to-temp +
    * atomic rename — two processes racing the same key each build into
    * their own temp dir and the loser of the rename discards, so a
    * reader can never observe a half-written artifact behind a
    * _SUCCESS marker. */
  def loadOrBuild(s: SparkSession, kind: String, name: String)
      (build: => DataFrame): DataFrame = synchronized {
    // Tagged kinds MUST key as `<digest(s)>-<currentTag>` with nothing
    // AFTER the tag (round-18 advice): gc's superseded-tag reap tells a
    // lost-registry digest from a stale tag only via the convention
    // that tagged keys END with the bare tag — a call site appending a
    // parameter after it (key + "-" + Tag + "-" + param) is invisible
    // to GcTagSpec's static regex, and gc would reap that LIVE
    // artifact. Enforced at the one choke point every build and load
    // passes through; parameters belong BEFORE the tag or in the kind
    // name (the capped_adj2 route).
    currentTags.get(kind).foreach { tag =>
      require(name.endsWith("-" + tag),
        s"artifact kind '$kind' keyed '$name' must END with its registered " +
          s"fold tag '-$tag' — append parameters before the tag or use a new kind")
    }
    val dir = Paths.get(root, kind, name)
    if (!Files.exists(dir.resolve("_SUCCESS"))) {
      val tmp = Paths.get(root, kind,
        s"$name.tmp-${ProcessHandle.current().pid()}")
      build.write.mode("overwrite").parquet(tmp.toString)
      try {
        Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        builds.incrementAndGet()
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException =>
          // another process won the rename; serve theirs
          rmrf(tmp)
          loads.incrementAndGet()
      }
    } else loads.incrementAndGet()
    s.read.parquet(dir.toString)
  }

  private def rmrf(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try st.forEach(rmrf(_)) finally st.close()
    }
    Files.deleteIfExists(p); ()
  }
}
