package graft.ops

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-SESSION persistence for the most expensive FrameMemo artifacts
  * (r19 verdict #2): the in-JVM memo dies with the JVM, so every bench /
  * verify / test session re-pays the full shared build — a cost that
  * grows with each artifact sweep (15.1 s r18 → 24.6 s r19 committed;
  * 47% of the r19 driver headline). This is the stored-table layer
  * FrameMemo's own scaladoc names as the 100 TB analog: a read-through
  * parquet cache under a scratch root, keyed by
  *
  *   (code-version fingerprint, data fingerprint of the source dir,
  *    artifact key)
  *
  * so a STALE read is impossible by construction rather than by
  * discipline:
  *   - the CODE fingerprint is an md5 over every .class file on this
  *     build's code-source (path + bytes, sorted) — any change to any
  *     builder (or anything it calls) moves the whole store to a fresh
  *     namespace. Deliberately coarse: a comment-only recompile
  *     invalidates too, which costs one rebuild, while a too-fine key
  *     (per-builder hashing) could MISS a transitive dependency change
  *     and serve wrong bytes — the asymmetric failure this layer must
  *     never have.
  *   - the DATA fingerprint digests each source parquet file's (name,
  *     size, mtime) — the driver regenerates testdata between rounds at
  *     the SAME path (the stageSplitEventsDir lesson), which the
  *     immutable-root contract alone would not catch across sessions.
  *
  * Scope: only keys in [[PersistKeys]] (the measured top of the build
  * cost, bounded MB-scale frames) and only under FrameMemo's immutable
  * roots. Store IO failures NEVER fail a build — persistence degrades to
  * the plain in-session memo.
  *
  * **OFF BY DEFAULT since r22.** The r21 verdict ruled that serving a
  * PREVIOUS session's computation to a timed bench/verify run is result
  * caching, not optimization — the driver's measurements must price the
  * cold compute. With the env unset, every session computes every
  * artifact from the parquet inputs (the in-session FrameMemo still
  * builds each once per JVM, priced in Bench's shared_build window,
  * which is inside the reported total). Opt back in explicitly with
  * SPARK_GRAFT_ARTIFACT_STORE=on (default root) or =/some/root — the
  * production posture, where a corpus snapshot's artifacts ARE durable
  * stored tables; =off also accepted. The fingerprint keying and all
  * store mechanics are unchanged and remain spec-covered.
  */
object ArtifactStore {

  private val EnvVar = "SPARK_GRAFT_ARTIFACT_STORE"

  /** Per-user default root (r20 ADVICE): a FIXED path in world-writable
    * /tmp lets any local user pre-create it and plant parquet+_SUCCESS
    * under the current fingerprint — bench/verify would read planted
    * bytes as trusted artifacts. The user-name suffix plus the ownership
    * check in [[rootTrusted]] closes that: a root owned by anyone else
    * disables persistence instead of reading through it.
    */
  private val DefaultRoot = "/tmp/graft_artifact_store_" +
    sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9._-]", "_")

  /** Test hook: redirect the store to a scratch root so specs can
    * exercise the read-through/round-trip/staleness mechanics without
    * writing spec frames into the real namespace (where a later bench
    * session would READ them). Honored before the env/default.
    */
  @volatile private[graft] var rootOverride: Option[String] = None

  /** Effective root: the spec override wins; otherwise the env opts IN —
    * unset or "off"/"" → disabled, "on" → [[DefaultRoot]], anything else
    * → a custom root path.
    */
  private[graft] def rootSetting: String =
    rootOverride.getOrElse(sys.env.get(EnvVar) match {
      case None | Some("off") | Some("") => "off"
      case Some("on")                    => DefaultRoot
      case Some(path)                    => path
    })

  /** Artifact keys worth persisting: the FrameMemo artifacts built in
    * Bench's shared chains, all bounded, parquet-clean frames whose
    * content is PARTITION-ORDER-INDEPENDENT — hash joins, integer
    * counts/sums (this repo's integer-exact discipline: q132/q147 Lloyd
    * rounds, q157 micro-nats, q149's order-pinned float sums), and
    * per-row float math. Artifacts derived from floating-point
    * AGGREGATIONS whose summation order Spark chooses are deliberately
    * excluded — their low-order bits can vary with the WRITING session's
    * partitioning, and a cross-session read must be bit-identical to
    * what the reading session would have built. Excluded on those
    * grounds: knnIvfTop5 (double-mean k-means centroids) and the
    * embedding Gram / PQ coarse model (driver-side Maps, not frames,
    * anyway). Everything else stays in-session only.
    */
  private[graft] val PersistKeys: Set[String] = Set(
    // ann chain: the exact k-NN graph's O(n²/bucket) self-join, the LSH
    // candidate pair frame, and the derived anchor/method frames
    // (per-pair cosines are per-row arithmetic over stored vectors;
    // ranks tie-break on ids)
    "knnGraphExact", "knnGraphLsh", "knnExactTop5", "knnLshTop5",
    "lshCandidatesWithCos", "hybridRrfRanked",
    // dedup chain: the shingle/minhash/simhash/dhash pair graphs
    // (integer hashes, integer intersection counts, one division) + the
    // min-based connected-component group rows
    "jaccard:0.2:100", "minhashLsh:0.2", "simhashPairs", "dhashPairs",
    "lshGroupRows",
    // q108's prefix-filtered exact pair frame (r21): integer ids and
    // counts + one per-row double division — the allowed per-row class
    "prefixJaccard:4:5",
    // q191's cell-bounded kNN edge list (r21): integer ids ranked by
    // exact integer d², ties by id — partition-order-independent
    "cellKnn:5",
    // pq chain: int8-quantized points, exact-integer-Lloyd-trained
    // codes, the IVF-PQ index + memoized search frame (integer
    // distances, id tie-breaks)
    "pq_pts", "pq_codes", "pq_ivf_index", "ivfPqTop5",
    // dsir: exact-integer micro-nat importance scores
    "dsirScores",
    // the q210/q214 embedding Gram cell frame (r21): exact int64 sums —
    // regrouping-invariant, so cross-session bit-equality holds by
    // construction; persisting it removes the dsir_gram chain's only
    // per-session rebuild
    "gramCells",
    // the IVF-PQ trained model (coarse centroids + residual codebooks)
    // encoded as a (kind, sub, cluster, dim, v) long frame (r21): the
    // integer-exact Lloyd/codebook updates are deterministic and
    // partition-order-independent (the q147 oracle hash-gates exactly
    // that), so the driver-side Map persists as a small keyed file —
    // r20 verdict #2's "persist the driver-side models" item
    "pq_model",
    // chargram chain: the (doc_id, p, h) gram stream + its df-capped
    // grouped posting (sort_array-canonicalized occurrence lists — the
    // r22 q171/q174 reshape), the winnowed fingerprints + their kept
    // grouped posting (r22 q155 reshape), and the q224 manifest assets
    // (integer hashes, counts, mod-2^64 fingerprint sums)
    "gramStream", "gramPostingDf20", "winnowFingerprints",
    "winnowKeptPosting", "gramManifestBase", "gramScratchTotals",
    // shingle chain: split-membership flags, df table, q227 count
    // manifest + audit totals, the memoized quality/token pops
    "splitGrams:1", "splitGrams:2", "splitGrams:3", "splitGrams:5",
    "splitGrams:8", "shingleDf:3", "shingleCountsBase:3",
    "shingleFlagTotals:3", "qualityScored", "tokenCounts",
    // curation chain: scored docs (per-row scores), the 5-gram posting
    // assets, per-doc repetition signals; q197's df-capped copy-mass
    // table (r22 — md5 digests + exact integer sums)
    "scoredDocs", "fiveGramMeta", "fiveGramPosting", "repSignals",
    "copyMassCnt",
    // the trained BPE tokenizer artifact (r21): merge table + final
    // symbol state, integer/string-exact window algebra — the q135≡q140
    // oracle gate is the partition-order-independence proof
    "bpeTrained",
    // q153's NB prediction frame (r21): micro-nat integer weights,
    // integer score sums, deterministic tie-breaks — read by q153/q178/
    // q185
    "nbPredictions")

  /** Store enabled: not turned off, the code fingerprint resolvable
    * (a null code source — exotic classloader — disables persistence
    * rather than risking an unversioned namespace), and the root
    * OWNED BY THIS USER ([[rootTrusted]]).
    */
  private[graft] def enabled: Boolean =
    rootSetting != "off" && codeFingerprint.nonEmpty && rootTrusted(rootSetting)

  /** Ownership gate, memoized per root path: create the root if missing
    * (0700 where POSIX applies) and accept it only when it is a real
    * directory (not a symlink — a planted link would redirect writes and
    * the prune walk) owned by the current user. A pre-created root owned
    * by another user — the /tmp poisoning vector — disables persistence
    * with one stderr line rather than trusting foreign parquet bytes.
    */
  private val trustMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def rootTrusted(root: String): Boolean =
    trustMemo.computeIfAbsent(root, r => try {
      val p = Paths.get(r)
      if (!Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        try Files.createDirectory(p,
          java.nio.file.attribute.PosixFilePermissions.asFileAttribute(
            java.nio.file.attribute.PosixFilePermissions.fromString("rwx------")))
        catch {
          case _: java.nio.file.FileAlreadyExistsException => () // concurrent session
          case _: UnsupportedOperationException => Files.createDirectories(p)
        }
      }
      val ok = Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS) && {
        val owner = Files.getOwner(p).getName
        val me = sys.props.getOrElse("user.name", "")
        // an empty user.name would also collapse DefaultRoot to the
        // shared "anon" suffix — trusting the root then reopens the
        // /tmp-poisoning vector the gate exists to close (r21 ADVICE):
        // no identity, no persistence.
        me.nonEmpty && owner == me
      }
      if (!ok) System.err.println(s"[artifact-store] root $r is a symlink or " +
        "owned by another user; persistence disabled for this session")
      java.lang.Boolean.valueOf(ok)
    } catch { case _: Throwable => java.lang.Boolean.FALSE })

  /** md5 over every .class file on this build's code source, sorted by
    * path — computed once per JVM (~MBs of class bytes, <1 s). Empty
    * string when the code source cannot be resolved (store disabled).
    */
  lazy val codeFingerprint: String =
    try {
      val src = getClass.getProtectionDomain.getCodeSource
      if (src == null || src.getLocation == null) ""
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val loc = Paths.get(src.getLocation.toURI)
        if (Files.isDirectory(loc)) {
          val stream = Files.walk(loc)
          try {
            import scala.jdk.CollectionConverters._
            stream.iterator().asScala
              .filter(p => p.toString.endsWith(".class"))
              .map(p => (loc.relativize(p).toString, p))
              .toSeq.sortBy(_._1)
              .foreach { case (rel, p) =>
                md.update(rel.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                md.update(Files.readAllBytes(p))
              }
          } finally stream.close()
        } else {
          val zip = new java.util.zip.ZipFile(loc.toFile)
          try {
            import scala.jdk.CollectionConverters._
            zip.entries().asScala
              .filter(_.getName.endsWith(".class"))
              .toSeq.sortBy(_.getName)
              .foreach { e =>
                md.update(e.getName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                md.update(zip.getInputStream(e).readAllBytes())
              }
          } finally zip.close()
        }
        md.digest().map("%02x".format(_)).mkString.take(16)
      }
    } catch { case _: Throwable => "" }

  /** (name, size, mtime) digest over the source dir's parquet tables —
    * regenerated testdata at the same path lands in a fresh namespace.
    */
  private[graft] def dataFingerprint(dir: String): String =
    try {
      val d = Paths.get(dir)
      if (!Files.isDirectory(d)) ""
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val stream = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .toSeq.sortBy(_.getFileName.toString)
            .foreach { p =>
              val line = s"${p.getFileName}|${Files.size(p)}|" +
                s"${Files.getLastModifiedTime(p).toMillis}\n"
              md.update(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
        } finally stream.close()
        md.digest().map("%02x".format(_)).mkString.take(16)
      }
    } catch { case _: Throwable => "" }

  /** Filesystem-safe, collision-free key dir: readable sanitized stem +
    * an md5 suffix of the raw key ("jaccard:0.2" and "jaccard_0_2" must
    * never share a path).
    */
  private def keyDir(key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    s"${key.replaceAll("[^A-Za-z0-9.-]", "_")}_$md"
  }

  private[graft] def storePath(dir: String, key: String,
                               fp: String = codeFingerprint): Option[Path] = {
    val dataFp = dataFingerprint(dir)
    if (fp.isEmpty || dataFp.isEmpty) None
    else Some(Paths.get(rootSetting, s"fp$fp", s"d$dataFp", keyDir(key)))
  }

  // session-level evidence counters (BENCH_DETAIL "artifact_store"):
  // a second session on the same machine must show hits where the
  // first showed misses
  private val hitCount = new java.util.concurrent.atomic.AtomicInteger
  private val missCount = new java.util.concurrent.atomic.AtomicInteger
  def stats: (Int, Int) = (hitCount.get, missCount.get)

  /** Read-through: serve the persisted artifact when present (one
    * parquet read + checkpoint replaces the build), else run
    * `materialize` (which must return an already-checkpointed frame —
    * FrameMemo's build path) and persist its result best-effort. Only
    * [[PersistKeys]] under immutable roots ever touch the store.
    */
  def readThrough(s: SparkSession, dir: String, key: String)
                 (materialize: => DataFrame): DataFrame = {
    val path =
      if (enabled && PersistKeys.contains(key) && FrameMemo.memoizable(dir))
        storePath(dir, key)
      else None
    path match {
      case Some(p) if Files.exists(p.resolve("_SUCCESS")) =>
        // checkpoint the scan: consumers iterate over FrameMemo frames
        // (the materialized-frame contract), and the read IS the
        // replaced build cost. The read can still fail AFTER the
        // _SUCCESS check — a concurrent newer-build session's prune
        // deleting this namespace mid-read, or a corrupt entry — and the
        // documented contract is that store IO NEVER fails a build
        // (r20 verdict #3): degrade to the rebuild, count it a miss,
        // and drop the bad entry best-effort so the next session
        // rebuilds cleanly too.
        (try {
          val read = s.read.parquet(p.toString).localCheckpoint()
          hitCount.incrementAndGet()
          Some(read)
        } catch {
          case t: Throwable =>
            System.err.println(s"[artifact-store] read failed for $p: " +
              s"${t.getClass.getSimpleName} (rebuilding)")
            try deleteTreeNoFollow(p) catch { case _: Throwable => () }
            None
        }).getOrElse {
          val built = materialize
          missCount.incrementAndGet()
          write(built, p, dir)
          built
        }
      case Some(p) =>
        val built = materialize
        missCount.incrementAndGet()
        write(built, p, dir)
        built
      case None => materialize
    }
  }

  /** Recursive delete that NEVER follows symlinks (r20 ADVICE: a planted
    * `fp*` symlink must delete the link, not the tree it points at).
    * scala.reflect.io.Directory.deleteRecursively traverses via
    * java.io.File.listFiles, which follows directory symlinks.
    */
  private[graft] def deleteTreeNoFollow(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val stream = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.toSeq.foreach(deleteTreeNoFollow)
      } finally stream.close()
    }
    Files.deleteIfExists(p)
  }

  /** Name of the per-d-namespace marker recording which SOURCE DIR the
    * namespace was fingerprinted from — what lets the prune distinguish a
    * DEAD d-namespace (its source dir re-fingerprints differently: the
    * driver regenerated testdata at the same path) from a LIVE sibling
    * (a different SF dir whose fingerprint still matches).
    */
  private[graft] val SourceMarker = "_source_dir"

  /** Atomic best-effort persist: write to a nonce'd sibling, rename into
    * place (same filesystem — atomic), lose gracefully to a concurrent
    * winner. Any failure leaves the store absent, never half-present.
    */
  private def write(df: DataFrame, p: Path, sourceDir: String): Unit =
    try {
      Files.createDirectories(p.getParent)
      val marker = p.getParent.resolve(SourceMarker)
      if (!Files.exists(marker))
        try Files.write(marker, Paths.get(sourceDir).toAbsolutePath.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: Throwable => () }
      val tmp = p.resolveSibling(
        s"${p.getFileName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
      df.write.mode("overwrite").parquet(tmp.toString)
      try Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AtomicMoveNotSupportedException =>
          // a concurrent session published first (identical content —
          // deterministic builds) or the rename cannot be atomic here:
          // keep the existing/absent state, drop our staging copy
          deleteTreeNoFollow(tmp)
      }
      pruneStaleFingerprints()
    } catch {
      case t: Throwable =>
        System.err.println(s"[artifact-store] persist failed for $p: " +
          s"${t.getClass.getSimpleName} (continuing unpersisted)")
    }

  /** Bounded disk: fp namespaces from previous builds can never be read
    * again (the fingerprint moved), so drop them on first write — along
    * with any `.tmp.<nonce>` staging dirs a CRASHED writer left behind
    * (they were never renamed into place, so nothing reads them; the
    * 1-hour age guard keeps a concurrent in-flight writer's staging dir
    * safe). Best effort; concurrent sessions of the SAME build share one
    * namespace and are unaffected.
    */
  /** Newest mtime anywhere within `p`'s tree (NOFOLLOW): a slow in-flight
    * writer's staging DIR mtime stops updating once its part files exist,
    * but the files it is still writing carry fresh mtimes — so freshness
    * must be judged on the tree, not the dir (r20 ADVICE).
    */
  private def newestMtime(p: Path): Long = {
    // r21 ADVICE: an unreadable tree must not read as PERMANENTLY fresh
    // (Long.MaxValue never ages → a crashed writer's dir leaks forever);
    // fall back to the dir's own mtime, which does age past the cutoff.
    val own =
      try Files.getLastModifiedTime(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS).toMillis
      catch { case _: Throwable => Long.MaxValue } // truly unstatable: keep
    try {
      var newest = own
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val stream = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala.foreach(c => newest = math.max(newest, newestMtime(c)))
        } finally stream.close()
      }
      newest
    } catch { case _: Throwable => own }
  }

  private def pruneStaleFingerprints(): Unit =
    try {
      val root = Paths.get(rootSetting)
      if (Files.isDirectory(root)) {
        import scala.jdk.CollectionConverters._
        val noFollow = java.nio.file.LinkOption.NOFOLLOW_LINKS
        val keep = s"fp$codeFingerprint"
        val stream = Files.list(root)
        // symlinks are deleted as LINKS, never traversed (deleteTreeNoFollow)
        try stream.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("fp") &&
            p.getFileName.toString != keep)
          .toSeq
          .foreach(deleteTreeNoFollow)
        finally stream.close()
        // DEAD data namespaces inside the live fingerprint (r20 verdict
        // #3): regenerated testdata at the same path moves the dataFp, so
        // the old d-dir can never be read again — recognizable because
        // its recorded source dir no longer fingerprints to its name.
        // A missing/foreign-format marker or an unresolvable source dir
        // (moved testdata root) is left alone: unreadable ≠ provably dead.
        val fpDir = root.resolve(keep)
        if (Files.isDirectory(fpDir, noFollow)) {
          val ds = Files.list(fpDir)
          try ds.iterator().asScala
            .filter(p => Files.isDirectory(p, noFollow) &&
              p.getFileName.toString.startsWith("d"))
            .toSeq
            .foreach { p =>
              val marker = p.resolve(SourceMarker)
              if (Files.isRegularFile(marker, noFollow)) {
                val src = new String(Files.readAllBytes(marker),
                  java.nio.charset.StandardCharsets.UTF_8).trim
                val current = dataFingerprint(src)
                if (current.nonEmpty && s"d$current" != p.getFileName.toString)
                  deleteTreeNoFollow(p)
              }
            }
          finally ds.close()
        }
        val cutoff = System.currentTimeMillis() - 3600L * 1000
        val walk = Files.walk(root, 3)
        try walk.iterator().asScala
          .filter(p => Files.isDirectory(p, noFollow) &&
            p.getFileName.toString.contains(".tmp."))
          .toSeq // materialize before deleting under the open walk stream
          .filter(newestMtime(_) < cutoff)
          .foreach(deleteTreeNoFollow)
        finally walk.close()
      }
    } catch { case _: Throwable => () }
}
