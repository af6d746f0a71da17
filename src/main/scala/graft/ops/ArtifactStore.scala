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
  * the plain in-session memo. Disable with SPARK_GRAFT_ARTIFACT_STORE=off
  * (or point it at an alternate root).
  */
object ArtifactStore {

  private val EnvVar = "SPARK_GRAFT_ARTIFACT_STORE"
  private val DefaultRoot = "/tmp/graft_artifact_store"

  /** Test hook: redirect the store to a scratch root so specs can
    * exercise the read-through/round-trip/staleness mechanics without
    * writing spec frames into the real namespace (where a later bench
    * session would READ them). Honored before the env/default.
    */
  @volatile private[graft] var rootOverride: Option[String] = None

  private[graft] def rootSetting: String =
    rootOverride.getOrElse(sys.env.getOrElse(EnvVar, DefaultRoot))

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
    // pq chain: int8-quantized points, exact-integer-Lloyd-trained
    // codes, the IVF-PQ index + memoized search frame (integer
    // distances, id tie-breaks)
    "pq_pts", "pq_codes", "pq_ivf_index", "ivfPqTop5",
    // dsir: exact-integer micro-nat importance scores
    "dsirScores",
    // chargram chain: the (doc_id, p, h) gram stream + its df-capped
    // and winnowed derivations + the q224 manifest assets (integer
    // hashes, counts, mod-2^64 fingerprint sums)
    "gramStream", "gramStreamDf20", "winnowFingerprints",
    "gramManifestBase", "gramScratchTotals",
    // shingle chain: split-membership flags, df table, q227 count
    // manifest + audit totals, the memoized quality/token pops
    "splitGrams:1", "splitGrams:2", "splitGrams:3", "splitGrams:5",
    "splitGrams:8", "shingleDf:3", "shingleCountsBase:3",
    "shingleFlagTotals:3", "qualityScored", "tokenCounts",
    // curation chain: scored docs (per-row scores), the 5-gram posting
    // assets, per-doc repetition signals
    "scoredDocs", "fiveGramMeta", "fiveGramPosting", "repSignals")

  /** Store enabled: not turned off, and the code fingerprint resolvable
    * (a null code source — exotic classloader — disables persistence
    * rather than risking an unversioned namespace).
    */
  private[graft] def enabled: Boolean =
    rootSetting != "off" && codeFingerprint.nonEmpty

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
        hitCount.incrementAndGet()
        // checkpoint the scan: consumers iterate over FrameMemo frames
        // (the materialized-frame contract), and the read IS the
        // replaced build cost
        s.read.parquet(p.toString).localCheckpoint()
      case Some(p) =>
        val built = materialize
        missCount.incrementAndGet()
        write(built, p)
        built
      case None => materialize
    }
  }

  /** Atomic best-effort persist: write to a nonce'd sibling, rename into
    * place (same filesystem — atomic), lose gracefully to a concurrent
    * winner. Any failure leaves the store absent, never half-present.
    */
  private def write(df: DataFrame, p: Path): Unit =
    try {
      Files.createDirectories(p.getParent)
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
          new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
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
  private def pruneStaleFingerprints(): Unit =
    try {
      val root = Paths.get(rootSetting)
      if (Files.isDirectory(root)) {
        val keep = s"fp$codeFingerprint"
        val stream = Files.list(root)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala
            .filter(p => p.getFileName.toString.startsWith("fp") &&
              p.getFileName.toString != keep)
            .foreach(p => new scala.reflect.io.Directory(p.toFile).deleteRecursively())
        } finally stream.close()
        val cutoff = System.currentTimeMillis() - 3600L * 1000
        val walk = Files.walk(root, 3)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(p => Files.isDirectory(p) &&
              p.getFileName.toString.contains(".tmp.") &&
              Files.getLastModifiedTime(p).toMillis < cutoff)
            .toSeq // materialize before deleting under the open walk stream
            .foreach(p => new scala.reflect.io.Directory(p.toFile).deleteRecursively())
        } finally walk.close()
      }
    } catch { case _: Throwable => () }
}
