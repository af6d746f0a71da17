package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once materialization for expensive frames shared across
  * registered queries: candidate-pair graphs, k-NN edge lists — anything
  * several queries would otherwise each rebuild from scratch
  * (q43/q68/q90/q93 all consumed the same LSH bucket self-join; the r11
  * audit billed that build 3× across one bench pass).
  *
  * `cached` ALWAYS returns a `localCheckpoint`ed (materialized) frame, so
  * consumers that iterate over it (connected components, PageRank) never
  * need their own defensive checkpoint. For dirs under the driver's
  * read-only testdata roots the materialized frame is also memoized per
  * (session, dir, key) and shared by every later caller. At 100 TB the
  * equivalent is a stored edge-list/manifest table built once per corpus
  * snapshot (the DataSkipping layout-build contract) — this is the
  * in-session analog, and both rest on the same contract: THE INPUT DIR
  * IS AN IMMUTABLE SNAPSHOT. The guard enforces that contract rather
  * than assuming it: a test-scratch dir can be rewritten between
  * callers, and a memoized checkpoint would silently keep serving the
  * old bytes — so non-immutable dirs materialize per call, uncached.
  *
  * Lifetime: entries live until the JVM exits — deliberate for the
  * bench/verify/test processes this serves (the artifact set is a
  * handful of named edge lists per dir, block-store-small), and a
  * stopped session's entries die with the same JVM. The build runs
  * OUTSIDE any map lock (get → build → putIfAbsent), so a memoized
  * build may itself call back into `cached` (knnGraphLsh builds on the
  * memoized pair frame) — `computeIfAbsent` would forbid that reentrancy
  * ("recursive update"); the put-if-absent race merely risks a rare
  * duplicate build, never a wrong result.
  */
object FrameMemo {

  /** Dirs the driver guarantees immutable (TESTDATA.md: read-only). */
  private val ImmutableRoots = Seq("/root/testdata")

  /** Whether frames built from `dir` are shared across callers — public
    * so Bench only runs (and bills) its shared-build pre-pass when the
    * memo will actually retain the result.
    */
  def memoizable(dir: String): Boolean =
    ImmutableRoots.exists(r => dir == r || dir.startsWith(r + "/"))

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def cached(s: SparkSession, dir: String, key: String)
            (build: => DataFrame): DataFrame =
    if (!memoizable(dir)) build.localCheckpoint()
    else {
      val k = (s, s"$dir|$key")
      val hit = memo.get(k)
      if (hit != null) hit
      else {
        val built = build.localCheckpoint()
        val raced = memo.putIfAbsent(k, built)
        if (raced != null) {
          // losing a cross-chain race (reachable since Bench's parallel
          // build chains, r18): nothing will ever read the losing frame,
          // but its eager localCheckpoint blocks would stay block-store
          // resident for the session and silently pad the bench line's
          // `blk` residency figures — release them now.
          org.apache.spark.sql.graft.ColumnBridge.releaseCheckpoint(built)
          raced
        } else built
      }
    }
}
