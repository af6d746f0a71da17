package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ArtifactStore

/** The cross-session persistence contract: a persisted artifact is read
  * back bit-equal, a second session never rebuilds it, and a STALE read
  * — after a code change OR a source-data regeneration — is impossible
  * because either fingerprint moves the store to a fresh namespace.
  */
class ArtifactStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withScratchRoot[T](body: String => T): T = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_store_spec").toString
    ArtifactStore.rootOverride = Some(root)
    try body(root)
    finally {
      ArtifactStore.rootOverride = None
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  test("code fingerprint: resolvable, hex, stable within the JVM") {
    val fp = ArtifactStore.codeFingerprint
    assert(fp.length == 16 && fp.forall(c => "0123456789abcdef".contains(c)),
      s"expected 16 hex chars, got '$fp'")
    assert(fp == ArtifactStore.codeFingerprint, "must be memoized/stable")
  }

  test("data fingerprint digests the source tables; store paths separate by code, data, and key") {
    val dfp = ArtifactStore.dataFingerprint("/root/testdata/sf0.001")
    assert(dfp.length == 16)
    // a different SF dir is different data
    assert(dfp != ArtifactStore.dataFingerprint("/root/testdata/sf0.01"))
    // missing dir -> no fingerprint -> no store path (never a shared
    // "unknown" namespace)
    assert(ArtifactStore.dataFingerprint("/no/such/dir").isEmpty)
    assert(ArtifactStore.storePath("/no/such/dir", "simhashPairs").isEmpty)
    val base = ArtifactStore.storePath("/root/testdata/sf0.001", "simhashPairs").get
    // code-version change -> disjoint namespace (stale read impossible)
    val otherFp = ArtifactStore
      .storePath("/root/testdata/sf0.001", "simhashPairs", fp = "deadbeefdeadbeef").get
    assert(base != otherFp && !otherFp.startsWith(base.getParent.getParent))
    // data change -> disjoint namespace
    assert(base != ArtifactStore.storePath("/root/testdata/sf0.01", "simhashPairs").get)
    // sanitization must not collide: "a:b" vs "a_b" differ by digest suffix
    assert(ArtifactStore.storePath("/root/testdata/sf0.001", "a:b").get !=
      ArtifactStore.storePath("/root/testdata/sf0.001", "a_b").get)
  }

  test("read-through: first call builds and persists, second call reads — no rebuild") {
    import spark.implicits._
    withScratchRoot { root =>
      var builds = 0
      def build() = {
        builds += 1
        Seq((1L, "x", 1.5), (2L, "y", -0.25)).toDF("id", "s", "v")
          .localCheckpoint()
      }
      val dir = "/root/testdata/sf0.001"
      val first = ArtifactStore.readThrough(spark, dir, "simhashPairs")(build())
      assert(builds == 1)
      val second = ArtifactStore.readThrough(spark, dir, "simhashPairs")(build())
      assert(builds == 1, "second session-equivalent call must READ, not rebuild")
      // bit-equal round trip, schema preserved
      assert(second.schema.map(f => (f.name, f.dataType)) ==
        first.schema.map(f => (f.name, f.dataType)))
      assert(second.orderBy("id").collect().toSeq ==
        first.orderBy("id").collect().toSeq)
      // the store advertises evidence counters
      val (h, m) = ArtifactStore.stats
      assert(h >= 1 && m >= 1)
      // non-allowlisted keys never touch the store
      var extra = 0
      ArtifactStore.readThrough(spark, dir, "not-a-persist-key") {
        extra += 1; Seq(1).toDF("x").localCheckpoint()
      }
      ArtifactStore.readThrough(spark, dir, "not-a-persist-key") {
        extra += 1; Seq(1).toDF("x").localCheckpoint()
      }
      assert(extra == 2)
      // scratch (mutable) dirs never touch the store either
      var scratch = 0
      ArtifactStore.readThrough(spark, "/tmp/graft_not_immutable", "simhashPairs") {
        scratch += 1; Seq(1).toDF("x").localCheckpoint()
      }
      ArtifactStore.readThrough(spark, "/tmp/graft_not_immutable", "simhashPairs") {
        scratch += 1; Seq(1).toDF("x").localCheckpoint()
      }
      assert(scratch == 2)
    }
  }

  test("a code-version change makes the persisted copy unreachable and prunes it on next write") {
    import spark.implicits._
    withScratchRoot { root =>
      val dir = "/root/testdata/sf0.001"
      ArtifactStore.readThrough(spark, dir, "gramStream")(
        Seq(1L).toDF("h").localCheckpoint())
      val stale = new java.io.File(root, "fpdeadbeefdeadbeef")
      // simulate a leftover namespace from a previous build
      assert(stale.mkdirs())
      // a write under the CURRENT fingerprint prunes foreign namespaces
      ArtifactStore.readThrough(spark, dir, "simhashPairs")(
        Seq(2L).toDF("h").localCheckpoint())
      assert(!stale.exists(), "previous-build namespaces must be pruned")
      val live = new java.io.File(root, s"fp${ArtifactStore.codeFingerprint}")
      assert(live.exists(), "the current namespace must survive the prune")
    }
  }

  test("crashed-writer staging dirs are pruned once stale, kept while fresh") {
    import spark.implicits._
    withScratchRoot { root =>
      val ns = new java.io.File(root, s"fp${ArtifactStore.codeFingerprint}/dabc")
      assert(ns.mkdirs())
      val old = new java.io.File(ns, "gramStream_x.tmp.deadbeef")
      val fresh = new java.io.File(ns, "gramStream_x.tmp.cafecafe")
      assert(old.mkdirs() && fresh.mkdirs())
      // age the crashed one past the 1-hour guard; leave the other fresh
      assert(old.setLastModified(System.currentTimeMillis() - 2 * 3600L * 1000))
      // any write triggers the prune pass
      ArtifactStore.readThrough(spark, "/root/testdata/sf0.001", "tokenCounts")(
        Seq(1L).toDF("n").localCheckpoint())
      assert(!old.exists(), "a stale crashed staging dir must be pruned")
      assert(fresh.exists(), "an in-flight (fresh) staging dir must survive")
    }
  }
}
