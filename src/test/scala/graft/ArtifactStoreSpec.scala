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

  test("a corrupt entry degrades to a rebuild (logged miss), never a failed build") {
    import spark.implicits._
    withScratchRoot { root =>
      val dir = "/root/testdata/sf0.001"
      ArtifactStore.readThrough(spark, dir, "dsirScores")(
        Seq((1L, 7L)).toDF("doc_id", "s").localCheckpoint())
      val entry = ArtifactStore.storePath(dir, "dsirScores").get
      // poison the persisted parquet but leave _SUCCESS: the exists
      // check passes, the read itself fails — the mid-read-deletion /
      // corrupt-entry shape the r20 verdict named
      import scala.jdk.CollectionConverters._
      val parts = java.nio.file.Files.list(entry)
      try parts.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.write(p, Array[Byte](0, 1, 2, 3)))
      finally parts.close()
      val (h0, m0) = ArtifactStore.stats
      var rebuilt = 0
      val out = ArtifactStore.readThrough(spark, dir, "dsirScores") {
        rebuilt += 1
        Seq((1L, 7L)).toDF("doc_id", "s").localCheckpoint()
      }
      assert(rebuilt == 1, "corrupt entry must fall back to the build")
      assert(out.collect().toSeq == Seq(org.apache.spark.sql.Row(1L, 7L)))
      val (h1, m1) = ArtifactStore.stats
      assert(h1 == h0 && m1 == m0 + 1, "the degraded read counts as a miss")
      // and the re-persisted entry serves the NEXT session again
      var again = 0
      ArtifactStore.readThrough(spark, dir, "dsirScores") {
        again += 1; Seq((1L, 7L)).toDF("doc_id", "s").localCheckpoint()
      }
      assert(again == 0, "the rebuild must have replaced the bad entry")
    }
  }

  test("a dead data namespace (regenerated source) is pruned; live SF siblings survive") {
    import spark.implicits._
    withScratchRoot { root =>
      // live namespace for sf0.001 — marker records its true source
      ArtifactStore.readThrough(spark, "/root/testdata/sf0.001", "tokenCounts")(
        Seq(1L).toDF("n").localCheckpoint())
      val live = ArtifactStore.storePath("/root/testdata/sf0.001", "tokenCounts").get.getParent
      // a DEAD namespace: its marker claims sf0.01 as source, but its
      // d-name does not match sf0.01's current fingerprint (testdata
      // regenerated at the same path between sessions)
      val fpDir = live.getParent
      val dead = fpDir.resolve("d0123456789abcdef")
      java.nio.file.Files.createDirectories(dead)
      java.nio.file.Files.write(dead.resolve(ArtifactStore.SourceMarker),
        "/root/testdata/sf0.01".getBytes("UTF-8"))
      // an unmarked namespace (foreign format): must be left alone
      val unmarked = fpDir.resolve("dfefefefefefefefe")
      java.nio.file.Files.createDirectories(unmarked)
      // any write triggers the prune
      ArtifactStore.readThrough(spark, "/root/testdata/sf0.001", "qualityScored")(
        Seq(2L).toDF("n").localCheckpoint())
      assert(!java.nio.file.Files.exists(dead), "dead d-namespace must be pruned")
      assert(java.nio.file.Files.exists(live), "live d-namespace must survive")
      assert(java.nio.file.Files.exists(unmarked), "unmarked dirs are not provably dead")
    }
  }

  test("prune deletes a planted fp symlink as a LINK — the target tree is untouched") {
    import spark.implicits._
    withScratchRoot { root =>
      val victim = java.nio.file.Files.createTempDirectory("graft_store_victim")
      val vfile = victim.resolve("precious.txt")
      java.nio.file.Files.write(vfile, "keep".getBytes("UTF-8"))
      try {
        val link = java.nio.file.Paths.get(root, "fp0000000000000000")
        java.nio.file.Files.createSymbolicLink(link, victim)
        ArtifactStore.readThrough(spark, "/root/testdata/sf0.001", "tokenCounts")(
          Seq(1L).toDF("n").localCheckpoint())
        assert(!java.nio.file.Files.exists(link,
          java.nio.file.LinkOption.NOFOLLOW_LINKS), "the link itself is pruned")
        assert(java.nio.file.Files.exists(vfile),
          "the symlink TARGET must never be deleted")
      } finally {
        new scala.reflect.io.Directory(victim.toFile).deleteRecursively()
      }
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
