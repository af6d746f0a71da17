package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Methodology: deterministic (sorted) query
  * order and median of 3 timed runs per query — a single-shot,
  * map-iteration-ordered harness cannot distinguish a real regression
  * from JIT/page-cache noise (identical-plan queries were swinging 5x
  * between rounds with zero code change).
  *
  * The timed action is a noop-format sink write, NOT `.count()`:
  * `count()` lets Catalyst prune every column and delete the projection
  * expressions and final sort of any select+orderBy query, so the
  * per-row work several queries exist to measure (text stats, langid,
  * fingerprints, JSON parse) was billed at parquet-scan cost. The noop
  * sink consumes every row of the registered plan (all columns
  * evaluated, order preserved through the sort) and discards it —
  * measured plan = registered plan. METHODOLOGY BREAK vs rounds ≤4:
  * totals are not comparable with BENCH_r04 and earlier; expression-
  * heavy queries report honestly higher times from round 5 on.
  *
  * Cross-SESSION variance caveat (r8→r9 investigation): median-of-3
  * absorbs within-session noise but not machine-level contention across
  * whole bench invocations — the r8 round file read q36–q44 at 1.5–2.8x
  * and q93/q108 at ~2.4–4.6x their steady-state times with zero code
  * change, and two full 111-query sessions the next round reproduced
  * none of it (same code, r7-level times). Treat a cross-round delta as
  * real only when it survives a re-run in a quiet session; within-run
  * ordering effects are already controlled (sorted order, untimed
  * warmup, inter-query GC).
  */
object Bench {

  /** Noop-format sink: consumes every row of the registered plan (all
    * columns evaluated, order preserved through the sort) and discards
    * it — measured plan = registered plan.
    */
  def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Cached-block residency snapshot: (cached RDD count, MiB held across
    * memory+disk). Emitted before and after the timed loop: the r13
    * driver bench read 193 s where the quiet-session protocol read 97 s,
    * and without residency evidence a retention regression (q118's
    * unreleased checkpoints) is indistinguishable from machine
    * contention. With it: a fat `post` = the engine is hoarding blocks
    * (fix the operator); a lean `post` on a slow round = the machine was
    * busy (re-bench quiet).
    */
  def blockResidency(spark: SparkSession): (Int, Long) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(i => i.memSize + i.diskSize).sum >> 20)
  }

  /** Per-run timings per query (EXECUTION order, not sorted — the r16/r17
    * verdicts could not adjudicate whether the driver's inflated
    * gram-block medians were uniformly-slow runs (machine contention) or
    * bimodal (a first-run artifact) because only medians were committed;
    * raw per-run arrays in BENCH_DETAIL make that decidable). Queries
    * sorted by name. A throwing query must NOT be billed as a
    * (near-zero) time — that would make the bench total IMPROVE when a
    * regression breaks a query — so a failure is a `Left(exception
    * class)` for that query, never a swallowed fast run. Pinned by
    * BenchHarnessSpec.
    */
  def timeQueries(spark: SparkSession, sfDir: String,
                  queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
                  runs: Int): Seq[(String, Either[String, Seq[Double]])] =
    queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // checkpoint/broadcast blocks from the previous query are only
      // released after a DRIVER GC triggers ContextCleaner; on a large
      // heap that may never happen mid-run, so later queries pay their
      // predecessors' block-store residency. Collect between queries —
      // outside any timed region — so each query starts clean.
      System.gc()
      var err: Option[String] = None
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        if (err.isEmpty)
          try exec(fn(spark, sfDir))
          catch { case t: Throwable => err = Some(t.getClass.getSimpleName) }
        (System.nanoTime() - t0) / 1e9
      }
      name -> err.toLeft(times)
    }

  /** Median of the raw run array — the single number the stdout line and
    * cross-round comparisons use.
    */
  private[graft] def median(times: Seq[Double]): Double = {
    val s = times.sorted
    s(s.length / 2)
  }

  /** (1-min, 5-min) system load average from /proc/loadavg — the r18
    * verdict's "measured, not inferred" machine-busyness evidence:
    * three rounds of driver-vs-quiet bench disputes (q174 8 s vs 1 s
    * with identical code) were only adjudicable from per-run arrays and
    * plausibility arguments; a load sample before and after the timed
    * loop makes a contended session self-identifying in the committed
    * evidence. None on non-Linux / unreadable proc (bench still runs).
    */
  private[graft] def loadAvg(): Option[(Double, Double)] =
    try {
      val parts = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.US_ASCII).split("\\s+")
      Some((parts(0).toDouble, parts(1).toDouble))
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // clamp: 0/negative would leave `times` empty and the median index out of bounds
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // 2x cores, NOT 1x (r19): partitions = cpus schedules every stage as
    // exactly one task wave, so one core stolen by another process
    // stretches the whole stage end-to-end — the mechanism behind three
    // rounds of 3-8x driver-session inflations on the heavy gram/shingle
    // stages (r18 verdict "What's wrong #1"). At 2x, a late task's slot
    // picks up the next pending task instead of idling (rebalance
    // headroom), AQE coalesces the small stages back to wave size, and
    // the quiet-session cost is noise-level (A/B in SCALING.md §"Bench
    // robustness"). Env-overridable for re-running the A/B.
    val shufflePartitions = sys.env.getOrElse(
      "SPARK_GRAFT_SHUFFLE_PARTITIONS", (cpus.toInt * 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.silenceTinyWindowWarning() // AFTER setLogLevel: setAllLevels would clobber it
    Logs.silenceCheckpointReleaseWarning()
    // shared-artifact pre-build, timed and reported SEPARATELY: the
    // FrameMemo edge lists (LSH pairs, both k-NN graphs, jaccard/minhash
    // pair graphs) are built once and read by many queries, so inside
    // the per-query loop the one run that builds is discarded by the
    // median — without this line the build cost would be billed to no
    // query at all and a pair-build regression would be invisible in the
    // recorded bench evidence. This is the amortized "build the layout"
    // step of the stored-edge-list contract, priced honestly.
    // only when the memo will actually retain the artifacts: on a
    // non-memoizable dir the pre-build would be discarded and every
    // consumer would rebuild per run anyway — pre-paying would bill the
    // same work twice and the note would falsely claim memoization
    // a FAILED build must not fold its partial elapsed time into the
    // total under the "memoized" label: the memo is unpopulated, every
    // consumer rebuilds per run (billed in their own medians), and the
    // note would falsely claim amortization. Report the failure as its
    // own marker instead; the root cause still surfaces as query errors.
    // The build set runs as PARALLEL chains (r18): each chain orders its
    // internal artifact dependencies (a memo build may read an earlier
    // memo in the same chain), chains are mutually independent, and the
    // Spark scheduler interleaves their jobs across the 32 cores a
    // single sequential build chain left mostly idle (measured 45 s
    // sequential → the slowest chain's wall-clock in parallel). A race
    // on a cross-chain memo (FrameMemo putIfAbsent) at worst builds
    // twice and keeps one — never a wrong result. Any chain failure →
    // the same shared_build FAILED marker as before.
    // tiny untimed SESSION-INIT warmup BEFORE the build window (r20
    // ADVICE low): since the q16 warmup moved after the build (r19 #4),
    // shared_build_sec absorbed first-job costs that are session init —
    // scheduler spin-up, parquet reader, shuffle machinery, codegen
    // plumbing — not artifact-build work, which skewed cross-round build
    // comparisons. One small scan+shuffle here pays that once, outside
    // both the build window and every timed region. The q16 warmup after
    // the build keeps its original job (absorb the build's tail).
    try exec(spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count())
    catch { case _: Throwable => () }
    val (sharedBuildSec, sharedBuildFailed, chainSecs) =
      if (!ops.FrameMemo.memoizable(sfDir)) (0.0, false, Seq.empty[(String, Double)])
      else {
        val tB = System.nanoTime()
        // NAMED chains, each timed on its own (r19 verdict #1): the one
        // scalar shared_build folded 25+ artifact builds across 7
        // parallel chains, so a 9x-inflated build round (218 s driver vs
        // 24.6 s committed) could not be attributed to a chain from
        // committed evidence. Per-chain wall times go to BENCH_DETAIL
        // ("shared_build_chains") and the slowest chain's name to the
        // stdout line ("sbc"). Chain wall-clock overlaps (they run in
        // parallel), so Σ chains ≥ shared_build_sec by design — the map
        // answers "WHICH chain was slow", the scalar "how long did the
        // build window stall the session".
        val chains: Seq[(String, () => Unit)] = Seq(
          // ANN graphs + anchors + method frames (ordered: the top5
          // frames and hybrid read the memoized anchors/pair frame)
          "ann" -> (() => {
            ops.SimilaritySearch.knnGraphLsh(spark, sfDir) // + LSH pair frame
            ops.SimilaritySearch.knnGraphExact(spark, sfDir)
            ops.SimilaritySearch.knnExactTop5(spark, sfDir) // q30/q117 anchor
            ops.SimilaritySearch.knnLshTop5(spark, sfDir)
            ops.Retrieval.hybridRanked(spark, sfDir)
          }),
          // the IVF top-5 build on its own chain (r21): it reads no other
          // ann artifact (k-means + assignment over the raw embeddings),
          // and it is the one store-EXCLUDED rebuild left in a warm
          // session (float-mean centroids — ArtifactStore scaladoc), so
          // in the r20 shape it serialized behind the ann chain's five
          // warm store reads and set the whole warm build window's wall
          // (ann 10.2 s vs ≤7 s every other chain). On its own chain the
          // warm wall is the ivf build alone.
          "ivf" -> (() => {
            ops.SimilaritySearch.knnIvfTop5(spark, sfDir)
          }),
          // text dedup: pair graphs, then the component/method frames
          // q28/q49/q208 read
          "dedup" -> (() => {
            ops.Dedup.jaccardPairs(spark, sfDir, threshold = 0.2)
            ops.Dedup.minhashLshPairs(spark, sfDir, threshold = 0.2)
            ops.Dedup.lshGroupRows(spark, sfDir)
            ops.Dedup.simhashPairs(spark, sfDir)
            // q221/q225's visual pair frame (reads no other memo)
            ops.ImageHash.dhashPairs(spark, sfDir)
            // q108's prefix-filtered exact pair frame (r21)
            ops.Dedup.prefixJaccardPairsStored(spark, sfDir, 4, 5)
          }),
          // PQ model + codes + IVF-PQ index + memoized search frame
          "pq" -> (() => {
            exec(ops.PqOps.pqCodes(spark, sfDir))
            ops.PqOps.ivfPqSearch(spark, sfDir)
            // q191's cell-bounded kNN edge list (r21; reads the pq_codes
            // memo built above — same-chain ordering)
            ops.LabelProp.cellKnn(spark, sfDir)
          }),
          // DSIR score table + the embedding Gram (q157/q160, q210/q214)
          "dsir_gram" -> (() => {
            ops.Dsir.importanceScores(spark, sfDir)
            ops.PowerIteration.gramOf(spark, sfDir)
            // q197's df-capped copy-mass table (r22): reads only
            // `documents`, no gram-family memo — placed on the lightest
            // chain to keep the cold build window balanced
            ops.CopyMass.cappedMass(spark, sfDir)
          }),
          // the corpus gram/fingerprint asset set: raw stream first,
          // then its df-capped postings and the winnowed fingerprints
          "chargram" -> (() => {
            ops.Winnowing.gramFrame(spark, sfDir)
            ops.ExactSubstr.keptGrams(spark, sfDir)
            ops.Winnowing.fingerprints(spark, sfDir)
            // q155's kept grouped posting (r22; reads the fingerprints
            // memo built above — same-chain ordering)
            ops.Winnowing.keptFpPosting(spark, sfDir)
            // the q224 snapshot-maintenance assets: the stored base
            // manifest + the from-scratch audit totals (reads the
            // gramFrame memo built above — same-chain ordering)
            ops.ArtifactDelta.baseManifest(spark, sfDir)
            ops.ArtifactDelta.scratchTotals(spark, sfDir)
          }),
          // the word-shingle digest asset set (r19): per-n (split,
          // digest) membership tables + the 3-gram df table — read by
          // q179/q180/q219 instead of re-exploding the corpus per call
          "shingle" -> (() => {
            ops.NoveltyCurve.Ns.foreach(n =>
              ops.ShingleStore.splitGrams(spark, sfDir, n))
            ops.ShingleStore.df3(spark, sfDir)
            // the q227 snapshot-maintenance assets (r20): the stored
            // base split-count manifest + the from-scratch flag-table
            // audit totals (reads the splitGrams(3) memo built above —
            // same-chain ordering)
            ops.ShingleDelta.baseCounts(spark, sfDir)
            ops.ShingleDelta.scratchFlagTotals(spark, sfDir)
            // the r19 q220-variance fix: quality scores + the vocab
            // count table as stored columns (read by q98/q220)
            ops.CorpusReports.qualityScored(spark, sfDir)
            ops.TextAnalysis.tokenCounts(spark, sfDir)
          }),
          // the r19 curation/decontamination asset set: scored docs
          // (q50/q52/q69), the 5-gram posting + doc catalog
          // (q65/q66/q69/q163), per-doc repetition signals (q64/q69)
          "curation" -> (() => {
            ops.TextAnalysis.scoredDocs(spark, sfDir)
            ops.CorpusSignals.fiveGramMeta(spark, sfDir)
            ops.CorpusSignals.fiveGramPosting(spark, sfDir)
            ops.CorpusSignals.repetitionSignals(spark, sfDir)
            // the trained-BPE artifact (r21): q136/q141 read it instead
            // of re-training per run; q135/q140 still train live.
            // Placed here (the lightest chain) to keep the cold build's
            // wall-clock balanced.
            ops.LmTokenizer.trainedBpe(spark, sfDir)
            // q153's NB prediction frame (r21): q153 presents it,
            // q178/q185 derive their eval reports from it
            ops.NaiveBayes.sourcePredictions(spark, sfDir)
          }))
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        // each chain is awaited through its own .recover, NOT
        // Future.sequence: sequence fails fast on the first chain error,
        // which would start timeQueries while surviving chains still run
        // build jobs on the shared scheduler (their work would inflate the
        // first timed queries' runs_sec) and stamp sharedBuildSec at first
        // failure instead of when work actually stops. Mapping through
        // recover makes every future terminal-complete, so the awaits
        // drain ALL chains before the timed loop begins.
        val settled: Seq[Either[String, (String, Double)]] = chains
          .map { case (name, c) => Future {
            val t0 = System.nanoTime()
            c()
            name -> (System.nanoTime() - t0) / 1e9
          }.map(Right(_): Either[String, (String, Double)])
            .recover { case _: Throwable => Left(name) } }
          .map(f => Await.result(f, Duration.Inf))
        val ok = settled.forall(_.isRight)
        val sec = (System.nanoTime() - tB) / 1e9
        if (ok) (sec, false, settled.collect { case Right(ns) => ns })
        else (0.0, true, Seq.empty[(String, Double)])
      }
    // untimed warmup AFTER the shared build (r19 verdict #4): it used to
    // run first, so the first timed queries (q01/q02 in sorted order)
    // inherited whatever residual IO/JIT tail the 7-chain build left —
    // the driver's q02 showed monotonically decreasing [9.54, 7.23,
    // 3.56] run arrays from exactly this adjacency. Placed here it
    // absorbs both session init AND the build's tail before anything is
    // timed.
    try SparkEntry.queries.get("q16_dim_region").foreach(fn => exec(fn(spark, sfDir)))
    catch { case _: Throwable => () }
    // focused re-runs for plan iteration / the contention A/B: a
    // comma-separated list of query names (full, or the qNN stem before
    // the first underscore — "q22" selects q22_*, NOT q220-q226; bare
    // startsWith matching silently over-selected exactly that way, r19
    // ADVICE). NEVER set by the driver — round evidence is always the
    // full registry ("nq" on the line records the size).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val timedSet = only.fold(SparkEntry.queries)(ks =>
      SparkEntry.queries.filter { case (k, _) =>
        ks.exists(p => k == p || k.startsWith(p + "_")) })
    // a filter that selects nothing is a typo, and timing zero queries
    // would silently write an empty .subset detail file — fail loudly
    if (only.isDefined && timedSet.isEmpty) {
      System.err.println(s"[bench] SPARK_GRAFT_BENCH_ONLY=" +
        s"${only.get.mkString(",")} selected no queries; " +
        "names must match a full query name or its qNN stem")
      spark.stop()
      sys.exit(2)
    }
    val loadPre = loadAvg()
    val residPre = blockResidency(spark)
    val results = timeQueries(spark, sfDir, timedSet, runs)
    val residPost = blockResidency(spark)
    val loadPost = loadAvg()
    // a BENCH_ONLY subset run writes its detail to a SIDE file:
    // BENCH_DETAIL.json is committed round evidence covering the full
    // registry (RegistryDocsSpec pins it), and a focused iteration run
    // must never clobber it with a partial map
    val detailPath = if (only.isEmpty) DetailFile else DetailFile + ".subset"
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      renderDetail(results, sfDir, runs, sharedBuildSec,
        loadPre, loadPost, shufflePartitions.toInt, chainSecs,
        streaming.StreamingMetrics.snapshot,
        Some((ops.ArtifactStore.codeFingerprint,
          ops.ArtifactStore.stats._1, ops.ArtifactStore.stats._2)))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(renderLine(results, sfDir, runs, sharedBuildSec, sharedBuildFailed,
      Some((residPre, residPost)), (loadPre, loadPost),
      chainSecs.sortBy(-_._2).headOption.map(_._1)))
    spark.stop()
    val failed = results.collect { case (k, Left(_)) => k }
    if (failed.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }

  /** One JSON result line. The harness that captures stdout keeps only
    * the LAST ~2000 characters (including sbt's trailing "[success] ..."
    * lines), so an over-long line is unparseable forever — BENCH_r05–r07
    * all show "parsed": null from exactly this. Per-query keys are the
    * unique qNN prefix (full names in QUERIES.md), times rounded to
    * deciseconds below 10 s / whole seconds above (run-to-run noise is
    * ~30%, so finer digits are noise);
    * BenchHarnessSpec asserts the line for the FULL registered surface
    * stays under budget, so adding queries past the window fails the
    * build instead of silently zeroing the round's bench evidence.
    */
  def renderLine(results: Seq[(String, Either[String, Seq[Double]])],
                 sfDir: String, runs: Int,
                 sharedBuildSec: Double = 0.0,
                 sharedBuildFailed: Boolean = false,
                 residency: Option[((Int, Long), (Int, Long))] = None,
                 load: (Option[(Double, Double)], Option[(Double, Double)]) = (None, None),
                 slowestChain: Option[String] = None): String = {
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    // DECISECONDS below 10 s, WHOLE seconds above: run-to-run noise is
    // ~30%, so finer digits were pure noise that cost line width × every
    // registered key — and the worst-case width model (every key at max
    // width) must keep the whole line inside the capture window. This
    // caps any per-query time at 3 chars ("9.9" / "999"; a query beyond
    // ~17 min can't happen, the whole run is ~5 min). The r15 line hit
    // 1801 chars at 155 queries with 2dp; this buys ~150 chars of
    // headroom for the registry to keep growing. The 9.95 split point
    // keeps the rounding itself from widening ("9.96" must not print
    // "10.0").
    def ms(v: Double): String = String.format(java.util.Locale.ROOT,
      if (v >= 9.95) "%.0f" else "%.1f", java.lang.Double.valueOf(v))
    // "q112_dedup_segments" -> "112": the q is constant information and
    // one char per key is real budget (full names in QUERIES.md)
    val shortKeys = results.map { case (k, _) =>
      k -> k.takeWhile(_ != '_').stripPrefix("q").dropWhile(_ == '0')
    }.toMap
    val short = if (shortKeys.values.toSet.size == shortKeys.size) shortKeys
                else shortKeys.keys.map(k => k -> k).toMap // collision: keep full names
    // failures must not blow the window either: a failed query appears
    // ONLY as its short key in errors (exception details are in the sbt
    // log), successes only in queries — so every success/failure mix
    // renders shorter than the all-success line the spec budgets
    // TOP-[[Shown]] SLOWEST only on the line (registry growth outran
    // the capture window at ~186 queries even with every byte-trim —
    // 10.7 bytes/query × N has to lose to a fixed ~2000-char window
    // eventually): the slowest lines are the ones the per-round plan
    // audit reads, the total still covers EVERY query, "nq" records
    // the full registry size, and the complete per-query map is
    // written to BENCH_DETAIL.json in the repo (committed evidence).
    val successes = results.collect { case (k, Right(ts)) => k -> median(ts) }
    val shown = successes.sortBy { case (k, v) => (-v, k) }.take(Shown)
      .sortBy(_._1)
    val qs = shown.map { case (k, v) => "\"" + short(k) + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(_)) => k }
    val total = successes.map(_._2).sum
    // failures are never truncated silently: the first Shown keys are
    // named, the rest counted — a regression round must still fit
    val errJson =
      if (failed.isEmpty) ""   // the empty array was 12 budgeted bytes
      else failed.take(Shown).map("\"" + short(_) + "\"")
        .mkString(""","errors":[""", ",", "]") +
        (if (failed.size > Shown) s""","errx":${failed.size - Shown}""" else "")
    // every byte of the note is budgeted: the registry keeps growing
    // (~10 chars/query) and this line must stay inside the harness's
    // tail-capture window — semantics documented in QUERIES.md/README
    // (noop-sink action, median-of-runs, qNN keys, total incl build);
    // the ";qNN" tag was dropped at 178 queries for line budget
    val note = "m" + runs +
      (if (sharedBuildFailed) ";shared_build FAILED" else "")
    // shared_build is INSIDE the total (steady-state medians + one
    // amortized build = what a full pass actually costs) and also broken
    // out so a build regression is visible on its own
    val totalAll = total + sharedBuildSec
    // "sbc" = slowest build chain's name (~16 chars, budgeted in
    // BenchHarnessSpec): the one-word answer to "which chain stalled
    // this session's build window" — per-chain seconds in BENCH_DETAIL
    val buildJson =
      if (sharedBuildFailed) ""","shared_build_error":true"""
      else if (sharedBuildSec > 0)
        s""","shared_build":${ms(sharedBuildSec)}""" +
          slowestChain.fold("")(n => s""","sbc":"$n"""")
      else ""
    // block-store residency [cachedRDDs, MiB] before/after the timed
    // loop — ~36 chars, budgeted in BenchHarnessSpec's width model
    val residJson = residency.map { case ((n0, m0), (n1, m1)) =>
      s""","blk":[[$n0,$m0],[$n1,$m1]]"""
    }.getOrElse("")
    // 1-min loadavg sampled before/after the timed loop (~19 chars,
    // budgeted in BenchHarnessSpec) — the machine-busyness evidence that
    // turns a "driver session read 3-8x slower" dispute into a one-line
    // diagnosis. Full (1m, 5m) pairs go to BENCH_DETAIL.
    val loadJson = (load._1, load._2) match {
      case (Some((a, _)), Some((b, _))) =>
        s""","load":[${ms(a)},${ms(b)}]"""
      case _ => ""
    }
    s"""{"metric":"total","value":${ms(totalAll)},"unit":"sec","nq":${results.size},"queries":$qs$buildJson$residJson$loadJson$errJson,"sf":"${sfDir.split('/').last}","note":"$note"}"""
  }

  /** Per-query entries kept on the stdout line (slowest first by time);
    * the full map goes to [[DetailFile]].
    */
  private[graft] val Shown = 40

  /** Committed-evidence companion to the budget-capped stdout line:
    * the COMPLETE per-query median map + errors, one pretty-printed
    * JSON doc. Written by `main` next to the repo root.
    */
  private[graft] val DetailFile = "BENCH_DETAIL.json"

  /** Minimal JSON string escaper for the detail file. timeQueries only
    * stores `getClass.getSimpleName` today, but renderDetail must stay
    * valid JSON if a future change routes exception MESSAGES (quotes,
    * backslashes, newlines) through the error channel.
    */
  private[graft] def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => "\\u%04x".format(c.toInt)
      case c             => c.toString
    }

  private[graft] def renderDetail(results: Seq[(String, Either[String, Seq[Double]])],
                                  sfDir: String, runs: Int,
                                  sharedBuildSec: Double,
                                  loadPre: Option[(Double, Double)] = None,
                                  loadPost: Option[(Double, Double)] = None,
                                  shufflePartitions: Int = 0,
                                  chainSecs: Seq[(String, Double)] = Seq.empty,
                                  streamingRuns: Map[String, streaming.StreamingMetrics.Run] = Map.empty,
                                  storeStats: Option[(String, Int, Int)] = None): String = {
    def ms(v: Double): String = String.format(java.util.Locale.ROOT,
      "%.2f", java.lang.Double.valueOf(v))
    // runs_sec is the RAW array in execution order (median derived) —
    // the committed evidence that distinguishes "all three runs slow"
    // (contended session) from "first run slow, rest quiet" (warmup /
    // first-touch artifact) without needing a replay session
    val qs = results.collect { case (k, Right(ts)) =>
      s"""    "$k": {"median_sec": ${ms(median(ts))}, "runs_sec": [${ts.map(ms).mkString(", ")}]}""" }
      .mkString(",\n")
    val errs = results.collect { case (k, Left(e)) =>
      s"""    "$k": "${jsonEscape(e)}"""" }.mkString(",\n")
    // loadavg (1m, 5m) before/after the timed loop: null when
    // unavailable. A post-loop 5-min load far above ~the wave width
    // tells the reader THIS session's medians carry machine contention,
    // without a replay session (the r16-r18 adjudication gap).
    def loadJson(l: Option[(Double, Double)]): String =
      l.map { case (a, b) => s"[${ms(a)}, ${ms(b)}]" }.getOrElse("null")
    // per-chain wall times (execution overlaps: the chains run in
    // parallel, so these attribute WHERE a slow build window went —
    // they do not sum to shared_build_sec)
    val chainsJson = chainSecs
      .map { case (n, t) => s""""${jsonEscape(n)}": ${ms(t)}""" }
      .mkString("{", ", ", "}")
    // the streaming family's engine counters from each query's LAST
    // replay: a slow streaming line with a normal batch count and
    // commit time is host IO/scheduling (the session-random jitter
    // victim pattern), proven from this file alone; an abnormal count
    // names the engine-side cause. trigger_ms is what the engine itself
    // billed to batch execution — the gap to the run time is harness
    // start/stop cost.
    val streamingJson = streamingRuns.toSeq.sortBy(_._1).map { case (k, r) =>
      s"""    "$k": {"batches": ${r.batches}, "input_rows": ${r.inputRows}, """ +
        s""""state_commit_ms": ${r.stateCommitMs}, """ +
        s""""state_update_ms": ${r.stateUpdateMs}, "trigger_ms": ${r.triggerMs}}"""
    }.mkString(",\n")
    s"""{
       |  "sf": "${sfDir.split('/').last}",
       |  "runs": $runs,
       |  "shared_build_sec": ${ms(sharedBuildSec)},
       |  "shared_build_chains": $chainsJson,
       |  "loadavg_pre": ${loadJson(loadPre)},
       |  "loadavg_post": ${loadJson(loadPost)},
       |  "shuffle_partitions": $shufflePartitions,
       |  "artifact_store": ${storeStats.map { case (fp, h, m) =>
            s"""{"fingerprint": "${jsonEscape(fp)}", "hits": $h, "misses": $m}"""
          }.getOrElse("null")},
       |  "streaming": {
       |$streamingJson
       |  },
       |  "queries": {
       |$qs
       |  },
       |  "errors": {
       |$errs
       |  }
       |}""".stripMargin
  }
}
