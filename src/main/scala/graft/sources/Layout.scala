package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.StarSchema.sumMoney

/** Physical table layout for scale: partitioned and bucketed parquet.
  *
  * The reference writes flat single-file parquet per gold table
  * (`src/20_gold/silver_to_gold.py:36-40` — fine at laptop scale); at
  * 100 TB layout IS the optimizer:
  *
  *   - '''partitioning''' (hive-style `partitionBy` directories) turns
  *     time/tenant predicates into directory pruning — a scan of 7 days
  *     out of 10 years reads 7 directories, not 3650, before a single
  *     row group opens;
  *   - '''bucketing''' pre-shuffles a table ONCE at write time into a
  *     fixed hash layout, so every subsequent join or aggregation on
  *     the bucket key runs with zero exchange — the shuffle a fact⋈fact
  *     join would otherwise pay per-query is paid once, at load.
  *
  * Both writers repartition by the layout key first so each output
  * task owns its whole bucket/partition: one file per bucket (which
  * also lets the scan publish per-bucket sort order — `sortBy` survives
  * only when buckets are single-file), no small-file explosion from
  * task x partition fan-out.
  */
object Layout {

  /** Cache tag for a derived layout: hash of the source dir PATH plus a
    * CONTENT fingerprint (size + mtime) of the source tables it was
    * built from. The driver regenerates testdata between rounds under
    * the same paths — a path-only tag would let a stale cached layout
    * (committed `_SUCCESS` from the previous round's bytes) silently
    * serve old rows against a fresh oracle. A regeneration changes
    * size/mtime → new tag → rebuild; the previous round's dirs just age
    * out of /tmp.
    */
  private[sources] def tag(d: String, tables: String*): String = {
    // Hadoop FS, not java.io.File: a table "file" may be a directory of
    // part files (rewriting one part in place does NOT bump the dir
    // mtime, so a dir-level stat would serve stale bytes), and the path
    // may live on a non-local filesystem. Fingerprint = every file's
    // (name, size, mtime) under the path, recursively. A MISSING source
    // table fails loudly here — java.io.File silently yielded 0:0 and
    // cached a layout of nothing.
    val conf = new org.apache.hadoop.conf.Configuration()
    val fp = tables.sorted.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$d/$t.parquet")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p))
        throw new java.io.FileNotFoundException(
          s"layout source table missing: $p — refusing to fingerprint an absent table")
      val it = fs.listFiles(p, true)
      val files = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        files += s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
      }
      s"$t:${files.sorted.mkString(",")}"
    }.mkString("|")
    java.lang.Integer.toHexString((d + "|" + fp).hashCode & 0x7fffffff)
  }
  private[sources] def tmpRoot: String = System.getProperty("java.io.tmpdir")

  /** A committed write left Spark's _SUCCESS marker behind. */
  private[sources] def hasSuccess(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Write `df` as a bucketed+sorted single-file-per-bucket parquet
    * table registered in the catalog (bucket metadata lives in the
    * catalog, so reads must go through `spark.table`). `sortBy` buys
    * row-group min/max locality and near-linear local re-sorts — Spark
    * >=3 no longer feeds bucket sort order to the planner (SPARK-28583),
    * so joins still place a partition-local SortExec above the scan; the
    * exchange elimination is the part that matters at scale.
    */
  def writeBucketed(s: SparkSession, df: DataFrame, name: String,
                    path: String, buckets: Int, key: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    // repartition on the bucket key with numPartitions = numBuckets uses
    // the same murmur3-pmod layout as the bucket-id function, so each
    // task holds exactly one bucket -> exactly one file per bucket
    df.repartition(buckets, col(key))
      .write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(name)
  }

  /** customer⋈orders + per-customer rollup over co-bucketed tables:
    * both sides land in the same 16-bucket hash layout on custkey, so
    * the join AND the aggregation run with zero shuffle exchange (only
    * partition-local sorts) — LayoutSpec pins that plan shape. The
    * orderBy is presentation-only (oracle hash contract).
    */
  /** Where the co-bucketed customer/orders layout for `d` lives — the
    * single source of truth for the path (LayoutSpec asserts on the
    * files; deriving the tag twice is how a stale copy passes).
    */
  private[graft] def bucketedRoot(d: String): String =
    bucketedRootFor(tag(d, "customer", "orders"))

  private def bucketedRootFor(t: String): String =
    s"$tmpRoot/graft_bucketed_$t"

  def bucketedOrdersPerCustomer(s: SparkSession, d: String,
                                buckets: Int = 16): DataFrame = {
    // derive the tag ONCE and build the root from it: tag() is a
    // recursive FS listing of both source tables, so computing it twice
    // per call doubles that I/O for nothing
    val t = tag(d, "customer", "orders")
    val root = bucketedRootFor(t)
    // bucketing's whole point is that the layout shuffle is paid ONCE at
    // load, then every query rides it for free — so the load is
    // idempotent: rebuild only when the catalog entry or the committed
    // files are missing (source testdata is immutable per directory)
    if (!(s.catalog.tableExists(s"graft_customer_b$t") &&
        s.catalog.tableExists(s"graft_orders_b$t") &&
        hasSuccess(s, s"$root/customer") && hasSuccess(s, s"$root/orders"))) {
      writeBucketed(s, Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        s"graft_customer_b$t", s"$root/customer", buckets, "c_custkey")
      writeBucketed(s, Tables.orders(s, d).select("o_custkey", "o_totalprice"),
        s"graft_orders_b$t", s"$root/orders", buckets, "o_custkey")
    }
    val c = s.table(s"graft_customer_b$t")
    val o = s.table(s"graft_orders_b$t")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("total_spent"))
  }

  /** Events re-laid-out hive-partitioned by event day (the gold-layer
    * layout for an append-only fact: each day's load lands in its own
    * directory, compactable and prunable independently).
    */
  def writeEventsPartitioned(s: SparkSession, d: String): String = {
    val root = s"$tmpRoot/graft_events_parted_${tag(d, "events")}"
    // same load-once contract as the bucketed layout
    if (!hasSuccess(s, root))
      Tables.events(s, d)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(root)
    root
  }

  /** Daily totals over a date slice of the partitioned layout. The
    * range predicate on the partition column never touches row data:
    * it prunes directories at planning time (LayoutSpec asserts the
    * scan selects exactly the 7 matching partitions of 30).
    */
  def prunedDailyTotals(s: SparkSession, root: String,
                        from: String, to: String): DataFrame =
    s.read.parquet(root)
      .filter(col("event_date")
        .between(lit(from).cast("date"), lit(to).cast("date")))
      .groupBy("event_date", "event_type")
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("total_value"))

  /** Compact a flat parquet directory into ceil(bytes/targetBytes)
    * files. The small-files problem is the chronic disease of an
    * append-only lake — a 1000-executor streaming ingest lays down
    * thousands of kilobyte files per day, and every downstream scan
    * then pays a task per file. Compaction is:
    *
    *   - `coalesce`, not `repartition`: narrowing partitions is
    *     shuffle-free — each output task concatenates a handful of
    *     input files;
    *   - sized by actual on-disk bytes, so the output respects the
    *     row-group/file size the scan path wants
    *     (`files.maxPartitionBytes`-aligned);
    *   - swapped in only after the rewrite fully commits (write to a
    *     temp sibling, then two checked renames). A crash at any point
    *     leaves the data REACHABLE: before both renames the original is
    *     live; between them the only copy sits at the hidden `.old`
    *     sibling, and [[recoverCompaction]] (run on entry to every
    *     compact, and over the whole root by compactPartitioned)
    *     restores it. Readers can transiently miss the directory inside
    *     the two-rename window — a table-format commit log is the real
    *     fix at scale; plain-directory swaps can't close that window.
    *
    * Returns the target file count.
    */
  def compact(s: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(path)
    val fs = src.getFileSystem(conf)
    recoverCompaction(fs, src)
    val bytes = fs.getContentSummary(src).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // dot-prefixed siblings: Spark's file listing skips hidden paths, so
    // a concurrent reader of the parent (e.g. the partitioned root mid-
    // per-partition compaction) never sees the in-flight copies
    val tmp = new org.apache.hadoop.fs.Path(
      src.getParent, s".${src.getName}.compacting")
    val old = new org.apache.hadoop.fs.Path(
      src.getParent, s".${src.getName}.old")
    fs.delete(tmp, true)
    s.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    require(fs.rename(src, old), s"compaction swap failed staging $path aside")
    if (!fs.rename(tmp, src)) {
      // roll back so the original stays live rather than hidden
      require(fs.rename(old, src),
        s"compaction swap AND rollback failed: data is at $old")
      throw new IllegalStateException(
        s"compaction swap failed publishing $tmp; original restored at $path")
    }
    fs.delete(old, true)
    n
  }

  /** Repair a crash between compact's two renames: the live dir is gone
    * and the only copy sits at the hidden `.name.old` sibling — restore
    * it. No-op when the live dir exists (its `.old` is then just
    * pre-delete garbage, removed by the next compact).
    */
  private[sources] def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem,
                                         src: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(
      src.getParent, s".${src.getName}.old")
    if (!fs.exists(src) && fs.exists(old))
      require(fs.rename(old, src), s"compaction recovery failed: $old -> $src")
  }

  /** Per-partition compaction over a hive-partitioned root (the q57
    * layout): each `col=value` directory compacts independently — the
    * unit of work the partitioned layout was chosen for (yesterday's
    * directory compacts while today's is still ingesting). Returns
    * (partition dir, file count) per compacted partition.
    */
  def compactPartitioned(s: SparkSession, root: String,
                         targetBytes: Long): Seq[(String, Int)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    // repair any crashed swap FIRST: a hidden '.p.old' whose live
    // sibling is missing IS the data (the crash hit between compact's
    // two renames) — restore it before listing partitions
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".") &&
        st.getPath.getName.endsWith(".old"))
      .foreach { st =>
        val live = new org.apache.hadoop.fs.Path(rootPath,
          st.getPath.getName.stripPrefix(".").stripSuffix(".old"))
        recoverCompaction(fs, live)
      }
    // hidden ('.') and metadata ('_') siblings are NOT partitions — a
    // stale work dir from a crashed run contains '=' in its name and
    // would otherwise be compacted in place, still invisible to readers
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
      .map(st => st.getPath.getName ->
        compact(s, st.getPath.toString, targetBytes))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_bucketed_join" -> ((s, d) =>
      bucketedOrdersPerCustomer(s, d).orderBy("c_custkey")),

    "q57_partition_pruned" -> ((s, d) => {
      val root = writeEventsPartitioned(s, d)
      prunedDailyTotals(s, root, "2024-01-08", "2024-01-14")
        .orderBy("event_date", "event_type")
    }),

    // DYNAMIC partition pruning: q57's pruning works because the date
    // range is a literal the planner sees; here the date set comes from
    // a JOIN against a calendar dim filtered at runtime (weekends), so
    // static pruning is impossible — Spark instead plants a dynamic
    // pruning subquery on the fact's partition column: the dim's
    // broadcast result prunes the fact's directories at execution time.
    // At 100 TB this is the difference between scanning 10 years of an
    // event fact and scanning the ~28% of directories the dim selects
    // — without the query author enumerating dates. LayoutSpec pins the
    // dynamicpruning expression in the plan.
    "q92_dpp_weekend_totals" -> ((s, d) => {
      val root = writeEventsPartitioned(s, d)
      val cal = calendarDim(s, "2024-01-01", 31)
        .filter(col("is_weekend"))
        .select(col("cal_date"))
      s.read.parquet(root)
        .join(cal, col("event_date") === col("cal_date"))
        .groupBy("event_date", "event_type")
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("total_value"))
        .orderBy("event_date", "event_type")
    })
  )

  /** Generated calendar dim: `days` consecutive dates from `start` with
    * a weekend flag — the runtime-filterable side of the q92 DPP join.
    */
  def calendarDim(s: SparkSession, start: String, days: Int): DataFrame =
    s.range(days)
      .select(date_add(lit(start).cast("date"), col("id").cast("int")).as("cal_date"))
      .withColumn("is_weekend", dayofweek(col("cal_date")).isin(1, 7))

  val oracleSql: Map[String, String] = Map(
    "q56_bucketed_join" ->
      """SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin,

    "q92_dpp_weekend_totals" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'
        |  AND dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q57_partition_pruned" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )

  val rowsOnly: Set[String] = Set.empty
}
