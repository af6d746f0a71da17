package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryProgress

/** Engine-side observability for the replayed streaming queries,
  * collected into BENCH_DETAIL so a bench line is self-diagnosing
  * (r19 verdict #3): the stateful-streaming family shows session-random
  * 3–15× victims (q123 10.5 s one session, 2.9 s in the isolation
  * probe) that previously needed a manual replay session to adjudicate.
  * With the per-query micro-batch count and the state-store commit time
  * in committed evidence, a slow line with a NORMAL batch count and
  * commit time is host IO/scheduling, proven from the round's own file;
  * an abnormal batch count or commit time names the engine-side cause.
  *
  * Registry semantics: one entry per query name, LAST completed replay
  * wins — Bench runs each query 3 times and the retained entry describes
  * the final run (the run arrays in BENCH_DETAIL carry the timing
  * spread; this carries the engine counters that explain it). Lives for
  * the JVM, like FrameMemo — bench/verify/tests each see their own runs.
  */
object StreamingMetrics {

  /** Counters from one completed replay:
    *   - `batches`: progress entries with input rows (the replay's real
    *     micro-batch count; AvailableNow emits trailing empty batches)
    *   - `inputRows`: total rows ingested
    *   - `stateCommitMs`: Σ state-store commitTimeMs across batches and
    *     operators — the state machinery's own cost
    *   - `stateUpdateMs`: Σ allUpdatesTimeMs + allRemovalsTimeMs
    *   - `triggerMs`: Σ durationMs("triggerExecution") — wall time the
    *     engine itself billed to batch execution; the gap between the
    *     bench run time and this is harness cost (query start/stop,
    *     checkpoint dir setup), not stream processing
    */
  final case class Run(batches: Int, inputRows: Long, stateCommitMs: Long,
                       stateUpdateMs: Long, triggerMs: Long)

  private val runs =
    new java.util.concurrent.ConcurrentHashMap[String, Run]()

  def record(name: String, progress: Seq[StreamingQueryProgress]): Unit = {
    val nonEmpty = progress.filter(_.numInputRows > 0)
    val ops = progress.flatMap(_.stateOperators)
    val trigger = progress.map { p =>
      val d = p.durationMs.get("triggerExecution")
      if (d == null) 0L else d.longValue()
    }.sum
    runs.put(name, Run(
      batches = nonEmpty.size,
      inputRows = nonEmpty.map(_.numInputRows).sum,
      stateCommitMs = ops.map(_.commitTimeMs).sum,
      stateUpdateMs = ops.map(o => o.allUpdatesTimeMs + o.allRemovalsTimeMs).sum,
      triggerMs = trigger))
  }

  def snapshot: Map[String, Run] = {
    import scala.jdk.CollectionConverters._
    runs.asScala.toMap
  }
}
