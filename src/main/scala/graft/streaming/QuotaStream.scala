package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming per-source admission quota — [[graft.operators.Sampling
  * .groupQuota]]'s streaming twin: admit at most `quota` documents per
  * source over the LIFE of the stream ("stop ingesting src7 once we
  * hold 1M of its docs"), deciding incrementally as batches arrive
  * instead of re-scanning an ever-growing corpus.
  *
  * State contract (the 100 TB bound): ONE long per source — the
  * admitted count so far. |sources| rows of state total, independent of
  * stream length; no timeout needed because the state is the quota's
  * own bookkeeping, not a window.
  *
  * Determinism under replay: within a batch each source's rows are
  * admitted in ascending `idCol` order (the iterator is sorted before
  * the cut), so a micro-batch recovery replay admits the IDENTICAL
  * subset — the same retry-safety argument as the hash-based samplers.
  * Batch-sort cost is per (source × batch), bounded by batch size.
  *
  * Emitted: one row per ADMITTED doc, `(source, id, admit_rank)` with
  * `admit_rank` the source's running 1-based admission index — update
  * output mode (each row emitted exactly once, in its deciding batch).
  */
object QuotaStream {

  def admit(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      quota: Long): Dataset[(String, Long, Long)] = {
    require(quota >= 0, "quota must be non-negative")
    import docs.sparkSession.implicits._
    docs
      .select(col(sourceCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[(String, Long)],
         state: GroupState[Long]) => {
          val used = state.getOption.getOrElse(0L)
          val room = math.max(0L, quota - used)
          val take = rows.map(_._2).toArray.sorted.take(
            math.min(room, Int.MaxValue).toInt)
          if (take.nonEmpty) state.update(used + take.length)
          take.iterator.zipWithIndex.map { case (id, i) =>
            (source, id, used + i + 1)
          }
        })
  }
}
