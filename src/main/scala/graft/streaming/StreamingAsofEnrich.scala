package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming sibling of
  * [[graft.operators.TemporalJoin.asofJoin]]: a single input stream
  * carries both sides (reference VERSIONS as `right = Some(v)`, lookup
  * events as `right = None`), and every lookup event is emitted enriched
  * with the latest version at-or-before its event time for its key —
  * point-in-time-correct feature lookup at ingest, the streaming form of
  * a slowly-changing-dimension join.
  *
  * State per key: the most recent `maxVersions` (time, value) versions,
  * kept sorted — `flatMapGroupsWithState` is exactly Spark's tool for
  * this (KeyValueGroupedDataset custom state, same family as the
  * engine's sessionization). Per micro-batch, a key's events process in
  * (time, right-first) order, so intra-batch disorder and exact
  * timestamp ties resolve identically to the batch operator.
  *
  * Documented semantics bounds (inherent to append-mode streaming
  * enrichment, not implementation gaps):
  *  - a version arriving in a LATER micro-batch than a lookup it should
  *    have served cannot retro-correct the already-emitted row (append
  *    mode has no retractions); feed versions promptly or re-enrich
  *    offline with the batch operator;
  *  - a lookup older than the oldest retained version enriches against
  *    what remains (or null) — `maxVersions` is the retention knob, the
  *    same bounded-state discipline as watermarked aggregations. State
  *    size is O(keys × maxVersions), independent of stream length;
  *  - several versions sharing one (key, time) keep the last processed
  *    (arrival order — undefined across partitions): pre-aggregate to
  *    one version per (key, time), the same contract as the batch
  *    operator. */
object StreamingAsofEnrich {

  /** One input event: a reference version when `right` is set, a lookup
    * otherwise. */
  case class AsofInput(key: Long, t: Long, right: Option[Double])

  /** Enriched lookup: the matched version's time and value (None when
    * no version at-or-before `t` was retained). */
  case class AsofOutput(key: Long, t: Long, asofT: Option[Long], asofValue: Option[Double])

  /** Internal state row — public only because the codegen'd encoder
    * accesses its members from generated Java (a `private` state class
    * fails Janino compilation). Parallel arrays, ascending time. */
  case class AsofState(times: Array[Long], values: Array[Double])

  /** Enrich the lookup events of `in` against its own version events.
    * Works on a streaming OR batch Dataset (the batch form is the test
    * twin: identical semantics to `asofJoin` when nothing is late). */
  def enrich(in: Dataset[AsofInput], maxVersions: Int = 32): Dataset[AsofOutput] = {
    implicit val stateEnc: Encoder[AsofState] = Encoders.product[AsofState]
    implicit val outEnc: Encoder[AsofOutput] = Encoders.product[AsofOutput]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    in.groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofOutput](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, events, state) =>
        // rights sort before lefts at equal t => exact matches included,
        // same tie rule as the batch operator
        val ordered = events.toSeq.sortBy(e => (e.t, e.right.isEmpty))
        var versions: List[(Long, Double)] = state.getOption
          .map(s => s.times.zip(s.values).toList).getOrElse(Nil)
        val out = Seq.newBuilder[AsofOutput]
        ordered.foreach { e =>
          e.right match {
            case Some(v) =>
              versions = ((e.t, v) :: versions.filterNot(_._1 == e.t))
                .sortBy(_._1).takeRight(maxVersions)
            case None =>
              val m = versions.takeWhile(_._1 <= e.t).lastOption
              out += AsofOutput(key, e.t, m.map(_._1), m.map(_._2))
          }
        }
        state.update(AsofState(versions.map(_._1).toArray, versions.map(_._2).toArray))
        out.result().iterator
      }
  }
}
