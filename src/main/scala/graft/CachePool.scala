package graft

import org.apache.spark.sql.DataFrame

/** Session-lifecycle registry for DataFrames the graft operators persist
  * internally (e.g. [[graft.operators.Dedup.stagedShingles]]).
  *
  * Spark cannot auto-unpersist a frame when its consumers finish — the
  * consumers are lazy plans, and CacheManager keeps an entry alive until
  * someone calls `unpersist`. Operators that persist intermediates
  * therefore register them here, and pipeline drivers release them at
  * pipeline boundaries with [[releaseAll]] (the graft harnesses — Verify
  * and Bench — release after every query; a long-lived 100 TB session
  * running many corpora should do the same between pipelines, or the
  * staged frames of every corpus it ever touched stay resident for the
  * session's lifetime — measured in round 4 as a multi-× slowdown of
  * later queries sharing the session).
  *
  * `releaseAll` is idempotent and safe while consumers are still lazy:
  * unpersisting only drops the cached blocks; any plan that still
  * references the frame recomputes it from lineage.
  */
object CachePool {

  private val frames = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Track a persisted frame for later release; returns it unchanged. */
  def register(df: DataFrame): DataFrame = synchronized {
    frames += df
    df
  }

  /** Number of frames currently tracked (test observability). */
  def trackedCount: Int = synchronized(frames.size)

  /** Unpersist every tracked frame and clear the registry. Failures on
    * individual frames (e.g. a stopped session) never mask the rest. */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    frames.foreach { f =>
      try f.unpersist(blocking)
      catch { case _: Throwable => () }
    }
    frames.clear()
  }
}
