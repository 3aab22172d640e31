package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing — the pre-training batching step that concatenates
  * documents into fixed token-budget bins so a training run wastes no
  * context-window padding. Greedy contiguous packing: walk the docs of
  * a group in id order and open a new bin whenever the next doc would
  * overflow the budget (a doc larger than the whole budget gets a bin
  * of its own).
  *
  * The walk is inherently sequential, so it runs per GROUP (shard key:
  * source, date, language, ...) via `flatMapGroups` — Spark's tool for
  * bounded per-key imperative folds. Parallelism = number of groups;
  * each group's docs must fit one task (the shard-key contract — same
  * bound a training shard has to satisfy anyway). Determinism: (group,
  * id order, sizes) fully determine bins, which is what lets a SQL
  * engine replay the walk as a recursive CTE (the `x5_pack_greedy`
  * oracle) and makes re-runs reproducible for checkpoint/resume.
  *
  * Output row per doc: (id, group, n_tokens, bin_id) — join back to
  * content by id; bin_id is dense 0..k within each group. */
object Packing {

  /** Packed assignment row. */
  case class PackedDoc(id: Long, group: String, n_tokens: Int, bin_id: Long)

  /** Greedy-pack `df` rows into `budget`-token bins per `groupCol`,
    * walking ids ascending. `tokensCol` must be an integral token
    * count (e.g. [[TextAnalysis.tokenCount]] staged as a column). */
  def packGreedy(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaInt)
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[PackedDoc]
    df.select(col(idCol).cast("long"), col(groupCol).cast("string"),
        col(tokensCol).cast("int"))
      .as[(Long, String, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (group, it) =>
        val docs = it.toArray.sortBy(_._1)
        var bin = 0L
        var fill = 0L
        docs.iterator.map { case (id, _, n) =>
          if (fill > 0 && fill + n > budget) { bin += 1; fill = 0 }
          fill += n
          PackedDoc(id, group, n, bin)
        }
      }
      .toDF()
  }
}
