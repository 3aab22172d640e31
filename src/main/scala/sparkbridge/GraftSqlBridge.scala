package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Spark internals, compiled into the
  * `org.apache.spark.sql` package — the standard technique public Spark
  * extension libraries use to lift a custom Catalyst [[Expression]] into
  * the public [[Column]] API (Spark 4.x routes Column through ColumnNode,
  * so `new Column(expr)` no longer exists).
  *
  * Kept intentionally tiny: everything else in the engine stays on public
  * API.
  */
object GraftSqlBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Globally contiguous 0-based row index over the Dataset's CURRENT
    * (already finalized) physical partitioning.
    *
    * Goes through `queryExecution.toRdd`: taking the RDD finalizes the
    * AQE plan ONCE, so the `zipWithIndex` size job and the subsequent
    * map run over identical partitions — re-deriving the index from two
    * independently AQE-replanned jobs is not deterministic (observed:
    * segment counts drifting run-to-run). Rows are wrapped with
    * [[org.apache.spark.sql.catalyst.expressions.JoinedRow]] (no
    * per-field boxing); buffering operators downstream copy per the
    * InternalRow contract. */
  def zipWithRowIndex(df: Dataset[Row], name: String): Dataset[Row] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    import org.apache.spark.sql.types.{LongType, StructType}
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val spark = cdf.sparkSession
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(name, LongType, nullable = false))
    val rdd = cdf.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      it.map { case (row, idx) =>
        new JoinedRow(row, new GenericInternalRow(Array[Any](idx))): InternalRow
      }
    }
    spark.internalCreateDataFrame(rdd, outSchema)
  }

  /** True when the session's CacheManager tracks no cached plans —
    * the observability hook for the cache-lifecycle specs (unnamed
    * cached DataFrames are invisible to the public catalog API). */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Register an expression builder as a SQL temp function so
    * `spark.sql("SELECT cosine_sim(a, b)")` resolves to the native
    * expression (codegen-capable path, unlike a Scala UDF). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark
      .asInstanceOf[classic.SparkSession]
      .sessionState
      .functionRegistry
      .createOrReplaceTempFunction(name, builder, "internal")
}
