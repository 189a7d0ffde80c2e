package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a table ONCE at write time so every
  * later equi-join/aggregation on the bucket key is exchange-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every query and never shuffling it again: two tables bucketed by the same
  * key into the same bucket count join with zero Exchange (verified in
  * BucketingSpec), and sort-bucketed files make the join a streaming merge
  * within each bucket. The reference's offline store is unpartitioned AND
  * unbucketed (setup.sh:140) — this is the scale substitute.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and optionally sorted) by `keys`.
    *
    * Overwrite-safe across process crashes: a killed prior run can leave the
    * table's warehouse directory on disk with no catalog entry (the in-memory
    * catalog dies with the JVM), and `SaveMode.Overwrite` refuses to adopt an
    * unregistered location — so drop any stale registration AND delete an
    * orphaned location before writing.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String],
      sortKeys: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(warehouse, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val sorted = if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on `keys` — exchange-free by design.
    *
    * @param forceSortMerge apply the MERGE join hint so the bucket-local
    *   sort-merge path runs even when one side is small enough to broadcast
    *   (a broadcast would also be exchange-free but would leave the bucketed
    *   layout unexercised — used by the q61 correctness entry; production
    *   callers normally let Catalyst pick)
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, keys: Seq[String],
      forceSortMerge: Boolean = false): DataFrame = {
    val l = if (forceSortMerge) spark.table(left).hint("merge") else spark.table(left)
    l.join(spark.table(right), keys)
  }
}
