package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map data skipping — the read-side half of the parquet+manifest
  * table-format substitution (SURVEY §7: no Delta/Iceberg jars in this
  * environment, so their data-skipping statistics are re-expressed as an
  * explicit shard map). The write path range-shards on a key and records
  * per-shard (min, max, rows); the read path consults the map FIRST
  * (shards-count rows — driver-side by construction) and turns the
  * surviving shard list into a PARTITION filter, so Spark's partition
  * pruning skips the non-overlapping files before any data I/O. At 100 TB
  * a time-range query over a time-sharded table reads only the shards the
  * range touches — the difference between a scan and a seek.
  *
  * Range sharding (not hash) is what makes the map selective: each shard
  * owns a contiguous key interval, so a range predicate overlaps few
  * shards. The residual filter still applies after pruning — the map is an
  * optimization, never a correctness dependence (a shard's min/max BOUND
  * its contents; rows inside the shard outside the range are filtered as
  * usual). */
object ZoneMap {

  /** Write `df` range-sharded on `key` under `path/data/__shard=*` with the
    * zone map at `path/zonemap`. */
  def write(df: DataFrame, key: String, path: String, shards: Int): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val sharded = df.repartitionByRange(shards, col(key))
      .withColumn("__shard", spark_partition_id())
      .persist()
    sharded.count(): Unit // one range shuffle feeds the data AND the map
    sharded.write.partitionBy("__shard").mode("overwrite").parquet(s"$path/data")
    sharded.groupBy("__shard")
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/zonemap")
    sharded.unpersist(false): Unit
  }

  /** Inclusive range scan `[lo, hi]` on the sharding key: the zone map
    * picks the overlapping shards, the shard list becomes a partition
    * filter (file skipping), the residual predicate applies after.
    * Returns (rows, shardsRead, shardsTotal). */
  def readRange(spark: SparkSession, path: String, key: String,
      lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val zmap = spark.read.parquet(s"$path/zonemap")
    val total = zmap.count().toInt
    val survivors = zmap
      .filter(col("hi") >= lit(lo) && col("lo") <= lit(hi))
      .select(col("__shard")).collect().map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(s"$path/data")
      .filter(col("__shard").isInCollection(survivors)) // partition pruning
      .filter(col(key) >= lit(lo) && col(key) <= lit(hi)) // residual
      .drop("__shard")
    (pruned, survivors.size, total)
  }
}
