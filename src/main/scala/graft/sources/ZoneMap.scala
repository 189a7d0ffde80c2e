package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Zone-map data skipping — the read-side half of the parquet+manifest
  * table-format substitution (SURVEY §7: no Delta/Iceberg jars in this
  * environment, so their data-skipping statistics are re-expressed as an
  * explicit shard map). The write path range-shards on a key and records
  * per-shard (min, max) for the key AND any extra stats columns, plus an
  * optional per-shard BLOOM filter over a point-lookup column; the read
  * path consults the map FIRST (shards-count rows — driver-side by
  * construction) and turns the surviving shard list into a PARTITION
  * filter, so Spark's partition pruning skips the non-overlapping files
  * before any data I/O. At 100 TB a time-range query over a time-sharded
  * table reads only the shards the range touches — the difference between
  * a scan and a seek; a point lookup on a non-sorted column reads only
  * the shards whose Bloom admits the key (Iceberg's bloom column stats,
  * in the engine-portable ≤m-row-bit-table form of [[Bloom]]).
  *
  * Range sharding (not hash) is what makes the min/max map selective:
  * each shard owns a contiguous key interval. Correlated columns (a
  * z-order derivative, an event time that tracks the range key) inherit
  * selectivity through their own per-shard stats; uncorrelated
  * high-cardinality columns get it from the Bloom instead. The residual
  * filter always applies after pruning — the map is an optimization,
  * never a correctness dependence (a shard's stats BOUND its contents).
  */
object ZoneMap {

  /** Write `df` range-sharded on `key` under `path/data/__shard=*`, the
    * min/max map for `key` and `statsCols` at `path/zonemap`, and (when
    * `bloomCol` is set) per-shard Bloom bit tables at `path/bloom`. */
  def write(df: DataFrame, key: String, path: String, shards: Int,
      statsCols: Seq[String] = Nil,
      bloomCol: Option[String] = None,
      bloomK: Int = 5, bloomM: Long = 1L << 20): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val sharded = df.repartitionByRange(shards, col(key))
      .withColumn("__shard", spark_partition_id())
      .persist()
    sharded.count(): Unit // one range shuffle feeds the data AND the maps
    sharded.write.partitionBy("__shard").mode("overwrite").parquet(s"$path/data")
    val stats = (key +: statsCols).distinct.flatMap(c =>
      Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))
    sharded.groupBy("__shard")
      .agg(stats.head, stats.tail :+ count(lit(1)).as("rows"): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/zonemap")
    bloomCol.foreach { c =>
      // per-shard set-bit tables — mergeable, portable, ≤ m rows each
      sharded.filter(col(c).isNotNull)
        .select(col("__shard"),
          explode(array((1 to bloomK).map(i =>
            Bloom.bitPos(col(c), i, bloomM)): _*)).as("pos"))
        .distinct()
        .write.mode("overwrite").parquet(s"$path/bloom")
    }
    sharded.unpersist(false): Unit
  }

  /** Append a new batch: the batch is range-sharded AMONG ITSELF into
    * `shards` NEW shard ids (offset past the existing maximum — existing
    * files are never rewritten, the cheap-append property every table
    * format guarantees), its map rows and bloom bits land alongside the
    * existing ones. Appended shards overlap the old key ranges, so range
    * reads now touch old+new shards for the same window — the documented
    * drift that [[compact]] repairs by re-sharding the whole table back to
    * disjoint ranges. */
  def append(df: DataFrame, key: String, path: String, shards: Int,
      statsCols: Seq[String] = Nil,
      bloomCol: Option[String] = None,
      bloomK: Int = 5, bloomM: Long = 1L << 20): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    val offset = spark.read.parquet(s"$path/zonemap")
      .agg(max(col("__shard"))).first().getInt(0) + 1
    val sharded = df.repartitionByRange(shards, col(key))
      .withColumn("__shard", spark_partition_id() + lit(offset))
      .persist()
    sharded.count(): Unit
    sharded.write.partitionBy("__shard")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$path/data")
    val stats = (key +: statsCols).distinct.flatMap(c =>
      Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))
    sharded.groupBy("__shard")
      .agg(stats.head, stats.tail :+ count(lit(1)).as("rows"): _*)
      .coalesce(1)
      .write.mode("append").parquet(s"$path/zonemap")
    bloomCol.foreach { c =>
      sharded.filter(col(c).isNotNull)
        .select(col("__shard"),
          explode(array((1 to bloomK).map(i =>
            Bloom.bitPos(col(c), i, bloomM)): _*)).as("pos"))
        .distinct()
        .write.mode("append").parquet(s"$path/bloom")
    }
    sharded.unpersist(false): Unit
  }

  /** Re-shard the whole table back to disjoint key ranges (append drift
    * repair): one full read + [[write]]. The table format's OPTIMIZE. */
  def compact(spark: SparkSession, path: String, key: String, shards: Int,
      statsCols: Seq[String] = Nil,
      bloomCol: Option[String] = None,
      bloomK: Int = 5, bloomM: Long = 1L << 20): Unit = {
    // eager local checkpoint, not persist: a cache-evicted partition would
    // recompute FROM THE FILES THE REWRITE REPLACES — the checkpoint severs
    // lineage so that can never happen
    val all = spark.read.parquet(s"$path/data").drop("__shard")
      .localCheckpoint(eager = true)
    write(all, key, path, shards, statsCols, bloomCol, bloomK, bloomM)
  }

  /** Conjunctive multi-column range scan: each (column, lo, hi) bound is
    * inclusive and must have per-shard stats recorded at write time.
    * Returns (rows, shardsRead, shardsTotal). */
  def readRanges(spark: SparkSession, path: String,
      ranges: Seq[(String, Any, Any)]): (DataFrame, Int, Int) = {
    require(ranges.nonEmpty, "need at least one range predicate")
    val zmap = spark.read.parquet(s"$path/zonemap")
    ranges.foreach { case (c, _, _) =>
      require(zmap.columns.contains(s"lo_$c"),
        s"no per-shard stats recorded for column '$c'") }
    val total = zmap.count().toInt
    val overlap = ranges.map { case (c, lo, hi) =>
      col(s"hi_$c") >= lit(lo) && col(s"lo_$c") <= lit(hi)
    }.reduce(_ && _)
    val survivors = zmap.filter(overlap)
      .select(col("__shard")).collect().map(_.getInt(0)).toSeq
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val pruned = spark.read.parquet(s"$path/data")
      .filter(col("__shard").isInCollection(survivors)) // partition pruning
      .filter(residual)
      .drop("__shard")
    (pruned, survivors.size, total)
  }

  /** Inclusive range scan `[lo, hi]` on one column (usually the sharding
    * key). Returns (rows, shardsRead, shardsTotal). */
  def readRange(spark: SparkSession, path: String, key: String,
      lo: Any, hi: Any): (DataFrame, Int, Int) =
    readRanges(spark, path, Seq((key, lo, hi)))

  /** Point lookup through the per-shard Bloom filters: only shards whose
    * Bloom admits the key are read (one-sided: a shard holding the key is
    * NEVER skipped; a false-positive shard is read and filtered). The
    * probe's bit positions are computed engine-side on a one-row frame —
    * the same md5 algebra the build used. */
  def readPoint(spark: SparkSession, path: String, bloomCol: String,
      value: Any, bloomK: Int = 5, bloomM: Long = 1L << 20): (DataFrame, Int, Int) = {
    val total = spark.read.parquet(s"$path/zonemap").count().toInt
    val positions = spark.range(1).select(
        array((1 to bloomK).map(i =>
          Bloom.bitPos(lit(value), i, bloomM)): _*).as("ps"))
      .first().getSeq[Long](0).distinct
    val survivors = spark.read.parquet(s"$path/bloom")
      .filter(col("pos").isInCollection(positions))
      .groupBy(col("__shard")).agg(countDistinct(col("pos")).as("n"))
      .filter(col("n") === positions.size)
      .select(col("__shard")).collect().map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(s"$path/data")
      .filter(col("__shard").isInCollection(survivors)) // partition pruning
      .filter(col(bloomCol) === lit(value))              // residual
      .drop("__shard")
    (pruned, survivors.size, total)
  }
}
