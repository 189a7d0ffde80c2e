package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy self-join on string keys within edit distance 1 — the entity-
  * resolution / typo-mining primitive (duplicate account names, OCR'd ids,
  * near-identical URLs) as relational algebra, NOT an all-pairs scan.
  *
  * Blocking is the DELETION NEIGHBORHOOD (Mor–Fraenkel; the FastSS family):
  * every string generates itself plus its |s| single-character deletions.
  * Two strings at edit distance ≤ 1 ALWAYS share a variant —
  *   equal: share the string itself;
  *   deletion/insertion: the shorter IS one of the longer's deletions;
  *   substitution: deleting the substituted position from each yields the
  *   same string —
  * so the variant equi-join is a LOSSLESS candidate generator, and exact
  * `levenshtein` (codegen'd, O(len) at threshold 1) verifies survivors.
  *
  * At scale: variants ∝ Σ|s| (not n²), candidates expand IN PLACE from a
  * variant-keyed groupBy (one shuffle; cost ∝ Σ min(bucket, cap)²), and
  * `maxBucket` caps pathological variants (a hot shared prefix/suffix
  * block) with the same documented recall trade as the dedup family —
  * a flooded variant bucket means near-identical keys better handled by
  * exact grouping first.
  */
object FuzzyJoin {

  /** Pairs (name_a < name_b) of distinct `key` values within edit
    * distance 1. Input should be pre-projected to the key column.
    *
    * Both exchanges are NARROW-keyed: the variant bucket key is the
    * variant's 8-byte xxhash64 (a 64-bit collision merely merges two
    * buckets — extra candidates that exact verification removes, so the
    * hashing stays lossless), and the cross-variant pair dedup is keyed on
    * (md5(a), md5(b)) with the strings riding as aggregated payload — long
    * keys never serve as a shuffle sort/partition key. */
  def edit1SelfJoin(df: DataFrame, key: String, maxBucket: Int = 1000): DataFrame = {
    val vs = df.select(col(key).as("s")).where(col("s").isNotNull).distinct()
      // self + all single-char deletions; array_distinct because deleting
      // either of two equal adjacent chars yields the same variant
      .select(col("s"), explode(expr(
        "array_distinct(array_union(array(s), " +
          "transform(sequence(1, length(s)), i -> concat(substr(s, 1, i-1), substr(s, i+1)))))"))
        .as("v"))
      // Σ|s| variant strings of ~|s| chars each collapse to 8-byte keys
      // before they reach the exchange
      .select(xxhash64(col("v")).as("vh"), col("s"))

    val buckets = vs.groupBy("vh").agg(collect_list(col("s")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // skew guard

    // in-place pair expansion (sorted, a < b), hash-keyed dedup across
    // shared variants, then exact verification — only on surviving pairs
    buckets
      .select(array_sort(col("ids")).as("ss"))
      .select(graft.functions.SortedPairs(col("ss")).as(Seq("name_a", "name_b")))
      .filter(col("name_a") =!= col("name_b"))
      .groupBy(md5(col("name_a")).as("__ha"), md5(col("name_b")).as("__hb"))
      .agg(first(col("name_a")).as("name_a"), first(col("name_b")).as("name_b"))
      .select("name_a", "name_b")
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
  }
}
