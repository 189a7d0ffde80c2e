package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.functions.CosineSimilarity

/** Deduplication suite for LLM training-data pipelines (extension surface,
  * BASELINE.json north star). Five methods, all shaped for 100 TB:
  * candidate generation is always a hash-bucket equi-join (shuffle on a
  * bucket key, never an O(n²) cross join); exact verification runs only on
  * candidate pairs.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content digest. One shuffle with map-side
    * partial aggregation. Output: one row per distinct content with the
    * canonical (min) id and the duplicate count. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("text_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * shingle → k-minhash signature → `bands` band keys → explode → self-join
    * on band key (the only shuffle that matters; cost ∝ Σ bucket²) → distinct
    * pairs → verify exact Jaccard on the shingle sets of candidates only.
    *
    * At 100 TB the band-bucket join co-partitions by (band, key); hot buckets
    * (boilerplate shingles) are the skew risk — mitigated by dropping buckets
    * larger than `maxBucket` (standard practice: such buckets are near-certain
    * duplicates of templated content and are better handled by exact dedup).
    */
  def minhashLsh(
      df: DataFrame,
      id: String,
      text: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {

    val rows = numHashes / bands
    // the signature index is MATERIALIZED (localCheckpoint) before the
    // self-join fan-out: the k-hash signature expression tree is enormous,
    // and duplicating it across four join branches made Catalyst re-optimize
    // and re-codegen it repeatedly (planning dominated execution ~50:1 —
    // measured). At 100 TB persist this index to a table instead; every
    // production LSH pipeline materializes signatures once.
    val withSig = df.select(
      col(id).as("doc_id"),
      array_distinct(wordShingles(col(text), shingleK)).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("band_keys", lshBandKeys(col("sig"), bands, rows))
      .localCheckpoint(true)

    // candidate pairs carry ONLY ids through the bucket join + dedup shuffle;
    // shingle sets are joined back afterwards (shuffling the sets through the
    // pair-dedup would move |pairs| × |set| data — the verify join moves
    // |docs| × |set| instead, orders of magnitude less at scale)
    val buckets = withSig
      .select(col("doc_id"), posexplode(col("band_keys")).as(Seq("band", "bkey")))
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkey"))))
      .filter(col("__bsz") <= maxBucket) // skew guard: templated content floods a bucket
      .drop("__bsz")

    val a = buckets.as("a")
    val b = buckets.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    val sets = withSig.select(col("doc_id"), col("shingles"))
    candidates
      .join(sets.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into `bands` segments —
    * any pair within hamming distance < `bands` shares at least one exact
    * band (pigeonhole), so the bucket join finds all of them. */
  def simhash(
      df: DataFrame,
      id: String,
      text: String,
      bands: Int = 4,
      maxHamming: Int = 3): DataFrame = {

    // token hashes materialized first — inside simhash's per-bit vote lambda
    // the string hash would otherwise be recomputed once per bit (64×)
    val withHash = df.select(col(id).as("doc_id"), wsTokens(lower(col(text))).as("toks"))
      .withColumn("th", simhashTokenHashes(col("toks")))
      .withColumn("sh", simhash64FromHashes(col("th")))
    val buckets = withHash.select(col("doc_id"), col("sh"),
      explode(simhashBands(col("sh"), bands)).as("b"))

    val a = buckets.as("a"); val b = buckets.as("b")
    a.join(b, col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Character n-gram Jaccard near-dup pairs. Candidate generation via
    * sampled-ngram inverted index (only every `sampleMod`-th ngram by hash —
    * keeps the index linear in corpus size), verification on full ngram sets. */
  def ngramJaccard(
      df: DataFrame,
      id: String,
      text: String,
      n: Int = 8,
      threshold: Double = 0.5,
      sampleMod: Int = 8,
      maxBucket: Int = 1000): DataFrame = {

    // ids-only through the index join + dedup; gram sets joined back for
    // verification, and the gram index materialized before the fan-out
    // (same two rationales as minhashLsh)
    val grams = df.select(col(id).as("doc_id"),
      array_distinct(charNgrams(lower(col(text)), n)).as("grams"))
      .localCheckpoint(true)
    val index = grams
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .withColumn("gh", xxhash64Seeded(17L, col("g")))
      .filter(pmod(col("gh"), lit(sampleMod.toLong)) === 0)
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))))
      .filter(col("__bsz") <= maxBucket) // skew guard
      .drop("__bsz")

    val a = index.as("a"); val b = index.as("b")
    val candidates = a.join(b, col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    candidates
      .join(grams.select(col("doc_id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
      .join(grams.select(col("doc_id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("g_a"), col("g_b"))).cast("double"))
      .withColumn("jaccard", round(when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-dup pairs: random-hyperplane LSH buckets, then exact
    * cosine (native codegen [[CosineSimilarity]]) within buckets.
    * Null/empty vectors carry no cosine signal and are dropped up front. */
  def embeddingCosine(
      df: DataFrame,
      id: String,
      vec: String,
      threshold: Double = 0.95,
      lshBits: Int = 12): DataFrame = {

    val keyed = df.filter(col(vec).isNotNull && size(col(vec)) > 0)
      .select(col(id).as("vec_id"), col(vec).as("v"))
      .withColumn("bucket", hyperplaneLshKey(col("v"), lshBits))
    val a = keyed.as("a"); val b = keyed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(CosineSimilarity(col("a.v"), col("b.v")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Collapse near-dup pairs to per-doc keep/drop marks: a doc is dropped if
    * any pair links it to a smaller id (cheap one-pass approximation of
    * connected components; [[connectedComponents]] is the exact fixpoint). */
  def marksFromPairs(docs: DataFrame, id: String, pairs: DataFrame): DataFrame =
    docs.select(col(id).as("doc_id"))
      .join(pairs.select(col("id_b").as("doc_id")).distinct()
        .withColumn("is_duplicate", lit(true)), Seq("doc_id"), "left")
      .withColumn("is_duplicate", coalesce(col("is_duplicate"), lit(false)))

  /** End-to-end near-dup removal: collapse `pairs` to exact connected
    * components and keep one canonical doc (min id) per component; docs in no
    * component pass through. The full dedup pipeline is
    * `dedupCorpus(docs, id, minhashLsh(docs, id, text))`. */
  def dedupCorpus(docs: DataFrame, id: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.join(comps, docs(id) === comps("node"), "left")
      .filter(col("component").isNull || col("component") === docs(id))
      .drop("node", "component")
  }

  /** Exact connected components over near-dup pairs, by distributed min-label
    * propagation: every node starts labeled with its own id; each round
    * propagates labels across edges and keeps the per-node minimum; fixpoint
    * when no label changes. Each round is one shuffled join + one shuffled
    * aggregation with NO driver-side graph state, so the same code runs at
    * 100 TB. Rounds ∝ component diameter — dedup graphs are cliques and short
    * chains (diameter ≲ 3), where this beats star-contraction's constant
    * factors; for adversarial long-path graphs switch to large-star/small-star.
    * `localCheckpoint` per round truncates the exponentially growing lineage.
    *
    * @param pairs edge list with columns `id_a`, `id_b`
    * @return (node BIGINT, component BIGINT), component = min reachable node id
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    // symmetric edge list; self-loops dropped
    val edges = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(pairs.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = true)

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(eager = true)

    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val msgs = edges.join(labels, edges("src") === labels("node"))
        .select(edges("dst").as("node"), col("comp"))
      val next = labels.unionByName(msgs)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint(eager = true)
      converged = next.alias("n")
        .join(labels.alias("o"), col("n.node") === col("o.node"))
        .filter(col("n.comp") < col("o.comp"))
        .isEmpty
      labels = next
      round += 1
    }
    labels.select(col("node"), col("comp").as("component"))
  }
}
