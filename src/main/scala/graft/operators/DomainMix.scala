package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deterministic per-domain downsampling — how a training mix is actually
  * rebalanced (CommonCrawl at 10%, books at 100%, …). Extension surface
  * (north star in BASELINE.json; not in the reference).
  *
  * Each row's fate is a pure function of its id: keep iff the content-
  * addressed md5 bucket (the engine-portable [[GraftFunctions.hashSplitBucket]]
  * form, salted with "mix:" so it is INDEPENDENT of the q52 train/val/test
  * split buckets) falls under the domain's rate. No RNG, no `sample()` —
  * reruns, engines, and partition layouts agree row-for-row, the realized
  * rate concentrates at the target (binomial over distinct hashes), and the
  * decision is auditable after the fact. Pure codegen Column predicate: at
  * 100 TB this is a map-only filter inside the scan stage, no shuffle.
  *
  * Rates are fixed to parts-per-million on the Scala side so the threshold
  * comparison is exact integer arithmetic in every engine.
  */
object DomainMix {

  /** Keep-predicate: md5("mix:" + id) bucket (of 1e6) < rate[domain] ppm. */
  def keepFlag(id: Column, domain: Column, rates: Map[String, Double],
      defaultRate: Double): Column = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0,1]")
    val ppm = rates.view.mapValues(r => math.round(r * 1000000).toDouble).toMap
    val ppmCol = coalesce(
      element_at(typedlit(ppm), domain),
      lit(math.round(defaultRate * 1000000).toDouble)).cast("long")
    GraftFunctions.hashSplitBucket(concat(lit("mix:"), id.cast("string")), 1000000) < ppmCol
  }

  /** The pipeline op: docs filtered to the target mix. */
  def sampleByDomain(docs: DataFrame, id: String, domain: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame =
    docs.filter(keepFlag(col(id), col(domain), rates, defaultRate))

  /** Cap each domain at its `n` best rows by `rank` (ties broken by
    * ascending id — fully deterministic given a deterministic rank).
    *
    * The 100 TB shape matters here: ranking windows over the full rows would
    * shuffle document text partitioned BY DOMAIN — and domains are the
    * canonical skewed key (one crawl domain can be a double-digit fraction
    * of the corpus, so one window partition would swallow it). Instead the
    * window runs over a three-narrow-column projection (id, domain, rank
    * value), and the surviving ids — at most `n × |domains|` rows — come
    * back as a BROADCAST left-semi join: the wide rows never enter any
    * shuffle, skew hits only 16-byte tuples, and the docs side stays a
    * map-only scan (plan-gated in PlanPropertiesSpec). */
  /** Keep the top `keepPpm`/1e6 FRACTION of each domain by `rank` — C4-style
    * per-domain quality pruning where the cutoff ADAPTS to the domain (one
    * global threshold over-prunes clean domains and under-prunes noisy
    * ones; the per-domain percentile is the curation rule that survives a
    * heterogeneous crawl). Rank-based, not quantile-based, deliberately:
    * engines disagree on interpolated quantiles of floats, but
    * `rank × 1e6 ≤ keepPpm × n` is exact integer algebra any oracle
    * replays. Same narrow-projection shape as [[capPerDomain]]: the windows
    * see only (id, domain, rank value) — skewed mega-domains hit 16-byte
    * tuples, never document text.
    *
    * @return the verdict frame (doc_id, <domain>, q_rank, n_domain, kept)
    *   for EVERY doc; filter on `kept` to apply */
  def topFractionPerDomain(docs: DataFrame, id: String, domain: String,
      rank: Column, keepPpm: Long): DataFrame = {
    require(keepPpm >= 0L && keepPpm <= 1000000L,
      s"keepPpm must be in [0, 1e6], got $keepPpm")
    val narrow = docs.select(col(id).as("doc_id"),
      col(domain).as("__dom"), rank.as("__r"))
    val w = Window.partitionBy("__dom")
      .orderBy(col("__r").desc, col("doc_id").asc)
    narrow
      .withColumn("q_rank", row_number().over(w).cast("long"))
      .withColumn("n_domain", count(lit(1)).over(Window.partitionBy("__dom")))
      .withColumn("kept",
        col("q_rank") * lit(1000000L) <= lit(keepPpm) * col("n_domain"))
      .select(col("doc_id"), col("__dom").as(domain),
        col("q_rank"), col("n_domain"), col("kept"))
  }

  /** TEMPERATURE-based domain resampling (the multilingual/Pile mixing
    * rule): sampling weight w_d ∝ n_d^α with α = 1/2, i.e. small domains
    * are UP-weighted relative to their share and the head domain stops
    * dominating the mix — [[sampleByDomain]] computes its own rates from
    * the data instead of taking them from the caller. α is pinned to 1/2
    * deliberately: `sqrt` is an IEEE-754 CORRECTLY-ROUNDED operation in
    * every engine (unlike `pow`, which is a library transcendental), so
    * the whole rate derivation — √n_d, the normalizer Σ√n_d folded in
    * ascending domain order, `rate_d = budget·(√n_d/Σ)/n_d` floored to
    * ppm — is the same fixed IEEE tree on both sides of an oracle.
    *
    * Shape: one combinable count per domain (a |domains|-row frame), the
    * normalizer folds inside a one-row aggregate, rates broadcast back,
    * and the keep decision is the usual content-addressed ppm predicate —
    * a map-only filter against a broadcast |domains|-row table; document
    * text never shuffles.
    *
    * @param budget target TOTAL kept rows (expected value; realized count
    *   concentrates binomially). Rates clamp at 1 (a domain smaller than
    *   its allocation keeps everything — the leftover budget is NOT
    *   redistributed, matching the one-pass rule an oracle can replay).
    * @return (doc_id, <domain>, n_domain, keep_ppm, kept) for EVERY doc —
    *   filter on `kept` to apply */
  def temperatureSample(docs: DataFrame, id: String, domain: String,
      budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val stats = docs.groupBy(col(domain).as("__dom"))
      .agg(count(lit(1)).as("n_domain"))
      .withColumn("__s", sqrt(col("n_domain").cast("double")))
    // Σ√n in ASCENDING domain order — the ordered-fold rule (float sums
    // are order-dependent; a sorted fold is what the oracle replays)
    val norm = stats.agg(aggregate(
      sort_array(collect_list(struct(col("__dom").as("t"), col("__s").as("c")))),
      lit(0.0), (acc, x) => acc + x.getField("c")).as("__ssum"))
    val rates = stats.crossJoin(broadcast(norm))
      .withColumn("keep_ppm", least(lit(1000000L),
        floor(lit(1000000.0) *
          ((lit(budget.toDouble) * (col("__s") / col("__ssum"))) /
            col("n_domain").cast("double"))).cast("long")))
      .select(col("__dom"), col("n_domain"), col("keep_ppm"))
    // NULL-SAFE equi-join (<=>): the null-domain group is counted in
    // `stats` and contributes √n to the normalizer like any domain, so it
    // must also be matched and sampled here — a plain equi-join would
    // silently drop every null-domain doc while still shrinking the other
    // domains' allocations (the '@return ... for EVERY doc' contract)
    val keyed = docs.select(col(id).as("doc_id"), col(domain).as("__dom"))
    keyed.join(broadcast(rates), keyed("__dom") <=> rates("__dom"))
      .withColumn("kept",
        GraftFunctions.hashSplitBucket(
          concat(lit("temp:"), col("doc_id").cast("string")), 1000000)
          < col("keep_ppm"))
      .select(col("doc_id"), keyed("__dom").as(domain),
        col("n_domain"), col("keep_ppm"), col("kept"))
  }

  def capPerDomain(docs: DataFrame, id: String, domain: String,
      rank: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(col("__cap_dom"))
      .orderBy(col("__cap_rank").desc, col("__cap_id").asc)
    val keep = docs
      .select(col(id).as("__cap_id"), col(domain).as("__cap_dom"), rank.as("__cap_rank"))
      .withColumn("__cap_rn", row_number().over(w))
      .filter(col("__cap_rn") <= n)
      .select(col("__cap_id"))
    docs.join(broadcast(keep), docs(id) === keep("__cap_id"), "left_semi")
  }
}
