package graft

import graft.SparkSpec

/** Plan-shape regression gate: locks in the physical-plan properties that
  * matter at 100 TB, so an innocent-looking rewrite that reintroduces a
  * cartesian product, drops a pushed filter, or turns a broadcast join into
  * a shuffle join fails CI instead of surfacing as a cluster bill.
  * Queries run against sf0.001 (plan SHAPE is scale-independent here: the
  * broadcast sides are hinted, not statistics-derived). */
class PlanPropertiesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // batch queries with no external writes / streaming / ML fits — cheap to
  // construct, and jointly cover every operator family's plan shape
  private val audited = Seq(
    "q01_latest_maxby", "q02_latest_window", "q03_time_range", "q04_asof_join",
    "q05_sessionize", "q06_topn_per_key", "q07_agg_pricing", "q08_join_revenue",
    "q09_point_lookup", "q12_dedup_exact", "q19_text_stats", "q20_lang_id",
    "q21_quality_score", "q22_fingerprint", "q27_json_extract", "q28_distinct_agg",
    "q29_window_lag", "q30_rollup", "q31_semi_join", "q32_anti_join",
    "q33_range_join", "q35_percentile", "q36_tpch_q3", "q38_pivot",
    "q39_approx_distinct", "q41_latest_salted", "q42_session_window",
    "q45_text_clean", "q46_vocab", "q48_sql_text", "q49_set_ops",
    "q50_correlated_max", "q51_curation", "q52_hash_split", "q53_asof_forward",
    "q54_rolling_window", "q58_corpus_report", "q63_repetition", "q64_seq_packing",
    "q65_domain_mix", "q66_domain_cap", "q71_lang_quality_floor", "q73_tpch_q5",
    "q74_cube", "q77_dup_spans", "q78_bigram_coverage", "q79_salted_join",
    "q80_grouping_sets", "q81_funnel", "q82_zorder", "q85_tpch_q18",
    "q89_doc_chunks", "q90_vec_quantize", "q91_winsorize", "q92_dominant_supplier",
    "q93_approx_quantile", "q94_window_rank_stats", "q97_unpivot",
    "q98_interval_frame", "q99_scd2_intervals", "q100_fuzzy_linkage",
    "q101_mad_outliers", "q103_cohort_retention", "q104_basket_pairs",
    "q105_markov_transitions", "q109_attribution", "q110_moving_median",
    "q122_count_min", "q125_skyline", "q126_twap",
    "q128_interval_join", "q130_quota_alloc", "q186_domain_quality_prune",
    "q187_corpus_diff", "q207_normalize_text", "q211_k_anonymize",
    "q216_paragraph_dedup", "q218_remove_dup_spans")
  // q121_quality_checks is audited separately (q76 rationale): attaching the
  // one-row table count to the one-row referential check is a deliberate
  // single-scalar nested-loop join
  // q76_tfidf is audited separately: its corpus-size constant joins in as a
  // DELIBERATE one-broadcast-row nested-loop join, which the generic
  // no-BNLJ assertion would (correctly) reject for data-bearing joins

  test("no audited query plans a cartesian product or an unexpected nested-loop join") {
    val offenders = audited.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      val bad = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
      bad.collect { case (what, true) => s"$name: $what" }
    }
    assert(offenders.isEmpty, s"scale-killing join shapes found:\n${offenders.mkString("\n")}")
  }

  test("IVFADC stage 1 is a broadcast EQUI-join on cell (codes pruned by probe, no nested loop)") {
    import org.apache.spark.sql.functions.col
    // the q151 entry dumps candidates to parquet and reads them back (the
    // oracle contract severs the plan there), so the gate runs the operator
    // sink-free: the full stage-1 + rerank plan stays inspectable
    val emb = Tables.embeddings(spark, sfDir)
    val plan = graft.similarity.Similarity.ivfadcTopK(emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 4, m = 4, codebookSize = 8, shortlist = 50,
        excludeSelf = true, fitMaxIter = 4)
      .queryExecution.executedPlan.toString
    // the ADC table must reach the codes by cell equality — a nested-loop
    // would score EVERY code for every query, defeating the IVF pruning
    assert(plan.contains("BroadcastHashJoin [cell"), s"stage 1 must equi-join on cell:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "no nested loop anywhere in the IVFADC plan (excludeSelf is a post-join filter)")
  }

  test("indexed IVFADC serving keeps the q151 plan shape: cell equi-join, no nested loop") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("gate_ivfadc_").toString
    graft.similarity.Similarity.buildIvfadcIndex(emb, "vec_id", "embedding", idx,
      nCells = 8, m = 4, codebookSize = 8, fitMaxIter = 4)
    val plan = graft.similarity.Similarity.ivfadcTopKIndexed(spark, idx,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nProbe = 4, shortlist = 50, excludeSelf = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin [cell"),
      s"stage 1 must equi-join the stored codes on cell:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "no nested loop anywhere in the indexed IVFADC plan")
  }

  test("q36 pushes all three filters to the scans and joins without a shuffle join") {
    val plan = SparkEntry.queries("q36_tpch_q3")(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      plan.contains("GreaterThan(l_shipdate"), s"lineitem ship-date filter not pushed:\n$plan")
    assert(plan.contains("GreaterThan(l_shipdate") && plan.contains("LessThan(o_orderdate") &&
      plan.contains("EqualTo(c_mktsegment"), "all three predicates must reach their scans")
    assert(plan.contains("BroadcastHashJoin"), "joins must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "no shuffle join in the q36 plan")
  }

  test("q01 aggregates with a map-side partial before its single exchange") {
    val plan = SparkEntry.queries("q01_latest_maxby")(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial max_by"),
      s"latest-per-key must combine map-side:\n$plan")
  }

  test("q03 pushes the ts time-range bound into the parquet scan") {
    val plan = SparkEntry.queries("q03_time_range")(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,") && plan.contains("LessThanOrEqual(ts,"),
      s"ts range must reach the scan (PushedFilters):\n$plan")
  }

  test("q63 aggregates bigram counts with map-side partials; token arrays never shuffle") {
    val plan = SparkEntry.queries("q63_repetition")(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"bigram counting must combine map-side:\n$plan")
    // the join back to per-doc scalars carries only narrow columns — no
    // Exchange in the plan may ship the __toks array
    val shufflesTokens = plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("__toks"))
    assert(!shufflesTokens, s"token arrays must stay map-side:\n$plan")
  }

  test("q64 packs with exactly one data exchange (the shard groupBy)") {
    val plan = SparkEntry.queries("q64_seq_packing")(spark, sfDir).queryExecution.executedPlan
    val exchanges = plan.toString.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
    // one hash exchange for groupBy(shard) + the final presentation orderBy's
    // range exchange — anything more means the fold stopped being one-pass
    assert(exchanges <= 2, s"expected ≤2 exchanges (shard agg + output sort):\n$plan")
  }

  test("q66 caps via broadcast semi join: document text never enters a shuffle") {
    val plan = SparkEntry.queries("q66_domain_cap")(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"survivor ids must broadcast back:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no shuffle join in the cap plan:\n$plan")
    val shufflesText = plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("text"))
    assert(!shufflesText, s"text must not cross an Exchange:\n$plan")
  }

  test("q186 per-domain windows see only narrow tuples: text never crosses an Exchange") {
    val plan = SparkEntry.queries("q186_domain_quality_prune")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shufflesText = plan.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("text#"))
    assert(!shufflesText,
      s"domain windows must shuffle (id, domain, rank) tuples only:\n$plan")
  }

  test("q187 corpus diff joins digests, not text") {
    val plan = SparkEntry.queries("q187_corpus_diff")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shufflesText = plan.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("text#"))
    assert(!shufflesText,
      s"the diff's full-outer join must shuffle (doc_id, digest) rows only:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q184 prefix scan: no partition-less global window, text never shuffles") {
    val df = SparkEntry.queries("q184_budgeted_select")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // every window spec must carry the __pid partition key — a global
    // Window.orderBy would read 'windowspecdefinition(<order>...' with no
    // partition column and funnel the corpus through one task
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, s"expected the within-partition running-sum window:\n$plan")
    assert(specs.forall(_.contains("__pid")),
      s"running-sum windows must be partitioned by __pid:\n${specs.mkString("\n")}")
    val shufflesText = plan.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("text#"))
    assert(!shufflesText, s"the range shuffle must carry narrow rows:\n$plan")
  }

  test("q69 pipeline: document text never crosses an Exchange") {
    val plan = SparkEntry.queries("q69_pipeline_e2e")(spark, sfDir).queryExecution.executedPlan.toString
    val shufflesText = plan.linesIterator.exists(l =>
      l.contains("Exchange") && (l.contains("text#") || l.contains("__toks")))
    assert(!shufflesText, s"capstone must shuffle only narrow verdict rows:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q77 shuffles only hashed spans — never text, token arrays, or span strings") {
    val plan = SparkEntry.queries("q77_dup_spans")(spark, sfDir).queryExecution.executedPlan.toString
    val bad = plan.linesIterator.filter(_.contains("hashpartitioning")).exists(l =>
      l.contains("text#") || l.contains("__toks") || l.contains("span#"))
    assert(!bad, s"span aggregation must shuffle narrow (span_hash, doc_id) rows:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"span counts must combine map-side before the shuffle:\n$plan")
  }

  test("containment join shuffles only 8-byte token ids and hash sets — never text or shingles") {
    import org.apache.spark.sql.functions.col
    // audit the STAGED plan (public method checkpoints → RDD scan)
    val (out, release) = graft.dedup.Dedup.containmentJoinStaged(
      graft.Tables.documents(spark, sfDir), "doc_id", "text")
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"scale-killing join shape in the containment plan:\n$plan")
      val bad = plan.linesIterator.filter(_.contains("hashpartitioning")).exists(l =>
        l.contains("text#") || l.contains("sh#") || l.contains("__lt"))
      assert(!bad, s"text/shingles must never hash-shuffle — only toks/hs:\n$plan")
    } finally release()
  }

  test("q78 broadcasts the bigram model back; hash exchanges carry no text") {
    // audit the STAGED plan — the public method checkpoints, which collapses
    // the executed plan to an RDD scan
    val (out, release) = graft.functions.TextAnalysis.charBigramCoverageStaged(
      graft.Tables.documentsFanned(spark, sfDir), "doc_id", "text", 500)
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"top-N membership must be a broadcast semi join:\n$plan")
      val bad = plan.linesIterator.filter(_.contains("hashpartitioning")).exists(l =>
        l.contains("text#") || l.contains("__bis"))
      assert(!bad, s"only narrow (doc_id, bg, cnt) rows may hash-shuffle:\n$plan")
    } finally release()
  }

  test("q76 joins only narrow tf/df frames; the sole nested loop is the one-row count") {
    // audit the STAGED plan — the public method checkpoints, which collapses
    // the executed plan to an RDD scan (same contract as the q78 gate)
    val (out, release) = graft.functions.TextAnalysis.tfIdfTopKStaged(
      graft.Tables.documentsFanned(spark, sfDir), "doc_id", "text", 5)
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"no cartesian in the tf-idf plan:\n$plan")
      val shufflesText = plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#"))
      assert(!shufflesText, s"document text must not cross an Exchange:\n$plan")
      // the corpus-size constant is the ONLY nested-loop join, and it broadcasts
      assert(plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
        s"exactly the one-row count join may nest:\n$plan")
      // both consumers read the STAGED tf frame, not a re-tokenized corpus
      assert(plan.contains("InMemoryTableScan"),
        s"tf must come from the persisted stage on both branches:\n$plan")
    } finally release()
  }

  test("q85 broadcasts the having-set back; the fact aggregation combines map-side") {
    val plan = SparkEntry.queries("q85_tpch_q18")(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"having-set must broadcast:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial sum"),
      s"lineitem aggregation must combine map-side:\n$plan")
  }

  test("sampleByDomain is a map-only filter: zero exchanges in the operator plan") {
    val docs = graft.Tables.documents(spark, sfDir)
    val plan = graft.operators.DomainMix
      .sampleByDomain(docs, "doc_id", "source", Map("src0" -> 0.5), 0.1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), s"keep-flag filter missing:\n$plan")
    assert(!plan.contains("Exchange"), s"domain-mix sampling must not shuffle:\n$plan")
  }

  test("q06 top-N pushes a map-side WindowGroupLimit below the exchange") {
    // rank<=N must not sort whole partitions at 100 TB: Spark 4's
    // WindowGroupLimit keeps each input partition's local top-N BEFORE the
    // shuffle (Partial) and re-trims after (Final) — the window then ranks
    // only ≤N rows per key. Losing this (e.g. by filtering on a non-rank
    // predicate or a non-row_number function) reverts to full per-key sorts.
    val plan = graft.QuerySuite.queries("q06_topn_per_key")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.sliding("WindowGroupLimit".length).count(_ == "WindowGroupLimit") >= 2,
      s"expected partial+final WindowGroupLimit around the exchange:\n$plan")
  }

  test("runtime bloom filter injects at the fact scan for a selective dim shuffle join") {
    // the 100 TB shape: fact ⋈ selectively-filtered dim as a shuffle join —
    // Spark's InjectRuntimeFilter should plant a bloom_filter_might_contain
    // on the fact side so pruning happens at the scan, before the exchange.
    // Size thresholds exist for exactly the situation this corpus is in
    // (tiny tables), so the test lowers them to expose the production plan;
    // broadcast is disabled because the rule only fires for shuffle joins
    // (a broadcast join already prunes on the small side).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.Tables.lineitem(spark, sfDir)
      val dim = graft.Tables.part(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("p_brand") === "Brand#11")
      val plan = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
        .groupBy("p_brand").count()
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition (the skew remedy JOINs get)") {
    // SaltedJoin exists because AQE cannot split a hot GROUP BY key; for
    // plain shuffle JOINs, AQE's skew handling is the first-line remedy at
    // 100 TB — this gate proves the path engages. Thresholds are lowered to
    // make a test-sized hot key (one key = ~90% of rows) register as skew.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = Seq.tabulate(60000)(i => (if (i % 10 == 0) i.toLong else 7L, s"payload-$i"))
        .toDF("k", "v")
      val dim = Seq.tabulate(2000)(i => (i.toLong, s"dim-$i")).toDF("k", "d")
      val joined = hot.join(dim, Seq("k"))
      // drive THIS queryExecution (a write plans a separate one; skew marks
      // only appear on the plan that actually executed)
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"AQE must mark and split the hot-key join partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q99 SCD2 build pays ONE window exchange: lag and lead share it") {
    // two Window operators, one hash Exchange between scan and output sort —
    // Filter preserves the (user_id) partitioning and (ts, event_id) order,
    // so the change-row lead() must NOT re-shuffle or re-sort
    val plan = SparkEntry.queries("q99_scd2_intervals")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"SCD2 must reuse one window exchange, found $hashEx:\n$plan")
    assert(rangeEx == 1, s"expected only the output-sort range exchange:\n$plan")
  }

  test("q104 expands basket pairs in place: no self-join anywhere in the plan") {
    val plan = SparkEntry.queries("q104_basket_pairs")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"pair mining must generate candidates inside the basket array, not via a join:\n$plan")
  }

  test("chunking and quantization are map-only: no exchange except the result sort") {
    Seq(
      graft.operators.Chunking.chunkByChars(
        graft.Tables.documents(spark, sfDir), "doc_id", "text", 256, 192),
      graft.Tables.embeddings(spark, sfDir)
        .withColumn("q", graft.similarity.Similarity.int8Quantize(
          org.apache.spark.sql.functions.col("embedding"),
          graft.similarity.Similarity.int8Scale(
            org.apache.spark.sql.functions.col("embedding"))))
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"operator must not shuffle (chunk/quantize is scan-throughput work):\n$plan")
    }
  }

  test("q121 quality gate: the only nested loops attach scalar aggregate rows") {
    // audit the LOGICAL plan (the AQE wrapper hides physical children until
    // execution): every join with no condition must have two single-row
    // aggregate inputs — the deliberate scalar-attach shape, never data×data
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    val qe = SparkEntry.queries("q121_quality_checks")(spark, sfDir).queryExecution
    def isScalarAgg(p: LogicalPlan): Boolean =
      p.collectFirst { case a: Aggregate if a.groupingExpressions.isEmpty => a }.isDefined
    val unconditioned = qe.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j }
    assert(unconditioned.nonEmpty, "expected the deliberate scalar-attach join")
    unconditioned.foreach { j =>
      assert(isScalarAgg(j.left) && isScalarAgg(j.right),
        s"condition-less join has a data-bearing side:\n$j")
    }
  }

  test("q125 skyline: exactly one window runs unpartitioned, and only over the bucket frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("q125_skyline")(spark, sfDir).queryExecution
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(windows.size >= 3, s"expected the carry + two sweep windows, saw ${windows.size}")
    // the single global window is the per-BUCKET running min — its input is
    // one row per bucket, bounded by x-range/bucketWidth, never by |rows|
    assert(unpartitioned.size == 1,
      s"only the bucket-carry window may be unpartitioned, saw ${unpartitioned.size}")
    assert(unpartitioned.head.expressions.exists(_.references.exists(_.name == "__bmin")),
      "the unpartitioned window must be the bucket-min carry, not a data window")
  }

  test("q138 rollup: all three levels in ONE aggregation pass (Expand + single hash exchange)") {
    val plan = SparkEntry.queries("q138_rollup_revenue")(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup must plan as Expand, not a union of scans:\n$plan")
    // one hash exchange for the grouped agg + the presentation sort's range
    // exchange; the base joins broadcast (dims are tiny at every sf)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"rollup must aggregate in one shuffle:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"rollup must combine map-side before the exchange:\n$plan")
  }

  test("q136 variant: parquet scan reads only the two needed columns") {
    val plan = SparkEntry.queries("q136_variant_json")(spark, sfDir).queryExecution.executedPlan.toString
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("event_type") && read.contains("props") && !read.contains("user_id"),
      s"variant extraction must prune the scan to (event_type, props):\n$read")
  }

  test("q142 profile: six columns of stats read the table ONCE") {
    val plan = SparkEntry.queries("q142_column_profile")(spark, sfDir).queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"profile must not scan per column ($scans scans):\n$plan")
    assert(plan.contains("Expand"), s"multi-column distinct must plan as one Expand pass:\n$plan")
  }

  test("flat-index cell assignment is map-only: zero Exchange, zero Window (codegen argmin)") {
    // the incremental semantic-dedup hot path (q70 and every q152
    // micro-batch) assigns new vectors against the FLAT stored codebook;
    // this must be the same map-only NearestCentroid shape the two-level
    // path uses — the previous cross-join+row_number form paid an n·k-row
    // shuffle per batch
    import spark.implicits._
    val centroids = Seq( // deliberately NON-contiguous cell ids
      (3, Seq(0.0, 0.0)), (7, Seq(10.0, 0.0)), (9, Seq(0.0, 10.0)))
      .toDF("cell", "centroid")
    val keyed = Seq(
      (1L, Seq(1.0f, 1.0f)),   // nearest (0,0) → cell 3
      (2L, Seq(9.0f, 1.0f)),   // nearest (10,0) → cell 7
      (3L, Seq(1.0f, 9.0f)),   // nearest (0,10) → cell 9
      (4L, Seq(6.0f, 6.0f)))   // equidistant to 7 and 9 (d²=52) → tie to lower cell 7
      .toDF("doc_id", "v")
    val out = graft.dedup.Dedup.assignCells(keyed, centroids)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"flat assignment must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"flat assignment must not window:\n$plan")
    assert(!plan.contains("Join"), s"flat assignment must not join:\n$plan")
    val got = out.select("doc_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 7, 3L -> 9, 4L -> 7))
  }

  test("q127 prefix join: no exchange ever carries a string — grams shuffle as hashed longs") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val qe = SparkEntry.queries("q127_prefix_join")(spark, sfDir).queryExecution
    val offenders = qe.executedPlan.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.dataType == StringType) =>
        e.output.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", ")
    }
    assert(offenders.isEmpty,
      s"string columns found in shuffle exchanges:\n${offenders.mkString("\n")}")
  }

  test("indexed LM scoring: bucket-pruned bigram scan, equi-joins, text never shuffles") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val docs = Tables.documents(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("gate_lm_").toString
    graft.functions.LmPerplexity.buildLmIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
    val (out, release) = graft.functions.LmPerplexity.perplexityIndexedStaged(
      spark, idx, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    try {
      val qe = out.queryExecution
      val plan = qe.executedPlan.toString
      // the request batch's bigram buckets must prune the model scan's FILE
      // LISTING (the bm25TopKIndexed probe discipline)
      assert(plan.contains("PartitionFilters") && plan.contains("bb#"),
        s"bigram scan must be bucket-pruned via partition filters:\n$plan")
      // model lookups are equi-joins on 8-byte ids; V is a driver literal,
      // so NOTHING nested-loops
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"no nested loop in LM scoring (V is a codegen literal):\n$plan")
      assert(!plan.contains("CartesianProduct"), "no cartesian in LM scoring")
      // no shuffle carries document text — scoring moves ids and doubles
      val offenders = qe.executedPlan.collect {
        case e: ShuffleExchangeExec if e.output.exists(a =>
            a.dataType == StringType && a.name != "batch") =>
          e.output.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", ")
      }
      assert(offenders.isEmpty,
        s"string columns found in LM scoring exchanges:\n${offenders.mkString("\n")}")
    } finally release()
  }
}
