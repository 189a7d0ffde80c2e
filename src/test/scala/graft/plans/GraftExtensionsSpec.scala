package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CosineSimilarity

class GraftExtensionsSpec extends SparkSpec {

  test("cosine_sim is callable from SQL text and agrees with the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vec_pairs")
    val fromSql = spark.sql("SELECT cosine_sim(a, b) AS c FROM vec_pairs").as[Double].head()
    val fromCol = spark.table("vec_pairs")
      .select(CosineSimilarity(col("a"), col("b")).as("c")).as[Double].head()
    assert(fromSql == fromCol)
    assert(math.abs(fromSql - 10.0 / 14.0) < 1e-12) // (3+4+3)/(|a||b|)=10/14
  }

  test("cosine_sim rejects wrong arity and non-array inputs") {
    GraftExtensions.register(spark)
    intercept[Exception] { spark.sql("SELECT cosine_sim(1)").collect() }
    intercept[Exception] { spark.sql("SELECT cosine_sim('x', 'y')").collect() }
  }

  test("bottom_k is callable from SQL text and agrees with the Column-API udaf") {
    import graft.functions.BottomK
    import org.apache.spark.sql.Encoders
    import spark.implicits._
    GraftExtensions.register(spark)
    val rng = new scala.util.Random(13)
    Seq.tabulate(200)(i => (s"g${rng.nextInt(4)}", s"p${rng.nextInt(50)}"))
      .toDF("g", "p").createOrReplaceTempView("bk_rows")
    val fromSql = spark.sql(
        "SELECT g, bottom_k(md5(p), p, 3) AS s FROM bk_rows GROUP BY g")
      .as[(String, Seq[String])].collect().map { case (g, s) => g -> s }.toMap
    val bk = udaf(new BottomK(3), Encoders.product[BottomK.In])
    val fromCol = spark.table("bk_rows").groupBy($"g").agg(bk(md5($"p"), $"p").as("s"))
      .as[(String, Seq[String])].collect().map { case (g, s) => g -> s }.toMap
    assert(fromSql == fromCol && fromSql.nonEmpty)
    assert(fromSql.values.forall(_.size == 3))
    // k must be a literal, like round(x, 2)
    intercept[Exception] {
      spark.sql("SELECT g, bottom_k(md5(p), p, length(p)) FROM bk_rows GROUP BY g").collect()
    }
  }

  test("table-valued serving faces from SQL text equal the Column API; tuning args must be literals") {
    import graft.dedup.Dedup
    import graft.functions.{LexicalRetrieval, LmPerplexity}
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Seq(
      (1L, "spark window spark hash"),
      (2L, "hash join scan window"),
      (3L, "spark window spark hash"), // exact dup of doc 1
      (4L, "merge sort window spark"),
      (5L, "")).toDF("doc_id", "text")
    val docsPath = java.nio.file.Files.createTempDirectory("tvf_docs_")
      .resolve("docs").toString
    docs.write.parquet(docsPath)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().toSeq

    // dedup_exact_marks ≡ Dedup.exact
    val marksSql = spark.sql(
      s"SELECT * FROM dedup_exact_marks('$docsPath', 'doc_id', 'text') ORDER BY text_hash")
    val marksCol = Dedup.exact(spark.read.parquet(docsPath), "doc_id", "text")
      .orderBy("text_hash")
    assert(rows(marksSql) == rows(marksCol) && marksSql.count() == 4)

    // bm25_topk ≡ bm25TopKIndexed over the same persisted index
    val idx = java.nio.file.Files.createTempDirectory("tvf_bm25_").toString
    LexicalRetrieval.buildBm25Index(docs, "doc_id", "text", idx)
    val bmSql = spark.sql(s"SELECT * FROM bm25_topk('$idx', 'spark window', 3) ORDER BY rank")
    val bmCol = LexicalRetrieval.bm25TopKIndexed(spark, idx,
        Seq((1L, Seq("spark", "window"))).toDF("query_id", "terms"), k = 3)
      .select("rank", "doc_id", "dl", "score").orderBy("rank")
    assert(rows(bmSql) == rows(bmCol) && bmSql.count() == 3)

    // lm_ppl ≡ perplexityIndexed against the same persisted LM
    val lm = java.nio.file.Files.createTempDirectory("tvf_lm_").toString
    LmPerplexity.buildLmIndex(docs.filter($"doc_id" <= 3), "doc_id", "text", lm)
    val pplSql = spark.sql(s"SELECT * FROM lm_ppl('$lm', '$docsPath') ORDER BY doc_id")
    val pplCol = LmPerplexity.perplexityIndexed(spark, lm,
        spark.read.parquet(docsPath).select("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
    assert(rows(pplSql) == rows(pplCol) && pplSql.count() == 5)

    // ann_topk ≡ ivfTopKIndexed over the same persisted IVF index
    import graft.similarity.Similarity
    val vecs = (1L to 40L).map(i =>
        (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val vPath = java.nio.file.Files.createTempDirectory("tvf_vecs_")
      .resolve("vecs").toString
    vecs.write.parquet(vPath)
    val vIdx = java.nio.file.Files.createTempDirectory("tvf_ivf_").toString
    Dedup.buildSemanticIndex(spark.read.parquet(vPath), "vec_id", "embedding",
      vIdx, nClusters = 4)
    val qPath = java.nio.file.Files.createTempDirectory("tvf_annq_")
      .resolve("q").toString
    spark.read.parquet(vPath).filter($"vec_id" <= 3).write.parquet(qPath)
    val annSql = spark.sql(
      s"SELECT * FROM ann_topk('$vIdx', '$qPath', 3, 2) ORDER BY query_id, nbr_rank")
    val annCol = Similarity.ivfTopKIndexed(spark, vIdx,
        spark.read.parquet(qPath), "vec_id", "embedding", k = 3, nProbe = 2)
      .orderBy("query_id", "nbr_rank")
    assert(rows(annSql) == rows(annCol) && annSql.count() == 9)
    // self-match serves at rank 1, cosine 1 (no exclusion on the SQL face)
    assert(rows(annSql).filter(_.getLong(1) == 1L)
      .forall(r => r.getLong(0) == r.getLong(2)))

    // paths/queries must be literals — a column reference fails loudly
    intercept[Exception] {
      spark.sql(s"SELECT * FROM bm25_topk(1, 'x', 2)").collect()
    }
  }

  test("SQL DML faces: feature_store_merge applies CDC upserts + deletes; feature_store_delete erases; bad arguments fail loudly") {
    import graft.core.{FType, FeatureDef, FeatureGroup, FeatureStore}
    import spark.implicits._
    GraftExtensions.register(spark)
    val sd = java.nio.file.Files.createTempDirectory("dml_store_").toString
    val fs = new FeatureStore(spark, sd)
    fs.createGroup(FeatureGroup("g", "k", "t", Seq(
      FeatureDef("k", FType.Integral),
      FeatureDef("t", FType.FTimestamp),
      FeatureDef("v", FType.Integral))))
    fs.ingest("g", Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (2L, ts("2024-01-01 00:00:00"), 20L),
      (3L, ts("2024-01-01 00:00:00"), 30L)).toDF("k", "t", "v"))

    // CDC batch: k=1 updated twice (later t wins), k=2 deleted, k=4 inserted
    val chPath = java.nio.file.Files.createTempDirectory("dml_ch_")
      .resolve("ch").toString
    Seq(
      (1L, ts("2024-01-02 00:00:00"), 11L, "U"),
      (1L, ts("2024-01-03 00:00:00"), 12L, "U"),
      (2L, ts("2024-01-02 00:00:00"), 0L, "D"),
      (4L, ts("2024-01-02 00:00:00"), 40L, "U"))
      .toDF("k", "t", "v", "op").write.parquet(chPath)
    val summary = spark.sql(
      s"SELECT * FROM feature_store_merge('$sd', 'g', '$chPath', 'op')")
      .collect().head
    assert(summary.getLong(0) == 2L && summary.getLong(1) == 1L,
      s"2 net upserts + 1 delete, got $summary")
    val afterMerge = fs.online("g").select("k", "v").as[(Long, Long)]
      .collect().toMap
    assert(afterMerge == Map(1L -> 12L, 3L -> 30L, 4L -> 40L),
      s"merge must net per key, upsert, and delete: $afterMerge")

    // DELETE-shaped statement: explicit key list
    val del = spark.sql(
      s"SELECT * FROM feature_store_delete('$sd', 'g', '1, 4')").collect().head
    assert(del.getLong(0) == 2L)
    val afterDelete = fs.online("g").select("k", "v").as[(Long, Long)]
      .collect().toMap
    assert(afterDelete == Map(3L -> 30L), s"delete must erase 1 and 4: $afterDelete")

    // argument contract: missing op column, empty key list, non-literal args
    intercept[Exception] {
      spark.sql(s"SELECT * FROM feature_store_merge('$sd', 'g', '$chPath', 'nope')").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM feature_store_delete('$sd', 'g', ' , ')").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM feature_store_delete('$sd', 'g', k)").collect()
    }
    // and the statement that failed must not have changed the store
    assert(fs.online("g").count() == 1L)
  }

  test("DML statements execute at EXECUTION time: EXPLAIN and a failed outer analysis leave the store untouched; NULL op upserts") {
    import graft.core.{FType, FeatureDef, FeatureGroup, FeatureStore}
    import spark.implicits._
    GraftExtensions.register(spark)
    val sd = java.nio.file.Files.createTempDirectory("dml_exec_store_").toString
    val fs = new FeatureStore(spark, sd)
    fs.createGroup(FeatureGroup("g", "k", "t", Seq(
      FeatureDef("k", FType.Integral),
      FeatureDef("t", FType.FTimestamp),
      FeatureDef("v", FType.Integral))))
    fs.ingest("g", Seq((1L, ts("2024-01-01 00:00:00"), 10L)).toDF("k", "t", "v"))
    val chPath = java.nio.file.Files.createTempDirectory("dml_exec_ch_")
      .resolve("ch").toString
    Seq(
      (2L, ts("2024-01-02 00:00:00"), 20L, "U"),
      (3L, ts("2024-01-02 00:00:00"), 30L, null.asInstanceOf[String]), // NULL op ⇒ upsert, not vanish
      (1L, ts("2024-01-02 00:00:00"), 0L, "D"))
      .toDF("k", "t", "v", "op").write.parquet(chPath)
    val mergeSql = s"SELECT * FROM feature_store_merge('$sd', 'g', '$chPath', 'op')"
    def state(): (Seq[Long], Map[Long, Long]) =
      (fs.onlineVersions("g"),
        fs.online("g").select("k", "v").as[(Long, Long)].collect().toMap)
    val before = state()

    // EXPLAIN plans the command but must not run it (ExplainCommand
    // re-plans its child with command execution SKIPped)
    val plan = spark.sql(s"EXPLAIN EXTENDED $mergeSql").as[String].head()
    assert(plan.contains("FeatureStoreMergeCommand"), s"plan was:\n$plan")
    assert(state() == before, "EXPLAIN must not commit the merge")

    // an outer query that fails ANALYSIS after the TVF resolves must not
    // commit either — the round-11 verdict's footgun
    intercept[Exception] {
      spark.sql(s"SELECT bogus_col FROM feature_store_merge('$sd', 'g', '$chPath', 'op')")
    }
    assert(state() == before, "a failed outer analysis must not commit the merge")
    spark.sql(s"EXPLAIN SELECT * FROM feature_store_delete('$sd', 'g', '1')").collect()
    spark.sql(s"EXPLAIN SELECT * FROM feature_store_compact('$sd', 'g')").collect()
    assert(state() == before, "EXPLAIN must not compact/delete")

    // executing the statement commits it — and the NULL-op row UPSERTS
    // (null-safe comparison; previously it silently vanished)
    val sum = spark.sql(mergeSql).collect().head
    assert(sum.getLong(0) == 2L && sum.getLong(1) == 1L, s"got $sum")
    assert(state()._2 == Map(2L -> 20L, 3L -> 30L),
      "NULL-op row must upsert; 'D' row must delete")
  }

  test("SQL maintenance statements: compact folds tombstones, vacuum drops superseded snapshots, index_vacuum erases below the floor") {
    import graft.core.{FType, FeatureDef, FeatureGroup, FeatureStore}
    import spark.implicits._
    GraftExtensions.register(spark)
    val sd = java.nio.file.Files.createTempDirectory("mnt_store_").toString
    val fs = new FeatureStore(spark, sd)
    fs.createGroup(FeatureGroup("g", "k", "t", Seq(
      FeatureDef("k", FType.Integral),
      FeatureDef("t", FType.FTimestamp),
      FeatureDef("v", FType.Integral),
      FeatureDef("s", FType.FString))))
    val sentinel = "GDPR_SENTINEL_7c4f1e"
    (1 to 4).foreach { i =>
      fs.ingest("g", Seq((i.toLong, ts(s"2024-01-0$i 00:00:00"), i * 10L,
        if (i == 2) sentinel else s"plain$i")).toDF("k", "t", "v", "s"))
    }
    spark.sql(s"SELECT * FROM feature_store_delete('$sd', 'g', '2')").collect()

    // the documented GDPR pipeline, entirely from SQL: delete → compact → vacuum
    val nFiles = spark.sql(s"SELECT * FROM feature_store_compact('$sd', 'g')")
      .collect().head.getLong(0)
    assert(nFiles > 0L)
    // post-compaction the deleted key is PHYSICALLY absent from history
    assert(fs.offline("g").filter($"k" === 2L).count() == 0L)
    assert(fs.online("g").select("k").as[Long].collect().toSet == Set(1L, 3L, 4L))

    val vac = spark.sql(s"SELECT * FROM feature_store_vacuum('$sd', 'g', 1)")
      .collect().head
    assert(vac.getLong(0) >= 1L, s"4 ingests + a delete must leave versions to drop: $vac")
    assert(fs.online("g").count() == 3L, "vacuum never drops LATEST")

    // BYTE-LEVEL absence through the statement path alone: after
    // delete → compact → vacuum, NO file under the store still holds the
    // erased record's sentinel bytes (parquet history, online snapshots,
    // serving KV — everything)
    {
      import java.nio.file.{Files => JFiles, Paths}
      val walk = JFiles.walk(Paths.get(sd))
      val holders = try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(JFiles.isRegularFile(_)).filter { f =>
          new String(JFiles.readAllBytes(f),
            java.nio.charset.StandardCharsets.ISO_8859_1).contains(sentinel)
        }.toList
      } finally walk.close()
      assert(holders.isEmpty,
        s"erased bytes survive the SQL GDPR pipeline in: $holders")
    }

    // index_vacuum: statement face over a persisted BM25 family
    import graft.functions.LexicalRetrieval
    val docs = Seq((1L, "spark window hash"), (2L, "hash join scan"))
      .toDF("doc_id", "text")
    val fam = java.nio.file.Files.createTempDirectory("mnt_fam_").toString
    LexicalRetrieval.buildBm25Index(docs, "doc_id", "text", fam)
    LexicalRetrieval.deleteFromBm25Index(Seq(2L).toDF("doc_id"), "doc_id", fam, "d1")
    LexicalRetrieval.compactBm25Index(spark, fam)
    val iv = spark.sql(s"SELECT * FROM index_vacuum('$fam')").collect().head
    assert(iv.getString(0) == fam && iv.getBoolean(1))
    val hits = spark.sql(s"SELECT * FROM bm25_topk('$fam', 'hash', 5)")
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L), s"post-vacuum serve must still exclude the erased doc: $hits")
  }

  test("DDL + evolution statements: the whole group lifecycle from SQL text; EXPLAIN stays side-effect free") {
    import graft.core.FeatureStore
    import spark.implicits._
    GraftExtensions.register(spark)
    val sd = java.nio.file.Files.createTempDirectory("ddl_store_").toString
    val fs = new FeatureStore(spark, sd)

    // EXPLAIN of DDL must not create
    spark.sql(s"EXPLAIN SELECT * FROM feature_store_create('$sd', 'g', 'k', 't', 'k:integral,t:timestamp,v:integral')")
      .collect()
    assert(!fs.groupExists("g"), "EXPLAIN must not create the group")

    val created = spark.sql(
      s"SELECT * FROM feature_store_create('$sd', 'g', 'k', 't', 'k:integral,t:timestamp,v:integral')")
      .collect().head
    assert(created.getBoolean(0) && created.getLong(1) == 3L && fs.groupExists("g"))
    // bad schema entries and duplicate creates fail loudly
    intercept[Exception] {
      spark.sql(s"SELECT * FROM feature_store_create('$sd', 'g2', 'k', 't', 'k integral')").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM feature_store_create('$sd', 'g', 'k', 't', 'k:integral,t:timestamp')").collect()
    }

    fs.ingest("g", Seq((1L, ts("2024-01-01 00:00:00"), 10L)).toDF("k", "t", "v"))

    // evolution from SQL: add, widen, rename, drop — with describe between
    assert(spark.sql(s"SELECT * FROM feature_store_add_feature('$sd', 'g', 'w', 'string')")
      .collect().head.getLong(0) == 4L)
    assert(spark.sql(s"SELECT * FROM feature_store_widen_feature('$sd', 'g', 'v', 'fractional')")
      .collect().head.getLong(0) == 4L)
    assert(fs.getRecord("g", 1L).get("v") == "10.0", "widen statement materialized")
    assert(spark.sql(s"SELECT * FROM feature_store_rename_feature('$sd', 'g', 'v', 'val')")
      .collect().head.getLong(0) == 4L)
    assert(fs.getRecord("g", 1L).get("val") == "10.0", "rename statement era-resolves")
    assert(spark.sql(s"SELECT * FROM feature_store_drop_feature('$sd', 'g', 'w')")
      .collect().head.getLong(0) == 3L)

    // describe is a READ face: declared view, key/event-time flags, PLUS
    // the lingering-column registry ('w' was dropped with history and the
    // rename vacated 'v' — both names' bytes linger until compaction, so
    // their claim-guard rows show)
    val desc = spark.sql(s"SELECT * FROM feature_store_describe('$sd', 'g') ORDER BY feature")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getString(5))).toSeq
    assert(desc == Seq(("k", "Integral", true, "declared"),
      ("t", "Timestamp", false, "declared"),
      ("v", "Fractional", false, "lingering_pending_compaction"),
      ("val", "Fractional", false, "declared"),
      ("w", "String", false, "lingering_pending_compaction")), s"describe read: $desc")
    // a different-type re-add is refused FROM SQL with the recovery named;
    // compaction erases the orphans, clears the registry row, and unblocks
    val refuse = intercept[Exception] {
      spark.sql(s"SELECT * FROM feature_store_add_feature('$sd', 'g', 'w', 'integral')").collect()
    }
    assert(refuse.getMessage.contains("compactOffline"), refuse.getMessage)
    spark.sql(s"SELECT * FROM feature_store_compact('$sd', 'g')").collect()
    assert(spark.sql(s"SELECT * FROM feature_store_describe('$sd', 'g')")
      .where("state = 'lingering_pending_compaction'").count() == 0L,
      "compaction must clear the registry face")
    assert(spark.sql(s"SELECT * FROM feature_store_add_feature('$sd', 'g', 'w', 'integral')")
      .collect().head.getLong(0) == 4L, "post-compaction different-type re-add flows")

    // drop_group tears down; a second drop reports not-found
    assert(spark.sql(s"SELECT * FROM feature_store_drop_group('$sd', 'g')")
      .collect().head.getBoolean(0))
    assert(!fs.groupExists("g"))
    assert(!spark.sql(s"SELECT * FROM feature_store_drop_group('$sd', 'g')")
      .collect().head.getBoolean(0))
  }

  test("zorder2 and hash_split_bucket are callable from SQL and agree with the Column API") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    GraftExtensions.register(spark)
    val z = spark.sql("SELECT zorder2(3, 5, 4) AS z").as[Long].head()
    val zCol = Seq((3L, 5L)).toDF("a", "b")
      .select(GraftFunctions.zOrder2(col("a"), col("b"), bits = 4).as("z")).as[Long].head()
    // a=3 (bits 0,1 → z bits 0,2), b=5 (bits 0,2 → z bits 1,5): 1+2+4+32
    assert(z == zCol && z == 39L, s"zorder2(3,5,4) = $z")
    val b = spark.sql("SELECT hash_split_bucket('doc-42', 100) AS b").as[Long].head()
    val bCol = Seq("doc-42").toDF("k")
      .select(GraftFunctions.hashSplitBucket(col("k"), 100).as("b")).as[Long].head()
    assert(b == bCol && b >= 0 && b < 100)
    // tuning args must be literals, like Spark's own round(x, 2)
    intercept[Exception] {
      spark.sql("SELECT zorder2(1, 2, CAST(rand()*4 AS INT))").collect()
    }
  }

  test("zorder_n (N columns from SQL) agrees with the Column API and with zorder2 at n=2") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    GraftExtensions.register(spark)
    val z3 = spark.sql("SELECT zorder_n(3, 5, 6, 3) AS z").as[Long].head()
    val z3Col = Seq((3L, 5L, 6L)).toDF("a", "b", "c")
      .select(GraftFunctions.zOrderN(Seq(col("a"), col("b"), col("c")), bits = 3).as("z"))
      .as[Long].head()
    assert(z3 == z3Col, s"zorder_n SQL $z3 != Column $z3Col")
    // n=2 via zorder_n == zorder2 (same bit layout by construction)
    val z2a = spark.sql("SELECT zorder_n(3, 5, 4) AS z").as[Long].head()
    val z2b = spark.sql("SELECT zorder2(3, 5, 4) AS z").as[Long].head()
    assert(z2a == z2b && z2a == 39L)
    intercept[Exception] { // n*bits must fit a signed long
      spark.sql("SELECT zorder_n(1, 2, 3, 22)").collect()
    }
  }

  // ---- asof_on SQL surface (AsOfSql.scala). The session is built with
  //      spark.sql.extensions=GraftExtensions (SparkSpec), so the analyzer
  //      rule is active; GraftExtensions.register alone cannot add rules.

  private def asofFixture(): Unit = {
    import spark.implicits._
    // left: probes at t=5,15,25 for two keys; right: updates at t=10,20
    Seq((1L, 5L), (1L, 15L), (1L, 25L), (2L, 15L))
      .toDF("k", "t").selectExpr("k", "timestamp_micros(t * 1000000) AS t")
      .createOrReplaceTempView("asof_l")
    Seq((1L, 10L, "a", 1), (1L, 20L, "b", 2), (1L, 10L, "c", 3), (9L, 1L, "z", 9))
      .toDF("k", "t", "v", "tb")
      .selectExpr("k", "timestamp_micros(t * 1000000) AS t", "v", "tb")
      .createOrReplaceTempView("asof_r")
  }

  test("asof_on rewrites a marked LEFT JOIN to the library as-of plan (SQL ≡ Column API)") {
    asofFixture()
    val sql = spark.sql("""
      SELECT l.k, l.t, asof_v, asof_tb, asof_t
      FROM asof_l l LEFT JOIN asof_r r ON asof_on(l.k, r.k, l.t, r.t, r.tb)
      ORDER BY l.k, l.t""")
    val lib = graft.operators.AsOfJoin.backward(
        spark.table("asof_l"), spark.table("asof_r"),
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
        rightTiebreak = "tb", rightValueCols = Seq("v", "tb"))
      .select("k", "t", "asof_v", "asof_tb", "asof_t")
      .orderBy("k", "t")
    assert(sql.collect().toSeq == lib.collect().toSeq)
    // semantics spot-check: t=15 → the t=10 row with max tiebreak (c,3);
    // key 2 never matches; the marker is gone from the analyzed plan
    val rows = sql.collect()
    assert(rows.map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
      Option(r.getString(2)))).toSeq == Seq(
      (1L, 5L, None), (1L, 15L, Some("c")), (1L, 25L, Some("b")),
      (2L, 15L, None)))
    assert(!sql.queryExecution.analyzed.toString.contains("asof_on"))
  }

  test("asof_on inlines WITH-defined join inputs, including one CTE used by both sides") {
    asofFixture()
    val sql = spark.sql("""
      WITH base AS (SELECT k, t, CAST(NULL AS STRING) AS v, 0 AS tb FROM asof_l
                    UNION ALL SELECT k, t, v, tb FROM asof_r),
           l AS (SELECT k, t FROM base WHERE v IS NULL),
           r AS (SELECT k, t, v, tb FROM base WHERE v IS NOT NULL)
      SELECT l.k, l.t, asof_v
      FROM l LEFT JOIN r ON asof_on(l.k, r.k, l.t, r.t, r.tb)
      ORDER BY l.k, l.t""")
    assert(sql.collect().map(r => Option(r.getString(2))).toSeq ==
      Seq(None, Some("c"), Some("b"), None))
  }

  test("asof_on honors a tolerance literal and rejects non-LEFT joins") {
    asofFixture()
    // 6s tolerance: t=15 still matches t=10 (5s stale); t=25 loses t=20? no —
    // 5s stale too, but t=25 vs t=10 would be 15s: only the argmax row counts
    val tol = spark.sql("""
      SELECT l.k, l.t, asof_v
      FROM asof_l l LEFT JOIN asof_r r ON asof_on(l.k, r.k, l.t, r.t, r.tb, '6 seconds')
      ORDER BY l.k, l.t""").collect().map(r => Option(r.getString(2))).toSeq
    assert(tol == Seq(None, Some("c"), Some("b"), None))
    val tight = spark.sql("""
      SELECT l.k, l.t, asof_v
      FROM asof_l l LEFT JOIN asof_r r ON asof_on(l.k, r.k, l.t, r.t, r.tb, '3 seconds')
      ORDER BY l.k, l.t""").collect().map(r => Option(r.getString(2))).toSeq
    assert(tight == Seq(None, None, None, None)) // every match >3s stale → nulled
    intercept[Exception] {
      spark.sql("""SELECT l.k FROM asof_l l JOIN asof_r r
        ON asof_on(l.k, r.k, l.t, r.t, r.tb)""").collect()
    }
  }

  test("asof_on combined with extra ON predicates fails with the contract, not a planner error") {
    asofFixture()
    val e = intercept[IllegalArgumentException] {
      spark.sql("""SELECT l.k FROM asof_l l LEFT JOIN asof_r r
        ON asof_on(l.k, r.k, l.t, r.t, r.tb) AND l.k = 'a'""").collect()
    }
    assert(e.getMessage.contains("ENTIRE ON clause"),
      s"expected the contract message, got: ${e.getMessage}")
  }
}
