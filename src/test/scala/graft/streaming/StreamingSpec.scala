package graft.streaming

import scala.util.Random

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.LatestPerKey

/** The out-of-order correctness assertion promised in SURVEY.md §5.5: feed a
  * SHUFFLED (non-event-time-ordered) event set through the stateful streaming
  * latest-per-key in several micro-batches; the final state must equal the
  * batch argmax — the latent reference bug (arrival-order last-write-wins,
  * update_feature_store.py:26-27) fixed.
  */
class StreamingSpec extends SparkSpec {

  test("streaming latest-per-key over shuffled input == batch argmax") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rng = new Random(4242)
    val events = Seq.tabulate(120) { i =>
      KeyedEvent(
        user_id = rng.nextInt(10).toLong,
        ts = new java.sql.Timestamp(1700000000000L + rng.nextInt(20) * 1000L),
        event_id = i.toLong,
        event_type = "e",
        value = rng.nextDouble())
    }
    val shuffled = rng.shuffle(events)

    val source = MemoryStream[KeyedEvent]
    val q = StreamingLatest.latestPerKey(source.toDS())
      .writeStream.format("memory").queryName("latest_spec_out")
      .outputMode("update")
      .start()
    try {
      // three micro-batches, each internally disordered
      shuffled.grouped(40).foreach { batch =>
        source.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()

    // collapse per-batch update rows to final state per key
    val got = LatestPerKey.viaMaxBy(spark.table("latest_spec_out"), Seq("user_id"), "ts", Seq("event_id"))
      .as[KeyedEvent].collect().map(e => (e.user_id, e.ts, e.event_id)).toSet
    val expected = events.groupBy(_.user_id).map { case (k, es) =>
      val best = es.maxBy(e => (e.ts.getTime, e.event_id))
      (k, best.ts, best.event_id)
    }.toSet

    assert(got == expected)
  }

  test("TWS crash recovery: RocksDB state survives a stop-after-batch-N checkpoint restart") {
    // the q134 shape (latestPerKeyTWS) driven to a mid-stream stop and a
    // restart from the same checkpoint. Recovery is asserted through the
    // EMISSIONS of the post-restart batch, not a collapsed union (a
    // collapse would mask state loss): batch 2 sends u1 an OLDER event
    // than its batch-1 state, so only a recovered store emits the batch-1
    // winner; a fresh store would emit the stale batch-2 event as winner.
    val s2 = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v) catch { case _: Exception => () }
    }
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext

    def ev(u: Long, t: Long, id: Long) =
      KeyedEvent(u, new java.sql.Timestamp(t), id, "e", 1.0)
    val ckpt = java.nio.file.Files.createTempDirectory("tws_recover_").toString
    val source = MemoryStream[KeyedEvent]
    // memory sink refuses checkpoint recovery; foreachBatch (the production
    // sink shape here) supports it, and collects emissions per phase
    def run(buf: scala.collection.mutable.Set[(Long, Long, Long)]) = {
      val q = StreamingLatest.latestPerKeyTWS(source.toDS())
        .writeStream.outputMode("update").option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[KeyedEvent], _: Long) =>
          val rows = batch.collect().map(e => (e.user_id, e.ts.getTime, e.event_id))
          buf.synchronized { buf ++= rows }: Unit
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    // ---- run 1: one batch, then stop (the "crash") ----
    val p1 = scala.collection.mutable.Set[(Long, Long, Long)]()
    source.addData(Seq(ev(1L, 1000L, 1), ev(2L, 500L, 2)))
    run(p1)
    assert(p1.toSet == Set((1L, 1000L, 1L), (2L, 500L, 2L)))

    // ---- run 2: NEW query object, SAME checkpoint — state must come back ----
    val p2 = scala.collection.mutable.Set[(Long, Long, Long)]()
    source.addData(Seq(ev(1L, 900L, 3), ev(2L, 600L, 4)))
    run(p2)
    assert(p2.toSet == Set((1L, 1000L, 1L), (2L, 600L, 4L)),
      s"post-restart emissions must reflect recovered state, got $p2")
  }

  test("TWS crash recovery: bootstrapped initial state survives restart and is not re-applied") {
    // the q140 shape (latestPerKeyBootstrapped): initial state loads on the
    // FIRST run only; after a checkpoint restart the bootstrap's influence
    // must come back from the RocksDB store. Batch 2 probes both kinds of
    // recovered state: u7's only prior record is the BOOTSTRAP row (never
    // streamed, never emitted), u8's is a batch-1 STREAM winner.
    val s2 = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v) catch { case _: Exception => () }
    }
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext

    def ev(u: Long, t: Long, id: Long) =
      KeyedEvent(u, new java.sql.Timestamp(t), id, "e", 1.0)
    val ckpt = java.nio.file.Files.createTempDirectory("tws_boot_rec_").toString
    val init = Seq(ev(7L, 2000L, 70), ev(8L, 100L, 80)).toDS()
    val source = MemoryStream[KeyedEvent]
    def run(buf: scala.collection.mutable.Set[(Long, Long, Long)]) = {
      val q = StreamingLatest.latestPerKeyBootstrapped(source.toDS(), init)
        .writeStream.outputMode("update").option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[KeyedEvent], _: Long) =>
          val rows = batch.collect().map(e => (e.user_id, e.ts.getTime, e.event_id))
          buf.synchronized { buf ++= rows }: Unit
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    val p1 = scala.collection.mutable.Set[(Long, Long, Long)]()
    source.addData(Seq(ev(8L, 150L, 81)))
    run(p1)
    assert(p1.toSet == Set((8L, 150L, 81L)))

    val p2 = scala.collection.mutable.Set[(Long, Long, Long)]()
    source.addData(Seq(ev(7L, 1500L, 71), ev(8L, 120L, 82)))
    run(p2)
    assert(p2.toSet == Set((7L, 2000L, 70L), (8L, 150L, 81L)),
      s"bootstrap + stream state must both survive the restart, got $p2")
  }

  test("streaming sessionize: interior sessions emit immediately, open ones close by watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(user: Long, tsStr: String, id: Long) =
      KeyedEvent(user, java.sql.Timestamp.valueOf(tsStr), id, "e", 1.0)

    val source = MemoryStream[KeyedEvent]
    val q = StreamingSessionize.byGap(source.toDS(),
        watermarkDelay = "10 seconds", gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess_stream_out")
      .outputMode("append")
      .start()
    try {
      // batch 1: one user, two sessions inside the batch (2h apart, shuffled
      // order) — the interior session closes IMMEDIATELY on gap-split
      source.addData(Seq(
        ev(1L, "2024-01-01 10:31:00", 2), ev(1L, "2024-01-01 10:01:00", 1),
        ev(1L, "2024-01-01 13:00:00", 3)))
      q.processAllAvailable()
      val afterB1 = spark.table("sess_stream_out").as[ClosedSession].collect()
      assert(afterB1.map(s => (s.user_id, s.session_start.toString, s.n_events)).toSet ==
        Set((1L, "2024-01-01 10:01:00.0", 2L)),
        s"interior session must close on the in-batch gap split: ${afterB1.toSeq}")

      // batch 2: an event far in the future pushes the watermark past the
      // 13:00 session's end + gap → the open session times out and emits
      source.addData(Seq(ev(2L, "2024-01-02 09:00:00", 10)))
      q.processAllAvailable()
      // timeout processing happens on the batch AFTER the watermark advance
      source.addData(Seq(ev(2L, "2024-01-02 09:00:30", 11)))
      q.processAllAvailable()
      val closed = spark.table("sess_stream_out").as[ClosedSession].collect()
      assert(closed.exists(s => s.user_id == 1L && s.session_start.toString == "2024-01-01 13:00:00.0"
        && s.n_events == 1L), s"watermark must close the stale open session: ${closed.toSeq}")
      // user 2's session is still open (watermark has not passed its gap)
      assert(!closed.exists(_.user_id == 2L))
    } finally q.stop()
  }

  test("transformWithState latest-per-key == batch argmax; declarative TTL forgets quiet keys") {
    import scala.jdk.CollectionConverters._
    graft.QuerySuite.withStreamingConf(spark) { s =>  // TWS requires RocksDB
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rng = new Random(7)
      val events = Seq.tabulate(90) { i =>
        KeyedEvent(rng.nextInt(8).toLong,
          new java.sql.Timestamp(1700000000000L + rng.nextInt(20) * 1000L),
          i.toLong, "e", rng.nextDouble())
      }
      val source = MemoryStream[KeyedEvent]
      val q = StreamingLatest.latestPerKeyTWS(source.toDS())
        .writeStream.format("memory").queryName("tws_spec_out")
        .outputMode("update")
        .start()
      try {
        rng.shuffle(events).grouped(30).foreach { b =>
          source.addData(b); q.processAllAvailable()
        }
        val got = LatestPerKey.viaMaxBy(s.table("tws_spec_out"),
            Seq("user_id"), "ts", Seq("event_id"))
          .as[KeyedEvent].collect().map(e => (e.user_id, e.ts, e.event_id)).toSet
        val expected = events.groupBy(_.user_id).map { case (k, es) =>
          val best = es.maxBy(e => (e.ts.getTime, e.event_id))
          (k, best.ts, best.event_id)
        }.toSet
        assert(got == expected)
        // the modern API's state operator is live (TWS metrics present)
        val prog = q.recentProgress.reverse.find(_.stateOperators.nonEmpty).get
        assert(prog.stateOperators(0).operatorName.toLowerCase.contains("transformwithstate"),
          s"expected a transformWithState operator, got ${prog.stateOperators(0).operatorName}")
      } finally q.stop()

      // TTL: with a 1 ms wall-clock TTL, state written for key 1 is expired
      // by the time an event-time-OLDER record arrives — the older record
      // must WIN, proving the state was expired, not consulted ("the key
      // re-enters cold"; latest-per-key state is self-rebuilding, eviction
      // only widens the re-warm window). The TTL form runs under an
      // INTERVAL ProcessingTime trigger with sink-polling, never
      // AvailableNow/processAllAvailable: in ProcessingTime mode the
      // operator requests a follow-up batch after every batch (see the
      // latestPerKeyTWS caveat), so drain-style waits never return
      val src2 = MemoryStream[KeyedEvent]
      val q2 = StreamingLatest.latestPerKeyTWS(src2.toDS(),
          ttl = Some(java.time.Duration.ofMillis(1)))
        .writeStream.format("memory").queryName("tws_ttl_out")
        .outputMode("update")
        .trigger(Trigger.ProcessingTime("200 milliseconds"))
        .start()
      try {
        def waitForRows(n: Int): Set[(Long, Long)] = {
          val deadline = System.currentTimeMillis + 60000
          while (s.table("tws_ttl_out").count() < n &&
            System.currentTimeMillis < deadline) Thread.sleep(100)
          s.table("tws_ttl_out").as[KeyedEvent].collect()
            .map(e => (e.ts.getTime, e.event_id)).toSet
        }
        src2.addData(KeyedEvent(1L, new java.sql.Timestamp(2000L), 10L, "e", 1.0))
        assert(waitForRows(1) == Set((2000L, 10L)))
        Thread.sleep(150) // TTL is 1 ms — state is stale well before this
        src2.addData(KeyedEvent(1L, new java.sql.Timestamp(1000L), 5L, "e", 1.0))
        val rows = waitForRows(2)
        assert(rows == Set((2000L, 10L), (1000L, 5L)),
          s"expired state must not suppress the older event: $rows")
      } finally q2.stop()
    }
  }

  test("streaming top-k (TWS ListState) over shuffled batches == batch window top-k") {
    graft.QuerySuite.withStreamingConf(spark) { s =>
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rng = new Random(99)
      val events = Seq.tabulate(100) { i =>
        KeyedEvent(rng.nextInt(6).toLong,
          new java.sql.Timestamp(1700000000000L + i * 1000L),
          i.toLong, "e", (rng.nextInt(50) / 10.0))  // coarse values force ties
      }
      val source = MemoryStream[KeyedEvent]
      val q = StreamingTopK.topKPerKey(source.toDS(), k = 3)
        .writeStream.format("memory").queryName("topk_spec_out")
        .outputMode("update")
        .start()
      try {
        rng.shuffle(events).grouped(25).foreach { b =>
          source.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      // collapse: re-rank the union of emitted snapshots
      val got = s.table("topk_spec_out").distinct()
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy($"value".desc, $"event_id".desc)))
        .filter($"rn" <= 3)
        .select("user_id", "value", "event_id").as[(Long, Double, Long)]
        .collect().toSet
      val expected = events.groupBy(_.user_id).flatMap { case (k, es) =>
        es.sortBy(e => (-e.value, -e.event_id)).take(3)
          .map(e => (k, e.value, e.event_id))
      }.toSet
      assert(got == expected)
    }
  }

  test("inactivity timers (TWS event-time): quiet keys emit exactly once when the watermark proves it") {
    graft.QuerySuite.withStreamingConf(spark) { s =>
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      def ev(user: Long, sec: Long, id: Long) =
        KeyedEvent(user, new java.sql.Timestamp(sec * 1000L), id, "e", 1.0)
      val source = MemoryStream[KeyedEvent]
      val q = StreamingInactivity.inactiveKeys(
          source.toDS().withWatermark("ts", "10 seconds"), gapMs = 100000L)
        .writeStream.format("memory").queryName("inactive_spec_out")
        .outputMode("update")
        .start()
      try {
        def emitted() = s.table("inactive_spec_out")
          .as[StreamingInactivity.Inactive].collect()
          .map(i => (i.user_id, i.last_ts.getTime / 1000)).toSet

        // batch 1: two users at t=1000 → timers armed at 1100; wm → 990
        source.addData(Seq(ev(1L, 1000L, 1), ev(2L, 1000L, 2)))
        q.processAllAvailable()
        assert(emitted() == Set.empty, "nothing may fire before the watermark reaches a timer")

        // batch 2: u2 re-arms at 2100; a LATE u1 row (t=500 < wm 990) must
        // be dropped by the watermark, not re-arm u1; wm → 1990 ≥ 1100 →
        // u1's timer fires on the follow-up batch
        source.addData(Seq(ev(2L, 2000L, 3), ev(1L, 500L, 4)))
        q.processAllAvailable()
        assert(emitted() == Set((1L, 1000L)), s"u1 (quiet since 1000) must fire once: ${emitted()}")

        // batch 3: u3 arrives at t=5000 → wm 4990 ≥ 2100 → u2 fires; u3 armed
        source.addData(Seq(ev(3L, 5000L, 5)))
        q.processAllAvailable()
        assert(emitted() == Set((1L, 1000L), (2L, 2000L)),
          s"u2 fires with its true last event time; u3 stays armed: ${emitted()}")
      } finally q.stop()
    }
  }

  test("bootstrapped latest-per-key: initial state participates in the argmax; overlap is safe") {
    graft.QuerySuite.withStreamingConf(spark) { s =>
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      def ev(user: Long, t: Long, id: Long) =
        KeyedEvent(user, new java.sql.Timestamp(t), id, "e", 1.0)
      // bootstrap snapshot: u1@t100, u2@t200 (u2 never streams)
      val bootstrap = Seq(ev(1L, 100L, 1), ev(2L, 200L, 2)).toDS()
      val source = MemoryStream[KeyedEvent]
      val q = StreamingLatest.latestPerKeyBootstrapped(source.toDS(), bootstrap)
        .writeStream.format("memory").queryName("boot_spec_out")
        .outputMode("update")
        .start()
      try {
        // u1 streams an OLDER event (t50 < bootstrap t100): bootstrap wins;
        // u3 is stream-only; the bootstrap u1@t100 record also re-arrives in
        // the stream (overlap) — argmax makes the duplicate harmless
        source.addData(Seq(ev(1L, 50L, 3), ev(3L, 300L, 4), ev(1L, 100L, 1)))
        q.processAllAvailable()
        val got = s.table("boot_spec_out").as[KeyedEvent].collect()
          .map(e => e.user_id -> (e.ts.getTime, e.event_id)).toMap
        assert(got(1L) == (100L, 1L), s"bootstrap state must win the argmax: $got")
        assert(got(3L) == (300L, 4L))
        assert(!got.contains(2L), "keys quiet since cutover never emit (overlay convention)")
        // a NEWER stream event then overrides the bootstrap
        source.addData(Seq(ev(1L, 500L, 9)))
        q.processAllAvailable()
        val last = s.table("boot_spec_out").as[KeyedEvent].collect()
          .filter(_.user_id == 1L).maxBy(_.ts.getTime)
        assert((last.ts.getTime, last.event_id) == (500L, 9L))
      } finally q.stop()
    }
  }

  test("withStreamingConf: RocksDB provider really backs the state store; parent session untouched") {
    import scala.jdk.CollectionConverters._
    val parentPart = spark.conf.get("spark.sql.shuffle.partitions")
    graft.QuerySuite.withStreamingConf(spark) { s =>
      // the child session carries the streaming conf...
      assert(s.conf.get("spark.sql.shuffle.partitions") == "4")
      assert(s.conf.get("spark.sql.streaming.stateStore.providerClass")
        .endsWith("RocksDBStateStoreProvider"))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val source = MemoryStream[KeyedEvent]
      val q = StreamingLatest.latestPerKey(source.toDS())
        .writeStream.format("memory").queryName("rocksdb_spec_out")
        .outputMode("update")
        .start()
      try {
        source.addData(
          KeyedEvent(1L, new java.sql.Timestamp(2000L), 2L, "e", 2.0),
          KeyedEvent(1L, new java.sql.Timestamp(1000L), 1L, "e", 1.0))
        q.processAllAvailable()
        // ...and the running query's state operator reports RocksDB-specific
        // metrics — proof the provider is engaged, not merely configured
        val prog = q.recentProgress.reverse.find(_.stateOperators.nonEmpty).get
        val metricKeys = prog.stateOperators(0).customMetrics.keySet().asScala
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"state operator must expose RocksDB metrics, got: $metricKeys")
        // correctness unchanged under the provider swap: out-of-order input,
        // event-time argmax wins
        val out = LatestPerKey.viaMaxBy(s.table("rocksdb_spec_out"),
            Seq("user_id"), "ts", Seq("event_id"))
          .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
        assert(out == Map(1L -> 2L))
      } finally q.stop()
    }
    // the shared session never saw the streaming conf
    assert(spark.conf.get("spark.sql.shuffle.partitions") == parentPart)
    // (getOption surfaces the conf's DEFAULT — HDFSBacked — when unset)
    assert(!spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDB"))
  }

  test("TTL variant evicts quiet keys once the watermark passes their ttl") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(user: Long, tsStr: String, id: Long) =
      KeyedEvent(user, java.sql.Timestamp.valueOf(tsStr), id, "e", 1.0)

    val source = MemoryStream[KeyedEvent]
    val q = StreamingLatest.latestPerKeyWithTTL(source.toDS(),
        watermarkDelay = "10 seconds", ttl = "1 hour")
      .writeStream.format("memory").queryName("latest_ttl_out")
      .outputMode("update")
      .start()
    try {
      def stateRows: Long = {
        val p = q.recentProgress.reverse.find(_.stateOperators.nonEmpty).get
        p.stateOperators(0).numRowsTotal
      }
      // batch 1: two keys enter state
      source.addData(ev(1L, "2024-01-01 10:00:00", 1), ev(2L, "2024-01-01 10:00:00", 2))
      q.processAllAvailable()
      assert(stateRows == 2)
      // batch 2 advances the watermark to ~12:59:50 — past key 1's
      // 10:00 + 1h timeout; batch 3 fires the timeout and evicts key 1
      source.addData(ev(2L, "2024-01-01 13:00:00", 3))
      q.processAllAvailable()
      source.addData(ev(2L, "2024-01-01 13:00:30", 4))
      q.processAllAvailable()
      assert(stateRows == 1, "quiet key 1 must be evicted, active key 2 retained")
      // the active key's latest value is still correct after the eviction pass
      val out = LatestPerKey.viaMaxBy(spark.table("latest_ttl_out"), Seq("user_id"), "ts", Seq("event_id"))
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
      assert(out(2L) == 4L)
    } finally q.stop()
  }
}
