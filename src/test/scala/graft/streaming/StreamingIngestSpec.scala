package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.{FType, FeatureDef, FeatureGroup, FeatureStore}

/** End-to-end streaming ingest: MemoryStream → foreachBatch → FeatureStore.
  * Asserts the online snapshot equals the batch argmax over everything
  * streamed (including out-of-order event times across micro-batches), and
  * that offline history retains every streamed row exactly once.
  */
class StreamingIngestSpec extends SparkSpec {

  test("streamed micro-batches land in both stores; online == argmax") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val fs = new FeatureStore(spark, Files.createTempDirectory("si_spec_").toString)
    fs.createGroup(FeatureGroup("ev", "user_id", "ts", Seq(
      FeatureDef("user_id", FType.Integral),
      FeatureDef("ts", FType.FTimestamp),
      FeatureDef("event_id", FType.Integral),
      FeatureDef("event_type", FType.FString),
      FeatureDef("value", FType.Fractional))))

    // unique ts per event: the store breaks ts ties by INGEST seq (arrival),
    // which shuffled micro-batches make nondeterministic — not under test here
    val rng = new scala.util.Random(31)
    val tsPerm = rng.shuffle((0 until 60).toVector)
    val events = Seq.tabulate(60) { i =>
      KeyedEvent(rng.nextInt(6).toLong,
        new java.sql.Timestamp(1700000000000L + tsPerm(i) * 1000L),
        i.toLong, "e", rng.nextDouble())
    }

    val source = MemoryStream[KeyedEvent]
    // default trigger: keep the query alive across the three addData rounds
    // (AvailableNow would drain the first batch and stop)
    val q = StreamingIngest.start(fs, "ev", source.toDF(),
      Files.createTempDirectory("si_ckpt_").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      rng.shuffle(events).grouped(20).foreach { batch =>
        source.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(fs.offline("ev").count() == 60, "offline history keeps every streamed row once")

    val online = fs.online("ev").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    val expected = events.groupBy(_.user_id).map { case (k, es) =>
      k -> es.maxBy(_.ts.getTime).event_id
    }
    assert(online == expected)
  }
}
