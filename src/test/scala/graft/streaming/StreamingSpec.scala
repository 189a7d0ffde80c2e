package graft.streaming

import scala.util.Random

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
}
