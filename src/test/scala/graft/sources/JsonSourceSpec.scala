package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** JSONL ingestion robustness (the q87 source format): a 100 TB log corpus
  * always contains malformed lines, and the production stance is PERMISSIVE
  * parse with the bad line CAPTURED — never a failed job (FAILFAST) and
  * never a silent drop (DROPMALFORMED without accounting). */
class JsonSourceSpec extends SparkSpec {

  test("malformed JSONL lines land in _corrupt_record; good lines parse") {
    val dir = Files.createTempDirectory("json_robust_")
    Files.writeString(dir.resolve("part-0.json"),
      """{"event_id": 1, "value": 1.5}
        |{"event_id": 2 "value": BROKEN
        |{"event_id": 3, "value": 3.0}
        |""".stripMargin)
    val df = spark.read
      .schema("event_id LONG, value DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column requires a materialized parse pass
    val rows = df.collect()
    assert(rows.length == 3, "every physical line accounted for")
    val good = rows.filter(_.getAs[String]("_corrupt_record") == null)
    assert(good.map(_.getAs[Long]("event_id")).toSet == Set(1L, 3L))
    val bad = rows.filter(_.getAs[String]("_corrupt_record") != null)
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("BROKEN"),
      "the malformed line is captured verbatim for quarantine, not dropped")
    df.unpersist()
  }
}
