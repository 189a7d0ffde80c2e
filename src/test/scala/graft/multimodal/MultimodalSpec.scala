package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def assets = {
    import spark.implicits._
    Multimodal.syntheticAssets(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"), (5L, "epsilon"), (6L, "zeta"))
        .toDF("doc_id", "text"), "doc_id", "text")
  }

  test("syntheticAssets covers all modalities with payloads and typed meta") {
    val rows = assets.collect()
    assert(rows.map(_.getAs[String]("modality")).toSet == Set("image", "audio", "video"))
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("bytes").nonEmpty)
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getAs[Int]("width") > 0 && meta.getAs[Int]("height") > 0)
    }
  }

  test("decodeImageFeatures is deterministic, batch-shaped, length-stable") {
    def decode() = Multimodal.decodeImageFeatures(assets, dim = 8).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        r.getAs[scala.collection.Seq[Float]]("features").toList).toMap
    val a = decode(); val b = decode()
    assert(a == b, "stub decode must be deterministic")
    assert(a.values.forall(_.length == 8))
  }

  test("resizeImages rewrites image dims, passes others through, keeps schema") {
    val resized = Multimodal.resizeImages(assets, 64, 64)
    // same columns, and union-compatible with the source (nullability may
    // tighten through the encoder — unionByName inside resizeImages already
    // enforces structural compatibility)
    assert(resized.columns.sameElements(assets.columns))
    assert(resized.unionByName(assets).count() == 12)
    val byId = resized.collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    val origById = assets.collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    byId.foreach { case (id, r) =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      if (r.getAs[String]("modality") == "image") {
        assert(meta.getAs[Int]("width") == 64 && meta.getAs[Int]("height") == 64)
      } else {
        assert(r == origById(id), "non-image assets must pass through untouched")
      }
    }
  }

  test("sampleFrames emits one row per everyMs of duration (video only)") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 10000L).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Long]("ts_ms") % 10000L == 0))
    val durations = assets.filter(org.apache.spark.sql.functions.col("modality") === "video")
      .select("asset_id", "meta.duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = frames.groupBy(_.getAs[Long]("asset_id")).view.mapValues(_.length).toMap
    durations.foreach { case (id, dur) =>
      assert(counts(id) == (dur / 10000L).toInt + 1, s"asset $id frame count")
    }
  }

  test("segmentAudio tiles the duration exactly (audio only); windows sum to duration") {
    val segs = Multimodal.segmentAudio(assets, windowMs = 30000L).collect()
    assert(segs.nonEmpty)
    assert(segs.forall(_.getAs[Long]("seg_start_ms") % 30000L == 0))
    assert(segs.forall(r => r.getAs[Long]("energy_ppm") >= 0 && r.getAs[Long]("energy_ppm") < 1000000L))
    val durations = assets.filter(org.apache.spark.sql.functions.col("modality") === "audio")
      .select("asset_id", "meta.duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byAsset = segs.groupBy(_.getAs[Long]("asset_id"))
    assert(byAsset.keySet == durations.keySet, "every audio asset segments; nothing else does")
    durations.foreach { case (id, dur) =>
      val ws = byAsset(id).map(_.getAs[Long]("seg_ms"))
      assert(ws.sum == dur, s"asset $id windows must tile the duration exactly")
      assert(ws.init.forall(_ == 30000L), s"asset $id non-final windows are full-size")
    }
  }
}
