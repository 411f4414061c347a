package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.syntheticMedia(Tables.documents(spark, sf0001))

  test("synthetic media table has the canonical schema") {
    assert(media.columns.toSeq === Multimodal.mediaColumns)
    assert(media.count() === 500)
  }

  test("feature extraction is deterministic and shape-correct") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(f1.length === 500)
    assert(f1.forall(_.feature.length === 16))
    val m1 = f1.map(f => f.media_id -> f.feature.toSeq).toMap
    val m2 = f2.map(f => f.media_id -> f.feature.toSeq).toMap
    assert(m1 === m2, "stub decode must be deterministic")
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("resize plan preserves aspect ratio and caps the long side") {
    val r = Multimodal.resizePlan(media, maxSide = 256)
      .select("width", "height", "target_width", "target_height").collect()
    r.foreach { row =>
      val (w, h, tw, th) = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      assert(math.max(tw, th) <= 256)
      if (math.max(w, h) <= 256) { assert(tw === w && th === h) }
    }
  }

  test("frame sampling only produces timestamps for videos, within duration") {
    val r = Multimodal.frameSamplePlan(media, everyMs = 1000L)
      .select("kind", "duration_ms", "frame_ts_ms").collect()
    r.foreach { row =>
      val kind = row.getString(0)
      val frames = row.getSeq[Long](2)
      if (kind == "video") {
        assert(frames.nonEmpty)
        assert(frames.forall(t => t >= 0 && t <= row.getLong(1)))
      } else assert(frames.isEmpty)
    }
  }
}
