package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends GraftSuite {

  private lazy val payload = Multimodal.attachPayload(Tables.documents(spark, sf))

  test("payload schema: binary column + typed metadata struct") {
    val sch = payload.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(payload.count() == 500)
  }

  test("decode is deterministic and covers all media kinds") {
    val a = Multimodal.decodeFeatures(payload).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(payload).collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.map(_.kind).toSet == Set("image", "audio", "video"))
    assert(a.forall(m => m.width > 0 && m.height > 0 && m.n_frames > 0))
  }

  test("decode preserves partitioning (no added shuffle)") {
    val reparted = payload.repartition(7)
    val ds = Multimodal.decodeFeatures(reparted)
    assert(ds.rdd.getNumPartitions == 7)
    // exactly the one explicit repartition Exchange, none added by decode
    val exchanges = "Exchange".r.findAllIn(
      ds.queryExecution.executedPlan.toString).size
    assert(exchanges == 1)
  }

  test("frame sampling explodes every k-th frame with byte slices") {
    val frames = Multimodal.sampleFrames(payload, everyK = 5)
    val perDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.values.forall(_ >= 1))
    val one = frames.where(col("frame_idx") > 0).limit(1).collect()
    assert(one.isEmpty || one(0).getAs[Array[Byte]]("frame_bytes").nonEmpty)
  }
}
