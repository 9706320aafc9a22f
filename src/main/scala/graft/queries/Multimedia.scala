package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.operators.Multimodal

/** Multimodal pipeline queries (rows-only driver check: the decode stub
  * is not SQL-expressible; semantics are covered by MultimodalSpec). */
object Multimedia {

  def defs: Seq[QDef] = Seq(mm01, mm02)

  /** Decode + feature extraction over binary media columns. */
  private val mm01 = QDef.noOracle("mm01_media_features") { (s, d) =>
    Multimodal.decodeFeatures(Multimodal.attachPayload(Tables.documents(s, d)))
      .toDF()
      .orderBy(col("media_id"))
  }

  /** Frame sampling: one row per sampled frame per media item. */
  private val mm02 = QDef.noOracle("mm02_frame_sample") { (s, d) =>
    Multimodal.sampleFrames(Multimodal.attachPayload(Tables.documents(s, d)))
      .orderBy(col("media_id"), col("frame_idx"))
  }
}
