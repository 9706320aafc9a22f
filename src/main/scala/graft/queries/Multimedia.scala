package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.operators.Multimodal

/** Multimodal pipeline queries. The decode stub is deterministic
  * arithmetic over payload byte lengths, so the scalar metadata columns
  * are fully oracle-able in DuckDB; the per-frame feature vectors (not
  * SQL-expressible as arrays for the driver comparator) are covered by
  * MultimodalSpec instead. */
object Multimedia {

  def defs: Seq[QDef] = Seq(mm01, mm02, mm03, mm04, mm05, mm06, mm07, mm08, mm09, mm10)

  private val kindSql =
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"

  /** Decode + feature extraction over binary media columns (scalar
    * projection of the Dataset[MediaFeatures] pipeline). */
  private val mm01 = QDef(
    "mm01_media_features",
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, $kindSql AS kind,
       |    CAST(length(text) AS BIGINT) AS n_bytes,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n
       |  FROM documents)
       |SELECT media_id, kind, n_bytes,
       |  CAST(CASE kind WHEN 'image' THEN 256 + n % 256
       |                 WHEN 'audio' THEN 1 ELSE 320 END AS INTEGER) AS width,
       |  CAST(CASE kind WHEN 'image' THEN 256 + (n // 7) % 256
       |                 WHEN 'audio' THEN 1 ELSE 240 END AS INTEGER) AS height,
       |  CAST(CASE kind WHEN 'image' THEN 1
       |                 WHEN 'audio' THEN greatest(1, n // 64)
       |                 ELSE greatest(1, n // 256) END AS INTEGER) AS n_frames,
       |  CAST(least(CASE kind WHEN 'image' THEN 1
       |                       WHEN 'audio' THEN greatest(1, n // 64)
       |                       ELSE greatest(1, n // 256) END, 4) AS INTEGER) AS n_feats
       |FROM m ORDER BY media_id""".stripMargin) { (s, d) =>
    Multimodal.decodeFeatures(Multimodal.attachPayload(Tables.documents(s, d)))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("n_frames"),
        size(col("features")).as("n_feats"))
      .orderBy(col("media_id"))
  }

  /** Resize planning over the decoded corpus: 224×224-fit output dims
    * + RGB byte budget, all dimension arithmetic (oracle-exact). */
  private val mm03 = QDef(
    "mm03_resize_plan",
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, $kindSql AS kind,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n
       |  FROM documents),
       |d AS (
       |  SELECT media_id, kind,
       |    CAST(CASE kind WHEN 'image' THEN 256 + n % 256
       |                   WHEN 'audio' THEN 1 ELSE 320 END AS INTEGER) AS width,
       |    CAST(CASE kind WHEN 'image' THEN 256 + (n // 7) % 256
       |                   WHEN 'audio' THEN 1 ELSE 240 END AS INTEGER) AS height,
       |    CAST(CASE kind WHEN 'image' THEN 1
       |                   WHEN 'audio' THEN greatest(1, n // 64)
       |                   ELSE greatest(1, n // 256) END AS INTEGER) AS n_frames
       |  FROM m),
       |r AS (
       |  SELECT *, least(CAST(224 AS DOUBLE) / width, CAST(224 AS DOUBLE) / height) AS scale
       |  FROM d)
       |SELECT media_id, kind, width, height,
       |  CAST(greatest(1, floor(width * scale)) AS INTEGER) AS out_w,
       |  CAST(greatest(1, floor(height * scale)) AS INTEGER) AS out_h,
       |  CAST(CAST(greatest(1, floor(width * scale)) AS BIGINT) *
       |       CAST(greatest(1, floor(height * scale)) AS BIGINT) * 3 * n_frames AS BIGINT) AS out_bytes
       |FROM r ORDER BY media_id""".stripMargin) { (s, d) =>
    Multimodal.resizePlan(
      Multimodal.decodeFeatures(Multimodal.attachPayload(Tables.documents(s, d))).toDF())
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("out_w"), col("out_h"), col("out_bytes"))
      .orderBy(col("media_id"))
  }

  /** Frame sampling: one row per sampled frame per media item. DuckDB
    * can't slice BLOBs directly, so the frame content is oracle-checked
    * through its hex encoding (2 hex chars per byte → a char substring
    * of hex(payload) equals hex of the byte slice). */
  private val mm02 = QDef(
    "mm02_frame_sample",
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, $kindSql AS kind,
       |    hex(encode(text)) AS payload_hex,
       |    greatest(1, octet_length(encode(text)) // 256) AS n_frames
       |  FROM documents)
       |SELECT media_id, kind, CAST(f.i AS INTEGER) AS frame_idx,
       |  substring(payload_hex, CAST(f.i AS INTEGER) * 512 + 1, 512) AS frame_hex
       |FROM m, unnest(range(0, n_frames, 10)) AS f(i)
       |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
    Multimodal.sampleFrames(Multimodal.attachPayload(Tables.documents(s, d)))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        hex(col("frame_bytes")).as("frame_hex"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Cross-video frame dedup: every sampled frame keeps only its first
    * occurrence corpus-wide (first = min (media_id, frame_idx)), per
    * media summarized as sampled vs canonically-owned frames — the
    * binary-payload face of the exact-dedup pass (shared intros /
    * watermark frames dedup once across the corpus). One shuffle keyed
    * on the frame bytes; at 100 TB the key would be a frame digest
    * (same plan shape, narrower shuffle). */
  private val mm04 = QDef(
    "mm04_frame_dedup",
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    hex(encode(text)) AS payload_hex,
       |    greatest(1, octet_length(encode(text)) // 256) AS n_frames
       |  FROM documents),
       |fr AS (
       |  SELECT media_id, CAST(f.i AS INTEGER) AS frame_idx,
       |    substring(payload_hex, CAST(f.i AS INTEGER) * 512 + 1, 512) AS frame_hex
       |  FROM m, unnest(range(0, n_frames, 10)) AS f(i)),
       |r AS (
       |  SELECT media_id,
       |    ROW_NUMBER() OVER (PARTITION BY frame_hex ORDER BY media_id, frame_idx) AS rn
       |  FROM fr)
       |SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical
       |FROM r GROUP BY media_id ORDER BY media_id""".stripMargin) { (s, d) =>
    val frames = Multimodal
      .sampleFrames(Multimodal.attachPayload(Tables.documents(s, d)))
      .select(col("media_id"), col("frame_idx"), hex(col("frame_bytes")).as("frame_hex"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("frame_hex")).orderBy(col("media_id"), col("frame_idx"))
    frames.withColumn("rn", row_number().over(w))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_canonical"))
      .orderBy(col("media_id"))
  }

  /** Perceptual (average-hash) frame near-dup: each sampled frame's
    * first 60 bytes become a 60-bit aHash (bit i set when byte i is
    * above the frame mean — written as the integer comparison
    * `60·bᵢ > Σb`, so no division ever happens), then frames are
    * matched across media on the hash. aHash is robust to uniform
    * brightness/contrast shifts in real imagery, which byte-exact
    * matching (mm04) is not; on the synthetic fixture the two agree on
    * the planted exact dups, which is precisely what the oracle pins
    * down. Per-row expression work + one hash-key aggregate/join —
    * mm04's scale shape. The byte array and its sum are let-bound
    * ([[CrossHash.bind]]) so the 60-element decode runs once per frame,
    * not once per bit. */
  private val mm05 = QDef(
    "mm05_phash_dedup", {
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    hex(encode(text)) AS payload_hex,
         |    greatest(1, octet_length(encode(text)) // 256) AS n_frames
         |  FROM documents),
         |fr AS (
         |  SELECT media_id, CAST(f.i AS INTEGER) AS frame_idx,
         |    substring(payload_hex, CAST(f.i AS INTEGER) * 512 + 1, 512) AS frame_hex
         |  FROM m, unnest(range(0, n_frames, 10)) AS f(i)),
         |fb AS (
         |  SELECT media_id, frame_idx,
         |    list_transform(range(0, 60),
         |      i -> CAST(('0x' || substring(frame_hex, CAST(i AS INTEGER) * 2 + 1, 2)) AS BIGINT)) AS bytes
         |  FROM fr WHERE length(frame_hex) >= 120),
         |fs AS (SELECT media_id, frame_idx, bytes,
         |         CAST(list_sum(bytes) AS BIGINT) AS s FROM fb),
         |fh AS (
         |  SELECT media_id, frame_idx,
         |    CAST(list_sum(list_transform(range(0, 60),
         |      i -> CASE WHEN bytes[CAST(i AS INTEGER) + 1] * 60 > s
         |           THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER))
         |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS ahash
         |  FROM fs),
         |hm AS (SELECT ahash, COUNT(DISTINCT media_id) AS n_media FROM fh GROUP BY ahash)
         |SELECT fh.media_id, CAST(COUNT(*) AS BIGINT) AS n_sampled,
         |  CAST(COUNT(DISTINCT fh.ahash) AS BIGINT) AS n_distinct,
         |  CAST(SUM(CASE WHEN hm.n_media >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_dup
         |FROM fh JOIN hm ON hm.ahash = fh.ahash
         |GROUP BY fh.media_id ORDER BY fh.media_id""".stripMargin
    }) { (s, d) =>
    import CrossHash.bind
    val bytesE =
      "transform(sequence(0, 59), i -> cast(conv(substring(frame_hex, i * 2 + 1, 2), 16, 10) as int))"
    val ahashE = bind(bytesE, "B")(B =>
      bind(s"aggregate($B, 0, (a, x) -> a + x)", "S")(S =>
        s"""aggregate(transform(sequence(0, 59),
           |  i -> IF(element_at($B, i + 1) * 60 > $S, shiftleft(1L, i), 0L)),
           |  0L, (a, x) -> a + x)""".stripMargin))
    val fh = Multimodal
      .sampleFrames(Multimodal.attachPayload(Tables.documents(s, d)))
      .select(col("media_id"), col("frame_idx"), hex(col("frame_bytes")).as("frame_hex"))
      .where(length(col("frame_hex")) >= 120)
      .withColumn("ahash", expr(ahashE))
      .select(col("media_id"), col("ahash"))
    // two-level aggregate (r14, guide §2.3): the old shape evaluated
    // the frame decode + aHash battery TWICE (the hash-frequency arm
    // and the join arm each re-derived fh), shuffled every frame
    // through an ahash join, and paid two COUNT(DISTINCT) expands. One
    // (ahash, media) aggregate collapses frames first — per media its
    // group count IS the distinct-hash count, per ahash its group
    // count IS the distinct-media count (computed as a window on the
    // already-collapsed frame, one exchange), and the cross-dup frame
    // count is the conditional sum of group sizes. Bounded state per
    // key, no expand, single pass over the decode.
    val g = fh.groupBy(col("ahash"), col("media_id"))
      .agg(count(lit(1)).as("nf"))
    val wH = org.apache.spark.sql.expressions.Window.partitionBy(col("ahash"))
    g.withColumn("n_media", count(lit(1)).over(wH))
      .groupBy(col("media_id"))
      .agg(sum(col("nf")).as("n_sampled"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n_media") >= 2, col("nf")).otherwise(0L)).as("n_cross_dup"))
      .orderBy(col("media_id"))
  }

  /** Voice-activity segmentation over the audio corpus: the payload is
    * framed into 64-byte PCM windows, each window's energy is the
    * integer sum of squared centered amplitudes, a window is VOICED when
    * its energy exceeds the media's mean (written division-free as
    * `energy · n_windows > total`, mm05's trick), and consecutive voiced
    * windows fuse into segments via gaps-and-islands. Output per media:
    * window/voiced counts, segment count, longest segment — the
    * speech-detection pass that decides which audio spans are worth
    * sending to an (expensive) ASR stage.
    *
    * Scale shape: framing + energy are per-row expression work over the
    * hex payload (codegen'd, decode runs once per window); the only
    * shuffles are the media_id aggregate and the per-media island
    * window — both keyed on media_id, both bounded by windows-per-file,
    * never corpus-wide. The audio-kind filter prunes at the scan. */
  private val mm06 = QDef(
    "mm06_audio_vad",
    """WITH m AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS ph,
      |    greatest(1, octet_length(encode(text)) // 64) AS nw
      |  FROM documents WHERE doc_id % 3 = 1),
      |w AS (
      |  SELECT media_id, CAST(f.i AS INTEGER) AS win_idx,
      |    substring(ph, CAST(f.i AS INTEGER) * 128 + 1, 128) AS wh
      |  FROM m, unnest(range(0, nw)) AS f(i)),
      |e AS (
      |  SELECT media_id, win_idx,
      |    CASE WHEN length(wh) = 0 THEN NULL ELSE
      |    CAST(list_sum(list_transform(range(0, length(wh) // 2),
      |      i -> (CAST(('0x' || substring(wh, CAST(i AS INTEGER) * 2 + 1, 2)) AS BIGINT) - 128)
      |         * (CAST(('0x' || substring(wh, CAST(i AS INTEGER) * 2 + 1, 2)) AS BIGINT) - 128)))
      |      AS BIGINT) END AS energy
      |  FROM w),
      |t AS (SELECT media_id, COUNT(*) AS nw, CAST(SUM(energy) AS BIGINT) AS tot
      |      FROM e GROUP BY media_id),
      |seg AS (
      |  SELECT e.media_id, e.win_idx,
      |    e.win_idx - ROW_NUMBER() OVER (PARTITION BY e.media_id ORDER BY e.win_idx) AS grp
      |  FROM e JOIN t USING (media_id) WHERE e.energy * t.nw > t.tot),
      |sl AS (SELECT media_id, grp, COUNT(*) AS len FROM seg GROUP BY media_id, grp),
      |ns AS (SELECT media_id, CAST(SUM(len) AS BIGINT) AS n_voiced,
      |         COUNT(*) AS n_segments, CAST(MAX(len) AS BIGINT) AS max_segment
      |       FROM sl GROUP BY media_id)
      |SELECT t.media_id, CAST(t.nw AS BIGINT) AS n_windows,
      |  coalesce(ns.n_voiced, 0) AS n_voiced,
      |  CAST(coalesce(ns.n_segments, 0) AS BIGINT) AS n_segments,
      |  coalesce(ns.max_segment, 0) AS max_segment
      |FROM t LEFT JOIN ns USING (media_id)
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    import CrossHash.bind
    // empty window (empty audio payload) → explicitly NULL energy on both
    // engines, not an accident of conv('')/list_sum(empty) returning NULL
    val energyE = bind("substring(ph, win_idx * 128 + 1, 128)", "WH")(wh =>
      s"""CASE WHEN length($wh) = 0 THEN CAST(NULL AS BIGINT) ELSE
         |aggregate(transform(sequence(0, CAST(length($wh) / 2 AS INT) - 1),
         |  i -> (cast(conv(substring($wh, i * 2 + 1, 2), 16, 10) as bigint) - 128)
         |     * (cast(conv(substring($wh, i * 2 + 1, 2), 16, 10) as bigint) - 128)),
         |  0L, (a, x) -> a + x) END""".stripMargin)
    val e = Multimodal.attachPayload(Tables.documents(s, d))
      .where(col("meta.kind") === "audio")
      .select(col("media_id"), hex(col("payload")).as("ph"),
        expr("greatest(1, length(payload) div 64)").cast("int").as("nw"))
      .select(col("media_id"), col("ph"),
        posexplode(sequence(lit(0), col("nw") - 1)).as(Seq("p", "win_idx")))
      .withColumn("energy", expr(energyE))
      .select(col("media_id"), col("win_idx"), col("energy"))
    val t = e.groupBy(col("media_id"))
      .agg(count(lit(1)).as("nw"), sum(col("energy")).as("tot"))
    val wIsl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("win_idx"))
    val sl = e.join(t, Seq("media_id"))
      .where(col("energy") * col("nw") > col("tot"))
      .withColumn("grp", col("win_idx") - row_number().over(wIsl))
      .groupBy(col("media_id"), col("grp")).agg(count(lit(1)).as("len"))
    val ns = sl.groupBy(col("media_id"))
      .agg(sum(col("len")).as("n_voiced"), count(lit(1)).as("n_segments"),
        max(col("len")).as("max_segment"))
    t.join(ns, Seq("media_id"), "left")
      .select(col("media_id"), col("nw").as("n_windows"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_segment"), lit(0L)).as("max_segment"))
      .orderBy(col("media_id"))
  }

  /** Shot-boundary detection over the video corpus: consecutive decoded
    * frames (64-byte stride — the stub codec's finest granularity, so
    * multi-frame media exist at every fixture SF) are compared by the
    * Hamming distance of their 60-bit aHashes (mm05's
    * brightness-profile hash); a CUT is a transition whose distance
    * clears 16 of 60 bits, and shots = cuts + 1. The standard
    * cheap-pass segmentation that decides where a captioning/embedding
    * stage samples its keyframes.
    *
    * Scale shape: framing + hashing are per-row expression work; the
    * only shuffle is the media-keyed lag window (frames-per-file
    * bounded), then one media aggregate. Integer-exact end to end. */
  private val mm07 = QDef(
    "mm07_shot_boundaries",
    """WITH m AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS ph,
      |    greatest(1, octet_length(encode(text)) // 64) AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT media_id, CAST(f.i AS INTEGER) AS frame_idx,
      |    substring(ph, CAST(f.i AS INTEGER) * 128 + 1, 128) AS fh
      |  FROM m, unnest(range(0, nf)) AS f(i)),
      |fb AS (
      |  SELECT media_id, frame_idx,
      |    list_transform(range(0, 60),
      |      i -> CAST(('0x' || substring(fh, CAST(i AS INTEGER) * 2 + 1, 2)) AS BIGINT)) AS bytes
      |  FROM fr WHERE length(fh) >= 120),
      |fs AS (SELECT media_id, frame_idx, bytes,
      |         CAST(list_sum(bytes) AS BIGINT) AS s FROM fb),
      |fh2 AS (
      |  SELECT media_id, frame_idx,
      |    CAST(list_sum(list_transform(range(0, 60),
      |      i -> CASE WHEN bytes[CAST(i AS INTEGER) + 1] * 60 > s
      |           THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER))
      |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS ahash
      |  FROM fs),
      |dists AS (
      |  SELECT media_id, frame_idx,
      |    bit_count(xor(ahash, lag(ahash) OVER (PARTITION BY media_id ORDER BY frame_idx))) AS dist
      |  FROM fh2),
      |ag AS (
      |  SELECT media_id, COUNT(*) + 1 AS n_frames,
      |    CAST(SUM(CASE WHEN dist >= 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
      |    CAST(MAX(dist) AS INTEGER) AS max_dist
      |  FROM dists WHERE dist IS NOT NULL GROUP BY media_id)
      |SELECT m.media_id,
      |  CAST(coalesce(ag.n_frames, 1) AS BIGINT) AS n_frames,
      |  coalesce(ag.n_cuts, 0) AS n_cuts,
      |  coalesce(ag.n_cuts, 0) + 1 AS n_shots,
      |  coalesce(ag.max_dist, 0) AS max_dist
      |FROM m LEFT JOIN ag ON ag.media_id = m.media_id
      |ORDER BY m.media_id""".stripMargin) { (s, d) =>
    import CrossHash.bind
    val bytesE =
      "transform(sequence(0, 59), i -> cast(conv(substring(fh, i * 2 + 1, 2), 16, 10) as int))"
    val ahashE = bind(bytesE, "B")(B =>
      bind(s"aggregate($B, 0, (a, x) -> a + x)", "S")(S =>
        s"""aggregate(transform(sequence(0, 59),
           |  i -> IF(element_at($B, i + 1) * 60 > $S, shiftleft(1L, i), 0L)),
           |  0L, (a, x) -> a + x)""".stripMargin))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val media = Multimodal.attachPayload(Tables.documents(s, d))
      .where(col("meta.kind") === "video")
      .select(col("media_id"), hex(col("payload")).as("ph"),
        expr("greatest(1, length(payload) div 64)").cast("int").as("nf"))
    val fh2 = media
      .select(col("media_id"),
        posexplode(sequence(lit(0), col("nf") - 1)).as(Seq("p", "frame_idx")),
        col("ph"))
      .withColumn("fh", expr("substring(ph, frame_idx * 128 + 1, 128)"))
      .where(length(col("fh")) >= 120)
      .withColumn("ahash", expr(ahashE))
      .select(col("media_id"), col("frame_idx"), col("ahash"))
    val ag = fh2
      .withColumn("dist",
        bit_count(col("ahash").bitwiseXOR(lag(col("ahash"), 1).over(w))))
      .where(col("dist").isNotNull)
      .groupBy(col("media_id"))
      .agg((count(lit(1)) + 1).as("n_frames"),
        sum(when(col("dist") >= 16, 1L).otherwise(0L)).as("n_cuts"),
        max(col("dist")).cast("int").as("max_dist"))
    media.select(col("media_id"))
      .join(ag, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_frames"), lit(1L)).as("n_frames"),
        coalesce(col("n_cuts"), lit(0L)).as("n_cuts"),
        (coalesce(col("n_cuts"), lit(0L)) + 1).as("n_shots"),
        coalesce(col("max_dist"), lit(0)).as("max_dist"))
      .orderBy(col("media_id"))
  }

  /** Media-integrity audit — the corrupt-download triage every media
    * ingest runs before decode: a deterministic transport fault is
    * planted (every 17th media's payload truncated to half), then each
    * payload's ACTUAL byte length is checked against the container
    * header's declared size; the per-kind report (media count, corrupt
    * count, expected/lost bytes, corruption rate) decides re-fetch vs
    * drop. The Spark side really slices BINARY columns (substring over
    * BinaryType) and measures real payload bytes — swapping the stub
    * fault for a real header parser changes one expression.
    *
    * Scale shape: per-row binary expression work into one
    * map-side-combined kind aggregate (≤3 rows out); integer sums,
    * ONE IEEE division. */
  private val mm08 = QDef(
    "mm08_media_integrity",
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, $kindSql AS kind,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS declared,
       |    CASE WHEN doc_id % 17 = 0
       |         THEN CAST(octet_length(encode(text)) // 2 AS BIGINT)
       |         ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS actual
       |  FROM documents)
       |SELECT kind, COUNT(*) AS n_media,
       |  CAST(SUM(CASE WHEN actual < declared THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_corrupt,
       |  CAST(SUM(declared) AS BIGINT) AS bytes_declared,
       |  CAST(SUM(declared - actual) AS BIGINT) AS bytes_lost,
       |  CAST(SUM(CASE WHEN actual < declared THEN 1 ELSE 0 END) AS DOUBLE) /
       |    COUNT(*) AS corrupt_rate
       |FROM m GROUP BY kind ORDER BY kind""".stripMargin) { (s, d) =>
    val m = Multimodal.attachPayload(Tables.documents(s, d))
      // planted transport fault: truncate every 17th payload to half —
      // a REAL binary slice, the stub stand-in for a failed download
      .withColumn("wire",
        when(col("media_id") % 17 === 0,
          expr("substring(payload, 1, cast(length(payload) div 2 as int))"))
          .otherwise(col("payload")))
      .select(col("meta.kind").as("kind"),
        length(col("payload")).cast("long").as("declared"),
        length(col("wire")).cast("long").as("actual"))
    m.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("actual") < col("declared"), 1L).otherwise(0L))
          .as("n_corrupt"),
        sum(col("declared")).as("bytes_declared"),
        sum(col("declared") - col("actual")).as("bytes_lost"),
        (sum(when(col("actual") < col("declared"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("corrupt_rate"))
      .orderBy(col("kind"))
  }

  /** Audio gain-normalization audit — the loudness pass before ASR or
    * feature extraction: per audio payload, the PCM peak, mean-square
    * energy, the integer gain (x1000) that would normalize the peak to
    * full scale, the would-clip sample count at a fixed 2x gain, and a
    * not-silence keep flag. The pre-log rule: no dB anywhere — peaks,
    * energies and the gain are integers, mean-square is one final
    * division. All per-row codegen'd byte folds over the decoded
    * payload into a single media-keyed aggregate — no shuffle beyond
    * the output sort at any corpus size. */
  private val mm09 = QDef(
    "mm09_gain_audit",
    """WITH m AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS ph,
      |    octet_length(encode(text)) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |b AS (
      |  SELECT media_id, n,
      |    CAST(('0x' || substring(ph, CAST(f.i AS INTEGER) * 2 + 1, 2)) AS BIGINT) - 128 AS s
      |  FROM m, unnest(range(0, n)) AS f(i)),
      |st AS (
      |  SELECT media_id, CAST(MAX(n) AS BIGINT) AS n_samples,
      |    CAST(MAX(ABS(s)) AS BIGINT) AS peak,
      |    CAST(SUM(s * s) AS BIGINT) AS sumsq,
      |    CAST(SUM(CASE WHEN ABS(s) * 2 > 127 THEN 1 ELSE 0 END) AS BIGINT) AS clip_at_2x
      |  FROM b GROUP BY media_id)
      |SELECT media_id, n_samples, peak,
      |  CAST(sumsq AS DOUBLE) / n_samples AS mean_square,
      |  CAST(CASE WHEN peak = 0 THEN NULL ELSE 127000 // peak END AS BIGINT) AS gain_x1000,
      |  clip_at_2x, peak >= 8 AS keep
      |FROM st ORDER BY media_id""".stripMargin) { (s, d) =>
    def sB = "(cast(conv(substring(ph, i * 2 + 1, 2), 16, 10) as bigint) - 128)"
    val st = Multimodal.attachPayload(Tables.documents(s, d))
      .where(col("meta.kind") === "audio")
      .select(col("media_id"), hex(col("payload")).as("ph"),
        length(col("payload")).cast("long").as("n_samples"))
      .withColumn("peak", expr(
        s"aggregate(sequence(0, cast(n_samples as int) - 1), 0L, (a, i) -> greatest(a, abs($sB)))"))
      .withColumn("sumsq", expr(
        s"aggregate(sequence(0, cast(n_samples as int) - 1), 0L, (a, i) -> a + $sB * $sB)"))
      .withColumn("clip_at_2x", expr(
        s"aggregate(sequence(0, cast(n_samples as int) - 1), 0L, (a, i) -> a + CASE WHEN abs($sB) * 2 > 127 THEN 1L ELSE 0L END)"))
    st.select(col("media_id"), col("n_samples"), col("peak"),
      (col("sumsq").cast("double") / col("n_samples")).as("mean_square"),
      when(col("peak") === 0, lit(null))
        .otherwise(expr("127000 div peak")).cast("long").as("gain_x1000"),
      col("clip_at_2x"), (col("peak") >= 8).as("keep"))
      .orderBy(col("media_id"))
  }

  /** ViT patchification plan — the budgeting pass before a vision
    * encoder: per image, the 16x16 patch grid after mm03\u0027s 224-fit
    * resize, right/bottom padding needed to tile exactly, token count
    * (patches + CLS), and the patch-embedding byte budget. Pure
    * dimension arithmetic over the decoded metadata (integer-exact,
    * per-row expression work, no joins). */
  private val mm10 = QDef(
    "mm10_patch_plan",
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n
       |  FROM documents WHERE doc_id % 3 = 0),
       |d AS (
       |  SELECT media_id,
       |    CAST(256 + n % 256 AS BIGINT) AS width,
       |    CAST(256 + (n // 7) % 256 AS BIGINT) AS height
       |  FROM m),
       |r AS (
       |  SELECT *, least(CAST(224 AS DOUBLE) / width, CAST(224 AS DOUBLE) / height) AS scale
       |  FROM d),
       |o AS (
       |  SELECT media_id, width, height,
       |    greatest(1, CAST(floor(width * scale) AS BIGINT)) AS out_w,
       |    greatest(1, CAST(floor(height * scale) AS BIGINT)) AS out_h
       |  FROM r)
       |SELECT media_id, out_w, out_h,
       |  (out_w + 15) // 16 AS patches_x, (out_h + 15) // 16 AS patches_y,
       |  ((out_w + 15) // 16) * 16 - out_w AS pad_x,
       |  ((out_h + 15) // 16) * 16 - out_h AS pad_y,
       |  ((out_w + 15) // 16) * ((out_h + 15) // 16) + 1 AS n_tokens,
       |  ((out_w + 15) // 16) * ((out_h + 15) // 16) * 16 * 16 * 3 AS patch_bytes
       |FROM o ORDER BY media_id""".stripMargin) { (s, d) =>
    val px = (c: org.apache.spark.sql.Column) => ((c + 15) / 16).cast("long")
    Multimodal.attachPayload(Tables.documents(s, d))
      .where(col("meta.kind") === "image")
      .select(col("media_id"),
        (lit(256) + length(col("payload")) % 256).cast("long").as("width"),
        (lit(256) + (length(col("payload")).cast("long") / 7).cast("long") % 256)
          .cast("long").as("height"))
      .withColumn("scale",
        least(lit(224.0) / col("width"), lit(224.0) / col("height")))
      .select(col("media_id"), col("width"), col("height"),
        greatest(lit(1L), floor(col("width") * col("scale")).cast("long")).as("out_w"),
        greatest(lit(1L), floor(col("height") * col("scale")).cast("long")).as("out_h"))
      .select(col("media_id"), col("out_w"), col("out_h"),
        expr("(out_w + 15) div 16").as("patches_x"),
        expr("(out_h + 15) div 16").as("patches_y"),
        (expr("(out_w + 15) div 16") * 16 - col("out_w")).as("pad_x"),
        (expr("(out_h + 15) div 16") * 16 - col("out_h")).as("pad_y"),
        (expr("(out_w + 15) div 16") * expr("(out_h + 15) div 16") + 1).as("n_tokens"),
        (expr("(out_w + 15) div 16") * expr("(out_h + 15) div 16") * 16 * 16 * 3).as("patch_bytes"))
      .orderBy(col("media_id"))
  }
}
