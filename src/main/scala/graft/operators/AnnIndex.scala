package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

/** IVF approximate-nearest-neighbor with TRAINED coarse centroids —
  * the production form of the fixed-centroid index behind the v05
  * oracle query (which pins centroids to fixture rows so DuckDB can
  * replicate it; a real pipeline trains them). KMeans runs over
  * L2-NORMALIZED vectors so euclidean clustering agrees with the
  * cosine metric used for search (on the unit sphere, euclidean and
  * cosine give the same ordering).
  *
  * Scale shape (same as v05): training samples/iterates distributed
  * (MLlib), assignment is one broadcast + one scan, probes touch
  * ~nprobe/k of the corpus through a list-key join, re-rank is exact
  * cosine within the probed lists. List sizes are the skew knob (raise
  * k / re-train to split hot lists).
  */
object AnnIndex {

  /** Per-vector list assignment via a KMeans model trained on the data.
    * Input needs (id, emb: array<double>); returns
    * (id, list_id, emb_n <unit-normalized>). Deterministic for a fixed
    * seed and input. */
  def ivfAssign(emb: DataFrame, idCol: String, embCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    SketchFunctions.registerAll(spark)
    val normalized = emb.select(col(idCol).as("id"),
      expr(s"transform($embCol, x -> x / sqrt(dot_fold($embCol, $embCol)))").as("emb_n"))
    val feats = normalized.withColumn("features", array_to_vector(col("emb_n")))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(feats)
    model.transform(feats)
      .select(col("id"), col("list_id"), col("emb_n"))
  }

  /** Per-list centroids recovered as the mean of normalized members —
    * the same minimizer KMeans converged to (up to normalization). */
  def centroidsOf(assign: DataFrame, dims: Int = 64): DataFrame =
    assign
      .select(col("list_id"), col("emb_n"))
      .groupBy(col("list_id"))
      .agg(array((0 until dims).map(i => avg(element_at(col("emb_n"), i + 1))): _*)
        .as("c_emb"))

  /** Persist the index as an on-disk inverted file: the assignment is
    * written PARTITIONED BY list_id (each IVF list is its own parquet
    * directory) with the centroid table alongside. A search that
    * probes nprobe of k lists then reads ONLY those nprobe
    * directories — partition pruning is the disk analogue of the
    * inverted-file scan bound, and it is what makes a persisted
    * 100 TB index serve queries without touching the corpus. */
  def save(assign: DataFrame, path: String): Unit = {
    assign.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    centroidsOf(assign).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** [[ivfSearch]] against a [[save]]d index. The probed list ids are
    * resolved from the (k-row) centroid table and applied as a static
    * IN filter, so the lists scan is partition-pruned to the probed
    * directories. Probe vectors are fetched by id from the index
    * itself (one slim scan; a production deployment would keep a
    * separate id→vector store for this). */
  def ivfSearchOnDisk(spark: org.apache.spark.sql.SparkSession, path: String,
      probeIds: Seq[Long], nprobe: Int, topK: Int): DataFrame = {
    SketchFunctions.registerAll(spark)
    val lists = spark.read.parquet(s"$path/lists")
    val probes = lists.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("q_id"), col("emb_n").as("q_emb"))
    searchCore(spark, path, probes, nprobe, topK, excludeSelf = true)
  }

  /** Serve EXTERNAL probe vectors against a [[save]]d index — the
    * query-time path where probes are not index members. `probes` needs
    * (q_id, q_emb: array<double>), normalized here. Same scan bound as
    * [[ivfSearchOnDisk]]: nprobe partition-pruned list directories per
    * probe, nothing else read. */
  def searchVectors(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    SketchFunctions.registerAll(spark)
    val normalized = probes.select(col("q_id"),
      expr("transform(q_emb, x -> x / sqrt(dot_fold(q_emb, q_emb)))").as("q_emb"))
    searchCore(spark, path, normalized, nprobe, topK, excludeSelf = false)
  }

  /** Assign NEW vectors to the STORED centroids (nearest-centroid
    * argmax — no retrain) and append them to the inverted file's
    * partition directories. This is how a live index absorbs a fresh
    * ingest batch without a rebuild: assignment is one broadcast of the
    * k-row centroid table + one scan of the batch, and the write only
    * touches the partitions the batch lands in. Centroids drift as the
    * data grows — production retrains periodically (a new [[save]]),
    * which this layout makes a drop-in swap. */
  def append(spark: org.apache.spark.sql.SparkSession, path: String,
      emb: DataFrame, idCol: String, embCol: String): Unit = {
    SketchFunctions.registerAll(spark)
    val cents = spark.read.parquet(s"$path/centroids")
    val normalized = emb.select(col(idCol).as("id"),
      expr(s"transform($embCol, x -> x / sqrt(dot_fold($embCol, $embCol)))").as("emb_n"))
    val w = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("list_id"))
    normalized.crossJoin(broadcast(cents))
      .withColumn("csim", expr("dot_fold(emb_n, c_emb)"))
      .withColumn("cr", row_number().over(w))
      .filter(col("cr") === 1)
      .select(col("id"), col("emb_n"), col("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/lists")
  }

  private def searchCore(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, nprobe: Int, topK: Int, excludeSelf: Boolean): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val lists = spark.read.parquet(s"$path/lists")
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("list_id"))
    val probeLists = probes.crossJoin(broadcast(cents))
      .withColumn("csim", expr("dot_fold(q_emb, c_emb)"))
      .withColumn("cr", row_number().over(wProbe))
      .filter(col("cr") <= nprobe)
      .select(col("q_id"), col("list_id"), col("q_emb"))
    // bounded driver-side metadata: ≤ nprobe × |probes| ints
    val probedLists = probeLists.select(col("list_id")).distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue)
    val pruned = lists.filter(col("list_id").isin(probedLists: _*))
    val joined = pruned.join(broadcast(probeLists), Seq("list_id"))
    val cand = (if (excludeSelf) joined.where(col("id") =!= col("q_id")) else joined)
      .withColumn("sim", expr("dot_fold(emb_n, q_emb)"))
    // two-level top-k (O(topK) state per map-side partial): a giant IVF
    // list never serializes into one window partition per probe
    TopK.topK(cand, Seq("q_id"), col("sim"), col("id"), topK, asc = false)
      .select(col("q_id"), col("id").as("vec_id"), col("ordv").as("sim"),
        col("rank"))
  }

  /** Top-`topK` cosine neighbors for each probe id, scanning only the
    * `nprobe` nearest lists per probe. `assign` is [[ivfAssign]]'s
    * output; probes are selected out of it by id. */
  def ivfSearch(assign: DataFrame, probeIds: Seq[Long],
      nprobe: Int, topK: Int): DataFrame = {
    val cents = centroidsOf(assign)
    val probes = assign.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("q_id"), col("emb_n").as("q_emb"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("list_id"))
    val probeLists = probes.crossJoin(broadcast(cents))
      .withColumn("csim", expr("dot_fold(q_emb, c_emb)"))
      .withColumn("cr", row_number().over(wProbe))
      .filter(col("cr") <= nprobe)
      .select(col("q_id"), col("list_id"), col("q_emb"))
    val cand = assign.join(broadcast(probeLists), Seq("list_id"))
      .where(col("id") =!= col("q_id"))
      .withColumn("sim", expr("dot_fold(emb_n, q_emb)"))
    TopK.topK(cand, Seq("q_id"), col("sim"), col("id"), topK, asc = false,
        extra = col("list_id"))
      .select(col("q_id"), col("id").as("vec_id"),
        col("extra").cast("int").as("list_id"), col("ordv").as("sim"),
        col("rank"))
  }
}
