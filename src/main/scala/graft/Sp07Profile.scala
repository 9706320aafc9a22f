package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage profile of sp07 (DBSCAN clustering) — judge ask, round 7
  * #5: attribute the ×100 smoke's super-linear ratio to a stage (grid
  * join vs component rounds vs border assignment) instead of guessing.
  * Replicates sp07's exact stage structure (queries/Spatial.scala sp07)
  * with a timer around each materialization and reports the
  * component-loop round count ([[graft.operators.Components.lastRounds]]).
  *
  * Usage: runMain graft.Sp07Profile <dir> [<dir> ...] — one JSON line
  * per dir; run on the base sf0.1 dir and the ×100 smoke dir and
  * compare per-stage ratios.
  */
object Sp07Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Sp07Profile <sfdir> [<sfdir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spatial.SpatialFunctions.registerAll(spark)

    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { d =>
      // mirror sp07's point construction (key-arithmetic coordinates,
      // queries/Spatial.scala:25-26)
      def ptX(k: String) = s"(($k * 48271) % 10007) % 100 + 0.5"
      def ptY(k: String) = s"(($k * 69621) % 10007) % 100 + 0.5"
      val n = Tables.customer(spark, d).count()
      val eps = math.sqrt(9549.0 / n)
      def pts(key: String, pt: String) = Tables.customer(spark, d)
        .select(col("c_custkey").as(key),
          expr(s"st_makepoint(${ptX(key)}, ${ptY(key)})").as(pt))
      val nb = graft.operators.SpatialJoin.grid(
          pts("a_key", "a_pt"), pts("b_key", "b_pt"),
          "a_pt", "b_pt", "st_dwithin", distance = eps,
          cells = graft.spatial.GraftConf.dbscanCells(spark, n))
        .where(col("a_key") =!= col("b_key"))
        .select(col("a_key"), col("b_key"))
        .persist()
      val (nbRows, tGrid) = timed(nb.count())
      val minPts = graft.spatial.GraftConf.dbscanMinPts(spark)
      val core = nb.groupBy(col("a_key")).agg(count(lit(1)).as("nn"))
        .filter(col("nn") + 1 >= minPts)
        .select(col("a_key").as("id"))
        .persist()
      val (nCore, tCore) = timed(core.count())
      val ce = nb
        .join(core.withColumnRenamed("id", "a_key"), Seq("a_key"))
        .join(core.withColumnRenamed("id", "b_key"), Seq("b_key"))
        .select(col("a_key").as("src"), col("b_key").as("dst"))
      val (cc, tComp) = timed {
        val r = graft.operators.Components
          .minLabel(ce, core.select(col("id").as("v")))
          .select(col("v").as("id"), col("comp").as("cluster"))
          .persist()
        r.count()
        r
      }
      val rounds = graft.operators.Components.lastRounds
      val (nBorder, tBorder) = timed {
        nb.join(cc.withColumnRenamed("id", "b_key")
            .withColumnRenamed("cluster", "b_cluster"), Seq("b_key"))
          .join(core.withColumnRenamed("id", "a_key"), Seq("a_key"), "left_anti")
          .groupBy(col("a_key")).agg(min(col("b_cluster")).as("cluster"))
          .count()
      }
      println(s"""{"dir":"$d","n_points":$n,"nb_pairs":$nbRows,"core":$nCore,"border":$nBorder,"rounds":$rounds,"grid_s":${
        d3(tGrid)},"core_s":${d3(tCore)},"components_s":${d3(tComp)},"border_s":${d3(tBorder)}}""")
      nb.unpersist(); core.unpersist(); cc.unpersist()
      graft.util.Persist.releaseAll()
    }
    spark.stop()
  }
}
