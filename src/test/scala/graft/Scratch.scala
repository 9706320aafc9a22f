package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment main (dev only, rewritten per investigation).
  * `sbt "Test/runMain graft.Scratch"` */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.spatial.SpatialFunctions.registerAll(spark)

    def ptX(key: String) = s"(($key * 48271) % 10007) % 100 + 0.5"
    def ptY(key: String) = s"(($key * 69621) % 10007) % 100 + 0.5"
    val pts = Tables.customer(spark, d).select(col("c_custkey"),
      expr(s"st_makepoint(${ptX("c_custkey")}, ${ptY("c_custkey")})").as("c_pt"))
    time("warmup count")(Tables.customer(spark, d).count())
    time("pts materialize (udf)")(pts.count())
    val cells = spark.range(0, 100).select(col("id").as("cell_id"),
      expr("st_makeenvelope(cast(id div 10 as double) * 10, cast(id % 10 as double) * 10, " +
        "cast(id div 10 as double) * 10 + 10, cast(id % 10 as double) * 10 + 10)").as("cell"))
    time("cells")(cells.count())
    val joined = graft.operators.SpatialJoin.broadcastJoin(pts, cells, "c_pt", "cell", "st_within")
    time("join count")(joined.count())
    time("join count again")(joined.count())
    val agg = joined.groupBy(col("cell_id")).agg(count(lit(1)).as("n_points"))
    time("agg")(agg.count())
    time("full sp01")(SparkEntry.queries("sp01_point_in_cell")(spark, d).count())
    time("full sp03")(SparkEntry.queries("sp03_box_overlap_pairs")(spark, d).count())
    def box(alias: String, key: String) = Tables.part(spark, d).select(
      col("p_partkey").as(key),
      expr(("st_makeenvelope(cast((KK * 40503) % 9973 % 990 as double), " +
        "cast((KK * 65599) % 9973 % 990 as double), " +
        "cast((KK * 40503) % 9973 % 990 + (KK * 48271) % 97 % 10 + 1 as double), " +
        "cast((KK * 65599) % 9973 % 990 + (KK * 69621) % 97 % 10 + 1 as double))")
        .replace("KK", "p_partkey")).as(alias))
    for (nc <- Seq(256, 1024)) {
      val j = graft.operators.SpatialJoin.grid(box("a_box", "a_key"), box("b_box", "b_key"),
        "a_box", "b_box", "st_intersects", cells = nc)
        .where(col("a_key") < col("b_key"))
      time(s"sp03 cells=$nc")(j.count())
      time(s"sp03 cells=$nc again")(j.count())
    }
    spark.stop()
  }
}
