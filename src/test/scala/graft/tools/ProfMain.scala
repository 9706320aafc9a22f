package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: times named queries (and repeats) at a given SF dir.
  * Test-scope only; not part of the shipped library. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spatial.SpatialFunctions.registerAll(spark)
    graft.functions.SketchFunctions.registerAll(spark)
    spark.sql("SELECT count(*) FROM range(1000000)").collect()
    val names = args.toSeq
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      graft.util.Persist.releaseAll()
      println(f"PROF $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
