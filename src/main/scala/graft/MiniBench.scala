package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: Bench's exact methodology (sf0.001 warmup pass, then two
  * interleaved sf passes, min-of-2 per query) over a NAMED SUBSET —
  * for A/B-ing one optimization without paying a full 236-query run.
  *
  * Env: SPARK_GRAFT_MINI_QUERIES (space-separated names, required),
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qs = sys.env("SPARK_GRAFT_MINI_QUERIES").split("\\s+").filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    spark.sql("SELECT count(*) FROM range(1000000)").collect()
    graft.spatial.SpatialFunctions.registerAll(spark)
    graft.functions.SketchFunctions.registerAll(spark)
    // (seconds, completed?) like Bench's runOnce: a crashing variant
    // finishes fast, and reporting its time-to-crash as a min= line
    // silently inverts an A/B conclusion — failures must print FAILED
    def runOnce(name: String, dir: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, dir).count(); true }
        catch { case _: Throwable => false }
        finally graft.util.Persist.releaseAll()
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val warmupDir = new java.io.File(
      new java.io.File(sfDir).getParentFile, "sf0.001").getPath
    qs.foreach(runOnce(_, warmupDir)) // pre-pay codegen/JIT like Bench
    spark.catalog.clearCache()
    val p1 = qs.map(q => q -> runOnce(q, sfDir))
    spark.catalog.clearCache()
    val p2 = qs.map(q => q -> runOnce(q, sfDir))
    p1.zip(p2).foreach { case ((q, (a, okA)), (_, (b, okB))) =>
      if (okA && okB)
        println(f"""MINI $q%-35s min=${math.min(a, b)}%.3f p1=$a%.3f p2=$b%.3f""")
      else
        println(f"""MINI $q%-35s FAILED (p1 ok=$okA%b $a%.3fs, p2 ok=$okB%b $b%.3fs)""")
    }
    spark.stop()
  }
}
