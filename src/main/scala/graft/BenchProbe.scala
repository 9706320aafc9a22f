package graft
import org.apache.spark.sql.SparkSession

/** Bench-outlier attribution probe (dev tool): times one target query
  * in a fresh session, optionally after replaying a context list of
  * other registered queries in bench order — isolating "the plan is
  * slow" from "the 236-query bench session leaves residue that slows
  * it" (the d15 question from round 8's verdict).
  *
  * Env: SPARK_GRAFT_PROBE_TARGET (query name, required),
  * SPARK_GRAFT_PROBE_CONTEXT (space-separated names, or "sorted:PREFIX"
  * = all registered queries sorted that precede TARGET, mirroring
  * Bench's run order), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_PROBE_GC=1 to System.gc() between context queries.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val target = sys.env("SPARK_GRAFT_PROBE_TARGET")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gc = sys.env.get("SPARK_GRAFT_PROBE_GC").contains("1")
    val context: Seq[String] = sys.env.get("SPARK_GRAFT_PROBE_CONTEXT") match {
      case None => Nil
      case Some(s) if s.startsWith("sorted:") =>
        val upTo = s.stripPrefix("sorted:")
        SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != upTo)
      case Some(s) => s.split("\\s+").toSeq.filter(_.nonEmpty)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spatial.SpatialFunctions.registerAll(spark)
    graft.functions.SketchFunctions.registerAll(spark)
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    spark.sql("SELECT count(*) FROM range(1000000)").collect()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      finally graft.util.Persist.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    context.foreach { q => run(q); if (gc) System.gc() }
    val t1 = run(target)
    val t2 = run(target)
    println(f"""{"target":"$target","context_n":${context.size},"gc":$gc,"t1":$t1%.3f,"t2":$t2%.3f}""")
    spark.stop()
  }
}
