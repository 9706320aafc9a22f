package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print exchange/reuse/codegen stats (and optionally the full
  * formatted plan) for named queries. Run with
  * `sbt "Test/runMain graft.PlanCheck d03_ngram_jaccard_pairs [--full]"`.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val full = args.contains("--full")
    val names = args.filterNot(_.startsWith("--")) match {
      case Array() => SparkEntry.queries.keys.toSeq.sorted
      case xs      => xs.toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // read the plan AFTER execution: AQE reuses shuffle stages at
      // runtime, so reuse only shows in the final adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("ShuffleQueryStage") && l.contains("reuse"))
      val exch = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Reused"))
      println(f"[plancheck] $n%-28s exchanges=$exch reused=$reused rows=$rows ${sec}%.2fs")
      if (full) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
