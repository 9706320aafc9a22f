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
    import org.apache.spark.sql.functions._
    graft.functions.SketchFunctions.registerAll(spark)
    // current d01 (two sketch passes)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    timed("d01 current")(SparkEntry.queries("d01_minhash_lsh_pairs")(spark, d).count())
    timed("d01 current again")(SparkEntry.queries("d01_minhash_lsh_pairs")(spark, d).count())
    spark.stop()
  }
}
