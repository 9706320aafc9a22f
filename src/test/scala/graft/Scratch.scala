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
    val d = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions._
    val pat = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    val df = Tables.documents(spark, d)
      .select(col("doc_id"), size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n"))
      .orderBy(col("doc_id"))
    df.limit(5).collect().foreach(r => println(s"[scratch] ${r.getLong(0)} ${r.getInt(1)}"))
    println(s"[scratch] total ${df.agg(sum(col("n"))).head().getLong(0)}")
    spark.stop()
  }
}
