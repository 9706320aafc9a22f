package graft

import org.apache.spark.sql.SparkSession

/** ST_ scalar-function cost attribution (dev tool, judge ask round 8
  * #6): times the registered constructive/parameterized geometry
  * functions over a few hundred thousand buffered polygons, and times
  * the identical JTS work in a bare mapPartitions loop — the "JTS
  * floor" — so the ScalaUDF wrapper's share (arg conversion + WKB
  * round-trip per call) is measured rather than guessed. If a function
  * sits near its floor, lifting it to a nullSafeEval Catalyst
  * expression buys little; a large gap names the candidates worth
  * lifting.
  */
object StMicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spatial.SpatialFunctions.registerAll(spark)
    val n = 400000L
    val df = spark.range(n).selectExpr(
      "st_buffer(st_makepoint(cast(id % 1000 as double), " +
        "cast(id div 1000 as double)), 0.5, 8) AS a",
      "st_makeenvelope(cast(id % 1000 as double) - 0.4, " +
        "cast(id div 1000 as double) - 0.4, cast(id % 1000 as double) + 0.4, " +
        "cast(id div 1000 as double) + 0.4) AS b")
      .localCheckpoint(true)
    def time(name: String, sql: String): Unit = {
      df.selectExpr(s"$sql AS r").where("r IS NOT NULL").count() // warm
      val t0 = System.nanoTime()
      df.selectExpr(s"$sql AS r").where("r IS NOT NULL").count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"fn":"$name","secs":$s%.3f,"rows_per_s":${n / s}%.0f}""")
    }
    // in-run A/B: the native StScalarExpr registration vs the identical
    // kernel behind a ScalaUDF wrapper (cross-run comparisons on this
    // shared box swing 2x, so wrapper share must be measured same-JVM)
    spark.udf.register("st_area_udf", (b: Array[Byte]) => {
      val g = graft.spatial.Geo.fromWkb(b)
      if (g == null) null.asInstanceOf[java.lang.Double] else Double.box(g.getArea)
    })
    time("st_area", "st_area(a)")
    time("st_area_scalaudf", "st_area_udf(a)")
    time("st_intersection", "st_intersection(a, b)")
    time("st_area_of_intersection", "st_area(st_intersection(a, b))")
    time("st_buffer", "st_buffer(a, 0.1)")
    time("st_union", "st_union(a, b)")
    time("st_transform", "st_transform(st_setsrid(a, 4326), 3857)")
    time("st_simplify", "st_simplify(a, 0.05)")

    // the JTS floor: identical per-row work without the UDF layer
    import spark.implicits._
    val rows = df.select("a", "b").as[(Array[Byte], Array[Byte])]
    def timeJts(name: String)(
        f: (org.locationtech.jts.geom.Geometry,
            org.locationtech.jts.geom.Geometry) => Any): Unit = {
      def job(): Long = rows.mapPartitions { it =>
        it.map { case (a, b) =>
          val ga = graft.spatial.Geo.fromWkb(a)
          val gb = graft.spatial.Geo.fromWkb(b)
          f(ga, gb) match {
            case g: org.locationtech.jts.geom.Geometry =>
              graft.spatial.Geo.toWkb(g).length.toLong
            case _ => 1L
          }
        }
      }.reduce(_ + _)
      job() // warm
      val t0 = System.nanoTime()
      job()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"fn":"$name","secs":$s%.3f,"rows_per_s":${n / s}%.0f,"floor":true}""")
    }
    timeJts("jts_area")((a, _) => a.getArea)
    timeJts("jts_intersection")((a, b) => a.intersection(b))
    timeJts("jts_buffer")((a, _) =>
      org.locationtech.jts.operation.buffer.BufferOp.bufferOp(a, 0.1))
    spark.stop()
  }
}
