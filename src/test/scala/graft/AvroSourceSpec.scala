package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The graft-avro DataSource V2 (sources/GraftAvro.scala): container
  * round-trips, logical-type fidelity, null unions, projection
  * pushdown, and multi-task writes.
  */
class AvroSourceSpec extends GraftSuite {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_avro_$tag").toString

  test("documents round-trip bit-exact through avro containers") {
    val dir = tmpDir("docs")
    val in = Tables.documents(spark, sf)
    in.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      in.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(_.toSeq).toSet == in.collect().map(_.toSeq).toSet)
  }

  test("timestamp-micros logical type preserves event times exactly") {
    val dir = tmpDir("events")
    val in = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    in.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val a = back.select(col("event_id"), unix_micros(col("ts")).as("us"),
      col("user_id"), col("event_type"), col("value"))
      .collect().map(_.toSeq).toSet
    val b = in.select(col("event_id"), unix_micros(col("ts")).as("us"),
      col("user_id"), col("event_type"), col("value"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("nullable columns ride [null, T] unions") {
    val dir = tmpDir("nulls")
    val in = Tables.documents(spark, sf)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, col("lang")).as("maybe_lang"))
    in.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.collect().map(_.toSeq).toSet == in.collect().map(_.toSeq).toSet)
    assert(back.where(col("maybe_lang").isNull).count() ==
      in.where(col("maybe_lang").isNull).count())
  }

  test("column pruning reaches the avro reader schema (projection pushdown)") {
    val dir = tmpDir("prune")
    Tables.documents(spark, sf).write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir).select("doc_id")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }
    assert(scan.isDefined, "no BatchScan planned")
    assert(scan.get.readSchema().fieldNames.toSeq == Seq("doc_id"),
      s"pruned schema was ${scan.get.readSchema().fieldNames.mkString(",")}")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      Tables.documents(spark, sf).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("every supported type round-trips, nulls included") {
    val dir = tmpDir("types")
    val in = spark.range(0, 100).select(
      col("id"),
      (col("id") % 3 === 0).as("flag"),
      col("id").cast("int").as("i32"),
      (col("id") * 1.5f).cast("float").as("f32"),
      (col("id") * 2.5).as("f64"),
      concat(lit("s"), col("id")).as("str"),
      encode(concat(lit("b"), col("id")), "UTF-8").as("bin"),
      to_date(lit("2024-01-01")).as("d"),
      when(col("id") % 5 === 0, lit(null).cast("timestamp"))
        .otherwise(timestamp_micros(col("id") * 1000001L)).as("ts"))
    in.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      in.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // binary needs a value compare (Array[Byte] equality is by ref)
    def key(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"), col("flag"), col("i32"), col("f32"), col("f64"),
      col("str"), hex(col("bin")).as("binhex"), col("d"),
      unix_micros(col("ts")).as("us")).collect().map(_.toSeq).toSet
    assert(key(back) == key(in))
  }

  test("extreme values survive: NaN/±Inf/-0.0, Long.Min, unicode, empty bytes") {
    val dir = tmpDir("extreme")
    val in = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, CAST('NaN' AS DOUBLE), 'plain', x''),
        |  (2L, CAST('Infinity' AS DOUBLE), '', x'00ff'),
        |  (3L, CAST('-Infinity' AS DOUBLE), 'ünïcødé 試験 🚀', x'deadbeef'),
        |  (4L, -0.0D, 'tab\tnewline\n', x'01'),
        |  (-9223372036854775808L, 1.7976931348623157E308D, 'max', x'ff')
        |AS t(id, d, s, b)""".stripMargin)
    in.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    // compare doubles by BITS (NaN != NaN, -0.0 == 0.0 under ==)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        r.getString(2), r.getAs[Array[Byte]](3).toSeq)).toSet
    assert(key(back) == key(in))
  }

  test("reading a fresh (empty) directory yields an empty frame, not an error") {
    val dir = tmpDir("empty")
    val df = spark.read.format("graft-avro").load(dir)
    assert(df.schema.isEmpty && df.count() == 0)
  }

  test("multi-task writes land one committed container per partition") {
    val dir = tmpDir("multi")
    Tables.documents(spark, sf).repartition(3)
      .write.format("graft-avro").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".avro")) == 3, files.mkString(","))
    assert(!files.exists(_.endsWith(".inprogress")), "uncommitted temp left")
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() == Tables.documents(spark, sf).count())
  }
}
