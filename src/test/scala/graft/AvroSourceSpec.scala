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
