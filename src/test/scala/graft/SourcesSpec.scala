package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** §2.B sources/sinks surface (the reference's DataFusion-inherited
  * Parquet/CSV/JSON scans, CREATE EXTERNAL TABLE, COPY TO, VALUES,
  * in-memory tables): every format round-trips through `spark.read`/
  * `df.write`, external tables mount via CREATE TABLE USING, and the
  * scans keep their scale properties (filter pushdown, column pruning,
  * partition pruning) — asserted on the physical plans, not assumed.
  * (No spark-avro module ships in this container; Avro is covered by
  * the in-repo `graft-avro` DataSource V2 — see AvroSourceSpec — and
  * mounts through the same STORED AS syntax below.)
  */
class SourcesSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  private lazy val dir = Files.createTempDirectory("graft-sources").toString

  private lazy val sample = spark.range(0, 1000).select(
    col("id"),
    (col("id") % 7).as("grp"),
    concat(lit("name_"), col("id")).as("name"),
    (col("id") * 2.5).as("score"))

  test("csv: header round-trip with explicit schema, column pruning") {
    val p = s"$dir/csv"
    sample.write.mode("overwrite").option("header", "true").csv(p)
    val back = spark.read.option("header", "true")
      .schema("id LONG, grp LONG, name STRING, score DOUBLE").csv(p)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head().getLong(0) == sample.agg(sum("id")).head().getLong(0))
    val plan = back.select("id").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
  }

  test("json: nested struct/array round-trip") {
    val p = s"$dir/json"
    sample.select(col("id"),
      struct(col("grp"), col("name")).as("meta"),
      array(col("score"), col("score") * 2).as("scores"))
      .write.mode("overwrite").json(p)
    val back = spark.read.json(p)
    assert(back.count() == 1000)
    val row = back.filter(col("id") === 7).select("meta.name", "scores").head()
    assert(row.getString(0) == "name_7")
    assert(row.getSeq[Double](1) == Seq(17.5, 35.0))
  }

  test("orc: round-trip with filter pushdown in the scan") {
    val p = s"$dir/orc"
    sample.write.mode("overwrite").orc(p)
    val back = spark.read.orc(p).filter(col("id") > 990)
    assert(back.count() == 9)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(id,990)"), plan)
  }

  test("parquet: partitionBy write, partition pruning on read") {
    val p = s"$dir/part_parquet"
    sample.write.mode("overwrite").partitionBy("grp").parquet(p)
    val back = spark.read.parquet(p).filter(col("grp") === 3)
    assert(back.count() == sample.filter(col("grp") === 3).count())
    val plan = back.queryExecution.executedPlan.toString
    // pruned scan reads one partition directory, not all seven
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(!plan.contains("PartitionFilters: []"), plan)
  }

  test("CREATE TABLE USING mounts an external path; VALUES inline table") {
    val p = s"$dir/ext_parquet"
    sample.write.mode("overwrite").parquet(p)
    spark.sql("DROP TABLE IF EXISTS ext_sample")
    spark.sql(s"CREATE TABLE ext_sample USING parquet OPTIONS (path '$p')")
    try {
      assert(spark.sql("SELECT count(*) FROM ext_sample").head().getLong(0) == 1000)
      val v = spark.sql(
        "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(n, s) ORDER BY n")
        .as[(Int, String)].collect().toSeq
      assert(v == Seq((1, "a"), (2, "b")))
    } finally spark.sql("DROP TABLE IF EXISTS ext_sample")
  }

  test("in-memory dataset registered as a view joins against files") {
    val mem = Seq((0L, "zero"), (3L, "three")).toDF("grp", "label")
    mem.createOrReplaceTempView("grp_labels")
    val p = s"$dir/join_parquet"
    sample.write.mode("overwrite").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("sample_ext")
    val joined = spark.sql(
      """SELECT l.label, count(*) AS n FROM sample_ext s
        |JOIN grp_labels l ON s.grp = l.grp GROUP BY l.label ORDER BY l.label""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(joined == Seq(("three", 143L), ("zero", 143L)))
  }
  test("CREATE TABLE AS SELECT / AS VALUES (the reference's CTAS surface)") {
    spark.sql("DROP TABLE IF EXISTS ctas_vals")
    spark.sql("DROP TABLE IF EXISTS ctas_sel")
    try {
      spark.sql("CREATE TABLE ctas_vals AS VALUES (1, 'a'), (2, 'b') AS t(n, s)")
      assert(spark.table("ctas_vals").count() == 2)
      spark.sql("CREATE TABLE ctas_sel AS SELECT n * 10 AS n10 FROM ctas_vals")
      assert(spark.sql("SELECT sum(n10) FROM ctas_sel").head().getLong(0) == 30)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ctas_vals")
      spark.sql("DROP TABLE IF EXISTS ctas_sel")
    }
  }

  test("binaryFile: raw media ingestion with path filter and length metadata") {
    // the ingestion front door of the multimodal pipeline: opaque bytes
    // + (path, modificationTime, length) metadata columns
    val p = Files.createTempDirectory("graft-bin")
    for (i <- 0 until 4) {
      val payload = Array.tabulate[Byte](16 + i)(j => (i * 31 + j).toByte)
      Files.write(p.resolve(s"clip_$i.bin"), payload)
    }
    Files.write(p.resolve("notes.txt"), "skip me".getBytes)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(p.toString)
    assert(df.count() == 4, "glob filter must exclude notes.txt")
    assert(df.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val byLen = df.select(col("length"), col("content")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).sortBy(_._1)
    assert(byLen.map(_._1).toSeq == Seq(16L, 17L, 18L, 19L))
    assert(byLen.forall { case (len, bytes) => bytes.length == len })
    // length predicate prunes files at scan planning (no content read)
    assert(df.filter(col("length") > 17).count() == 2)
  }

  test("text: line-oriented corpus ingestion (wholetext + per-line)") {
    val p = Files.createTempDirectory("graft-txt")
    Files.write(p.resolve("a.txt"), "line one\nline two\n".getBytes)
    Files.write(p.resolve("b.txt"), "solo\n".getBytes)
    val lines = spark.read.text(p.toString)
    assert(lines.count() == 3)
    val whole = spark.read.option("wholetext", "true").text(p.toString)
    assert(whole.count() == 2)
    assert(whole.as[String].collect().toSet ==
      Set("line one\nline two\n", "solo\n"))
  }

  test("COPY (query) TO 'file': DataFusion-style export via the parser rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-copyto").toString
    spark.sql(s"COPY (SELECT id, id * 2 AS dbl FROM range(5)) TO '$dir/out.parquet'")
    val back = spark.read.parquet(s"$dir/out.parquet")
    assert(back.count() == 5)
    assert(back.filter(col("id") === 3).select("dbl").as[Long].head() == 6L)

    spark.sql(s"COPY (SELECT id FROM range(3)) TO '$dir/out.csv' (FORMAT csv)")
    val csv = spark.read.option("header", "true").csv(s"$dir/out.csv")
    assert(csv.columns.toSeq == Seq("id") && csv.count() == 3)

    // table form + format inferred from extension
    spark.range(4).createOrReplaceTempView("copyto_src")
    spark.sql(s"COPY copyto_src TO '$dir/t.json'")
    assert(spark.read.json(s"$dir/t.json").count() == 4)
  }

  test("COPY table FROM 'file': server-side ingest via the parser rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-copyfrom").toString
    spark.range(3).select(col("id").as("n")).write.parquet(s"$dir/in.parquet")
    spark.sql("DROP TABLE IF EXISTS copyfrom_sink")
    spark.sql("CREATE TABLE copyfrom_sink (n BIGINT) USING parquet")
    spark.sql(s"COPY copyfrom_sink FROM '$dir/in.parquet'")
    assert(spark.table("copyfrom_sink").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    spark.sql("DROP TABLE IF EXISTS copyfrom_sink")
  }

  test("CREATE EXTERNAL TABLE ... STORED AS ... LOCATION (DataFusion mount syntax)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString
    spark.range(6).select(col("id"), (col("id") % 2).as("par"))
      .write.parquet(s"$dir/data")
    spark.sql("DROP TABLE IF EXISTS ext_mounted")
    spark.sql(s"CREATE EXTERNAL TABLE ext_mounted STORED AS PARQUET LOCATION '$dir/data'")
    assert(spark.table("ext_mounted").count() == 6)
    assert(spark.sql("SELECT sum(par) FROM ext_mounted").as[Long].head() == 3L)
    spark.sql("DROP TABLE IF EXISTS ext_mounted")
  }

  test("CREATE EXTERNAL TABLE ... STORED AS AVRO mounts through graft-avro") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ext-avro").toString
    spark.range(8).select(col("id"), (col("id") % 2).as("par"))
      .write.format("graft-avro").mode("append").save(s"$dir/data")
    spark.sql("DROP TABLE IF EXISTS ext_avro")
    spark.sql(s"CREATE EXTERNAL TABLE ext_avro STORED AS AVRO LOCATION '$dir/data'")
    assert(spark.table("ext_avro").count() == 8)
    assert(spark.sql("SELECT sum(par) FROM ext_avro").as[Long].head() == 4L)
    spark.sql("DROP TABLE IF EXISTS ext_avro")
  }
}
