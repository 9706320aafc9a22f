package graft

import scala.collection.mutable
import scala.io.Source

import org.apache.spark.sql.{Row, SparkSession}

import org.locationtech.jts.geom.Geometry

import graft.spatial.Geo

/** Minimal sqllogictest runner for the reference's test corpus
  * (test fixture: src/test/resources/spatial_udf.slt, taken verbatim
  * from /root/reference/src/sqllogictest/test_files/spatial_udf.slt).
  *
  * Implements the subset the corpus uses — `query <types> [rowsort]`
  * blocks — plus the reference's normalization contract
  * (engines/conversion.rs, normalize.rs:17-232): floats rounded to 12
  * decimal places with trailing zeros trimmed, NULL for nulls,
  * "(empty)" for empty strings, lowercase booleans.
  *
  * Maintainer tooling mirrors the reference harness (README
  * "Completion Mode", bin/sqllogictests.rs):
  *   - `<slt:ignore>` wildcard markers in expected blocks skip volatile
  *     fragments (util.rs:62-105 — whole-snapshot fragment matching,
  *     leading text before the first fragment fails the match);
  *   - [[complete]] regenerates every expected block from live results,
  *     the `--complete` golden-update flow.
  *
  * WKT-valued results get a geometry-semantic fallback compare
  * (normalized structure + relative 1e-9 coordinate tolerance): JTS and
  * the reference's geos/geo backends emit equivalent geometries with
  * different ring rotations and last-ulp arithmetic.
  */
object SltRunner {

  final case class Case(line: Int, sql: String, rowsort: Boolean,
      expected: Seq[String], expStart: Int = -1, expEnd: Int = -1)
  final case class Failure(c: Case, got: Seq[String], error: Option[String])

  val IgnoreMarker = "<slt:ignore>"

  def parse(resource: String): Seq[Case] =
    parseLines(readResource(resource))

  private def readResource(resource: String): Vector[String] =
    Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8").getLines().toVector

  /** Parses `query` blocks, recording the raw line span of each
    * expected block ([expStart, expEnd)) so [[complete]] can splice
    * regenerated expectations back in place. */
  def parseLines(lines: Vector[String]): Seq[Case] = {
    val cases = mutable.Buffer[Case]()
    var i = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.startsWith("query ")) {
        val rowsort = l.contains("rowsort")
        val start = i + 1
        val sql = mutable.Buffer[String]()
        var j = start
        while (j < lines.length && lines(j).trim != "----") { sql += lines(j); j += 1 }
        j += 1 // skip ----
        val expStart = j
        val expected = mutable.Buffer[String]()
        while (j < lines.length && lines(j).trim.nonEmpty) { expected += lines(j); j += 1 }
        cases += Case(start, sql.mkString("\n"), rowsort, expected.toSeq,
          expStart, j)
        i = j
      } else i += 1
    }
    cases.toSeq
  }

  /** Renders one query's result rows under the corpus normalization. */
  private def resultLines(spark: SparkSession, c: Case): Seq[String] = {
    val rows = spark.sql(c.sql).collect()
    val raw = rows.map(r =>
      (0 until r.length).map(k => render(r.get(k))).mkString(" ")).toSeq
    if (c.rowsort) raw.sorted else raw
  }

  def run(spark: SparkSession, resource: String): Seq[Failure] =
    parse(resource).flatMap { c =>
      try {
        val got = resultLines(spark, c)
        val want = if (c.rowsort) c.expected.sorted else c.expected
        val ok =
          if (c.expected.exists(_.contains(IgnoreMarker)))
            fragmentsMatch(got, want)
          else got.size == want.size &&
            got.zip(want).forall { case (g, e) => g == e || geomEq(g, e) }
        if (ok) None else Some(Failure(c, got, None))
      } catch {
        case e: Throwable => Some(Failure(c, Nil, Some(e.getMessage)))
      }
    }

  /** `<slt:ignore>` wildcard matching on the WHOLE result snapshot
    * (reference util.rs:77-105): split the expected snapshot on the
    * marker, then require each literal fragment to appear in order in
    * the actual snapshot; only fragment INDEX 0 anchors at position 0
    * (a marker-leading expected block makes fragment 0 empty, so the
    * whole snapshot starts with a wildcard — exactly util.rs's rule;
    * anchoring the first NON-empty fragment instead would reject
    * leading-wildcard expectations the reference accepts). */
  def fragmentsMatch(actual: Seq[String], expected: Seq[String]): Boolean = {
    val actualSnap = actual.mkString("\n")
    val expectedSnap = expected.mkString("\n")
    val fragments = expectedSnap.split(java.util.regex.Pattern.quote(IgnoreMarker), -1)
    var pos = 0
    for ((frag, i) <- fragments.zipWithIndex if frag.nonEmpty) {
      val idx = actualSnap.indexOf(frag, pos)
      if (idx < 0) return false
      if (i == 0 && idx != 0) return false
      pos = idx + frag.length
    }
    true
  }

  /** Completion mode (`--complete`): returns the corpus with every
    * expected block replaced by the engine's live, normalized results.
    * Blocks whose expectations carry `<slt:ignore>` markers are left
    * untouched (regenerating them would overwrite the maintainer's
    * wildcards with one volatile observation — the reference harness
    * has the same hands-off rule for manually-curated blocks). */
  def complete(spark: SparkSession, lines: Vector[String]): Vector[String] = {
    val cases = parseLines(lines)
    val out = mutable.Buffer[String]()
    var i = 0
    val byStart = cases.map(c => c.expStart -> c).toMap
    while (i < lines.length) {
      byStart.get(i) match {
        case Some(c) if !c.expected.exists(_.contains(IgnoreMarker)) =>
          out ++= resultLines(spark, c)
          // a zero-row expected block has expEnd == expStart == i: the
          // line AT i is not part of the block, so fall through to copy
          // it normally instead of looping on i = expEnd forever
          if (c.expEnd > i) i = c.expEnd
          else { out += lines(i); i += 1 }
        case _ =>
          out += lines(i)
          i += 1
      }
    }
    // a zero-row block whose expStart sits at end-of-file (corpus ends
    // with '----' and no further line) is never reached by the loop —
    // emit its regenerated rows here or they are silently dropped
    byStart.get(lines.length).foreach { c =>
      if (!c.expected.exists(_.contains(IgnoreMarker)))
        out ++= resultLines(spark, c)
    }
    out.toVector
  }

  /** Completion mode over a classpath resource. */
  def complete(spark: SparkSession, resource: String): Vector[String] =
    complete(spark, readResource(resource))

  /** Reference normalization: conversion.rs float12 / NULL / (empty). */
  def render(v: Any): String = v match {
    case null                    => "NULL"
    case b: Boolean              => if (b) "true" else "false"
    case d: Double               => fmtFloat(BigDecimal(d))
    case f: Float                => fmtFloat(BigDecimal(f.toDouble))
    case d: java.math.BigDecimal => fmtFloat(BigDecimal(d))
    case s: String               => if (s.isEmpty) "(empty)" else s
    case b: Array[Byte]          => b.map("%02x".format(_)).mkString
    case r: Row                  => // struct: sqllogictest-rs style {f: v, ...}
      r.schema.fieldNames.zipWithIndex.map { case (n, i) =>
        s"$n: ${structVal(r.get(i))}"
      }.mkString("{", ", ", "}")
    case o => o.toString
  }

  /** Inside structs the reference renders f64 via Rust Display (1.0). */
  private def structVal(v: Any): String = v match {
    case null      => "NULL"
    case d: Double => if (d == d.floor && !d.isInfinite) s"${d.toLong}.0" else d.toString
    case o         => render(o)
  }

  private def fmtFloat(bd: BigDecimal): String = {
    val r = bd.setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros
    if (r.scale <= 0) r.setScale(0).toPlainString else r.toPlainString
  }

  /** Geometry-semantic equality of two (E)WKT strings. */
  private def geomEq(got: String, expected: String): Boolean =
    try {
      val a = Geo.fromEwkt(got)
      val b = Geo.fromEwkt(expected)
      if (a == null || b == null) return false
      a.getSRID == b.getSRID && {
        a.normalize(); b.normalize()
        sameCoords(a, b)
      }
    } catch { case _: Throwable => false }

  private def sameCoords(a: Geometry, b: Geometry): Boolean = {
    if (a.getGeometryType != b.getGeometryType) return false
    val ca = a.getCoordinates
    val cb = b.getCoordinates
    ca.length == cb.length && ca.zip(cb).forall { case (p, q) =>
      relEq(p.x, q.x) && relEq(p.y, q.y)
    }
  }

  private def relEq(x: Double, y: Double): Boolean =
    math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
}
