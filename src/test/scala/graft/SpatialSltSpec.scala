package graft

import graft.spatial.SpatialFunctions

/** Acceptance suite: the reference's entire spatial scalar corpus
  * (574-line spatial_udf.slt, 93 queries) must pass against our ST_*
  * registry.
  */
class SpatialSltSpec extends GraftSuite {

  test("spatial_udf.slt corpus passes") {
    SpatialFunctions.registerAll(spark)
    val failures = SltRunner.run(spark, "/spatial_udf.slt")
    if (failures.nonEmpty) {
      val msg = failures.take(25).map { f =>
        s"""line ${f.c.line}: ${f.c.sql}
           |  expected: ${f.c.expected.mkString(" | ")}
           |  got:      ${f.error.getOrElse(f.got.mkString(" | "))}""".stripMargin
      }.mkString("\n")
      fail(s"${failures.size}/93 slt queries failed:\n$msg")
    }
  }

  test("completion mode round-trips the corpus") {
    // the --complete golden-update flow (reference README "Completion
    // Mode"): regenerating every expected block from live results must
    // (a) produce a corpus the runner accepts with zero failures, and
    // (b) agree with the checked-in expectations line by line — exactly
    // or geometry-semantically (JTS vs geos ring rotation / last-ulp)
    SpatialFunctions.registerAll(spark)
    val original = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/spatial_udf.slt"), "UTF-8")
      .getLines().toVector
    val regenerated = SltRunner.complete(spark, original)
    assert(regenerated.size == original.size,
      s"completion changed the corpus shape: ${original.size} -> ${regenerated.size} lines")
    val origCases = SltRunner.parseLines(original)
    val regenCases = SltRunner.parseLines(regenerated)
    assert(origCases.size == regenCases.size)
    // every regenerated expectation must agree with the checked-in one
    // under the corpus equality: exact, or geometry-equal for WKT lines
    val diffs = origCases.zip(regenCases).flatMap { case (o, r) =>
      val want = if (o.rowsort) o.expected.sorted else o.expected
      val got = if (o.rowsort) r.expected.sorted else r.expected
      if (want.size != got.size) Some(o.line -> s"row count ${want.size} vs ${got.size}")
      else want.zip(got).collectFirst {
        case (w, g) if w != g && !SltRunnerTestHook.geomEqPublic(g, w) =>
          o.line -> s"'$w' vs '$g'"
      }
    }
    assert(diffs.isEmpty,
      s"completion diverged from golden on ${diffs.size} cases:\n" +
        diffs.take(10).map { case (l, d) => s"  line $l: $d" }.mkString("\n"))
  }

  test("<slt:ignore> wildcard matches volatile fragments (reference util.rs semantics)") {
    import SltRunner.fragmentsMatch
    // marker skips a volatile middle fragment
    assert(fragmentsMatch(
      Seq("metrics=[output_rows=101, elapsed_compute=1.2ms, bytes=88]"),
      Seq("metrics=[output_rows=101, elapsed_compute=<slt:ignore>, bytes=88]")))
    // trailing marker skips the tail
    assert(fragmentsMatch(Seq("foo bar baz"), Seq("foo <slt:ignore>")))
    // multi-line snapshots: fragments must appear in order
    assert(fragmentsMatch(Seq("a 1", "b 2", "c 3"),
      Seq("a <slt:ignore>", "<slt:ignore>c 3")))
    assert(!fragmentsMatch(Seq("c 3", "b 2"), Seq("b 2", "<slt:ignore>c 3")))
    // reference edge case (util.rs:117-134): leading text before the
    // first fragment is NOT skippable
    assert(!fragmentsMatch(Seq("foo bar baz"), Seq("bar <slt:ignore>")))
    // ...but an expected block that BEGINS with the marker makes
    // fragment 0 empty, so leading text IS skippable (util.rs anchors
    // only fragment index 0, not the first non-empty fragment)
    assert(fragmentsMatch(Seq("foo bar"), Seq("<slt:ignore>bar")))
    assert(fragmentsMatch(Seq("x 9", "a 1"), Seq("<slt:ignore>", "a 1")))
    // still ordered: the post-marker fragment must exist
    assert(!fragmentsMatch(Seq("foo bar"), Seq("<slt:ignore>qux")))
  }

  test("completion mode terminates on a zero-row expected block") {
    // a `query` block whose expected section is empty (zero result
    // rows) has expStart == expEnd; complete() must not loop forever
    // and must preserve the line that follows the block
    val corpus = Vector(
      "query I",
      "SELECT 1 WHERE 1 = 0",
      "----",
      "",
      "query I",
      "SELECT 42",
      "----",
      "42",
      "")
    val regen = SltRunner.complete(spark, corpus)
    // zero-row block stays zero-row; 42 regenerates to itself
    val cases = SltRunner.parseLines(regen)
    assert(cases.size == 2)
    assert(cases.head.expected.isEmpty)
    assert(cases(1).expected == Seq("42"))
  }

  test("completion regenerates a zero-row block that ends the corpus") {
    // the corpus ends exactly at '----' with no trailing line: the
    // block's expStart sits at lines.length, outside the copy loop —
    // its regenerated rows must still be emitted
    val corpus = Vector(
      "query I",
      "SELECT 7",
      "----")
    val regen = SltRunner.complete(spark, corpus)
    val cases = SltRunner.parseLines(regen)
    assert(cases.size == 1)
    assert(cases.head.expected == Seq("7"))
  }
}

/** Exposes the runner's geometry-tolerant equality to the round-trip
  * audit without widening SltRunner's public surface. */
private object SltRunnerTestHook {
  def geomEqPublic(got: String, expected: String): Boolean = {
    try {
      val a = graft.spatial.Geo.fromEwkt(got)
      val b = graft.spatial.Geo.fromEwkt(expected)
      if (a == null || b == null) return false
      a.getSRID == b.getSRID && {
        a.normalize(); b.normalize()
        a.getGeometryType == b.getGeometryType && {
          val (ca, cb) = (a.getCoordinates, b.getCoordinates)
          def relEq(x: Double, y: Double) =
            math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
          ca.length == cb.length && ca.zip(cb).forall(p => relEq(p._1.x, p._2.x) && relEq(p._1.y, p._2.y))
        }
      }
    } catch { case _: Throwable => false }
  }
}
