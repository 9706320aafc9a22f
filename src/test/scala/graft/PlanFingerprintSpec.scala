package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-SHAPE regression harness over every registered query.
  *
  * PlanQualitySpec asserts targeted properties of targeted queries; a
  * plan regression elsewhere (a lost broadcast after an innocent
  * refactor, a new shuffle from a changed join key, a window sneaking
  * into a rewritten pipeline) would land silently as long as results
  * stay correct. This suite fingerprints the physical plan of ALL
  * queries — counts of the operators that define cost at scale — and
  * diffs against a checked-in golden file.
  *
  * Regenerate after an INTENTIONAL plan change:
  *   GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanFingerprintSpec"
  * then review the golden diff like any code change: every changed
  * line is a plan-shape change you are signing off on.
  *
  * COVERAGE CAVEAT (r13 advisor): queries that eagerly
  * `localCheckpoint` at sharing roots (the d-battery pair frames,
  * Rank's ranged frame, the iterative operators' loops) flatten their
  * upstream pipeline to LogicalRDD leaves, so their fingerprint counts
  * only the post-checkpoint plan TAIL — an upstream plan regression
  * hides behind the leaf, and building those plans here EXECUTES the
  * checkpointed stages (this is a partial-execution test for them, not
  * plan-only). The upstream shapes are instead pinned by the committed
  * per-round plan files under plans/rNN (dumped from the same
  * builders) and by the oracle diff; treat this file as the cheap
  * tripwire, not the complete plan record.
  */
class PlanFingerprintSpec extends GraftSuite {

  /** The cost-defining operators; each is a line-prefix match on the
    * formatted plan's node names. Exchange counts shuffles (its
    * broadcast sibling is counted separately). */
  private val Ops: Seq[(String, String)] = Seq(
    "shuffle" -> "Exchange",
    "bcast" -> "BroadcastExchange",
    "smj" -> "SortMergeJoin",
    "bhj" -> "BroadcastHashJoin",
    "shj" -> "ShuffledHashJoin",
    "bnlj" -> "BroadcastNestedLoopJoin",
    "cartesian" -> "CartesianProduct",
    "window" -> "Window",
    "sort" -> "Sort",
    "generate" -> "Generate")

  private def fingerprint(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    // node names from the formatted header section — one line per
    // operator, stable across column-id renumbering
    val nodes = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
      .linesIterator
      .takeWhile(_.trim.nonEmpty) // header tree only, not the detail blocks
      .map(_.dropWhile(c => !c.isLetter))
      .map(_.stripPrefix("* ")) // codegen marker
      .toSeq
    graft.util.Persist.releaseAll()
    val counts = Ops.map { case (label, prefix) =>
      val n = prefix match {
        case "Exchange" => nodes.count(_.startsWith("Exchange"))
        case "Sort"     => nodes.count(n =>
          n.startsWith("Sort") && !n.startsWith("SortMergeJoin") &&
            !n.startsWith("SortAggregate"))
        case "Window"   => nodes.count(n =>
          n.startsWith("Window") && !n.startsWith("WindowGroupLimit"))
        case p          => nodes.count(_.startsWith(p))
      }
      s"$label=$n"
    }
    counts.mkString(" ")
  }

  private val goldenPath = java.nio.file.Paths.get(
    "src/test/resources/plan_fingerprints.txt")

  test("every query's plan shape matches the golden fingerprint") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val got = names.map(n => n -> (
      try fingerprint(n) catch { case e: Throwable => s"ERROR ${e.getClass.getSimpleName}" }))
    if (sys.env.contains("GRAFT_REGEN_PLANS")) {
      val body = got.map { case (n, f) => s"$n $f" }.mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.writeString(goldenPath, body)
      info(s"regenerated ${got.size} fingerprints at $goldenPath")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        "golden file missing — run with GRAFT_REGEN_PLANS=1 to create it")
      val golden = scala.io.Source.fromFile(goldenPath.toFile).getLines()
        .filter(_.nonEmpty)
        .map { l => val i = l.indexOf(' '); l.take(i) -> l.drop(i + 1) }
        .toMap
      val newQueries = got.filterNot { case (n, _) => golden.contains(n) }
      val missing = golden.keySet -- got.map(_._1).toSet
      val changed = got.filter { case (n, f) =>
        golden.contains(n) && golden(n) != f
      }
      val report = (changed.map { case (n, f) =>
        s"  $n\n    golden: ${golden(n)}\n    got:    $f"
      } ++ newQueries.map { case (n, f) => s"  NEW $n ($f)" } ++
        missing.toSeq.sorted.map(n => s"  REMOVED $n")).mkString("\n")
      assert(changed.isEmpty && newQueries.isEmpty && missing.isEmpty,
        s"plan shapes drifted — review, then GRAFT_REGEN_PLANS=1 to accept:\n$report")
    }
  }
}
