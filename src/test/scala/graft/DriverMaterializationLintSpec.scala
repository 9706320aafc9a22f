package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source lint: driver-side materialization (`collect`/`head`/
  * `toLocalIterator`) is the one pattern that silently breaks the
  * 100 TB posture — an operator that iterates a collect is not
  * distributed. Every current site is audited-bounded:
  *
  *  - PgServer: wire-protocol row rendering (the server's job; the
  *    simple protocol is row-limited, the extended path streams via
  *    toLocalIterator)
  *  - InfoSchemaPlugin: catalog listings (metadata-sized)
  *  - SpatialJoin: the ≤10k KDB envelope sample + the 1-row global
  *    bounds aggregate
  *  - AnnIndex: the K-sized coarse-centroid id list
  *  - VectorOps: v34's k-means++ distributed-argmax top-1 rows
  *  - StreamingOps: the 11-bucket baseline histogram broadcast
  *  - Bench: JVM warm-up
  *
  * The spec freezes a PER-FILE budget of such sites. Adding one
  * anywhere fails the build until the new site is audited (bounded
  * output, not per-row work) and the budget line updated — the
  * automated form of the review sweep.
  */
class DriverMaterializationLintSpec extends AnyFunSuite {

  private val Pattern =
    """\.collect\(\)|collectAsList|\.head\(\)|\.toLocalIterator""".r

  /** file (relative to src/main/scala/graft) -> audited site count */
  private val Budget = Map(
    // 6th site (round 7): binary COPY OUT's toLocalIterator — the same
    // streaming wire-render role as the text COPY path, never a full
    // driver materialization
    "server/PgServer.scala" -> 6,
    // round 8: visibleTables' three catalog-listing collects moved from
    // InfoSchemaPlugin into the shared LiveCatalog (pg_class snapshot);
    // all remain metadata-sized listings
    "pg/InfoSchemaPlugin.scala" -> 2,
    "pg/LiveCatalog.scala" -> 3,
    // SpillSmoke: the 1-row fingerprint aggregate head()
    "SpillSmoke.scala" -> 1,
    "operators/SpatialJoin.scala" -> 3,
    // round 11: the opt-in pair-budget guard's two 1-row Σ-product
    // aggregates (equi-join + self-join forms) — bounded by definition
    "operators/PairBudget.scala" -> 2,
    "queries/VectorOps.scala" -> 2,
    "streaming/StreamingOps.scala" -> 1,
    "operators/AnnIndex.scala" -> 1,
    // round 11: + the fixed-work calibration probe — a 1-row sum over
    // range(), collected twice per bench run (start/end box-speed pin)
    "Bench.scala" -> 2,
    // round 9: the bench-outlier attribution probe's warmup collect —
    // a dev diagnostic main, 1 row
    "BenchProbe.scala" -> 1,
    // round 13: the subset A/B bench's warmup collect — a dev
    // diagnostic main (Bench's methodology over named queries), 1 row
    "MiniBench.scala" -> 1)

  test("driver-side materialization stays within the audited per-file budget") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root), s"missing $root")
    val files = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq
      finally s.close()
    }
    val counts = files.map { p =>
      val rel = root.relativize(p).toString
      val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      rel -> Pattern.findAllIn(src).size
    }.filter(_._2 > 0).toMap
    val over = counts.filter { case (f, n) => n > Budget.getOrElse(f, 0) }
    assert(over.isEmpty,
      s"unaudited driver-side materialization: ${over.mkString(", ")} " +
        s"(budget: ${Budget.mkString(", ")}) — audit the new site for " +
        "bounded output, then raise its budget entry")
    // and the budget itself can't go stale upward (deleted sites
    // should shrink the budget so it stays an exact audit record)
    val stale = Budget.filter { case (f, n) => counts.getOrElse(f, 0) < n }
    assert(stale.isEmpty, s"budget entries above actual counts: $stale")
  }
}
