package graft

/** Shuffle-partitioning invariance: at 100 TB the partition count is
  * whatever the cluster decides, so a query whose RESULT depends on it
  * (IEEE sum order through a hash aggregate, unstable top-k ties,
  * collect_set ordering leaking into output) is wrong even if it passes
  * the single-configuration oracle gate. This suite re-runs a sample of
  * the most order-sensitive queries under 1 / 4 / 7 shuffle partitions
  * and asserts byte-identical results — the determinism contracts
  * (Det.dsum decimal sums, TopK struct tie-breaks, membership-only
  * collect_set use) doing their job under a reshuffle.
  */
class DeterminismSpec extends GraftSuite {

  // order-sensitive shapes: decimal sums (q01/q43/sp12), two-level
  // TopK (q43/v19), min-label propagation + histogram (d16), windows
  // over aggregates (q44/t33), covered-position collect_set (t30)
  // round-5 additions: v29 pushes decimal sums through a posexplode
  // fan-out; d21 chains every order-sensitive stage (digest dedup,
  // label propagation, struct-min canonical pick) into one result
  // this session's additions: q62 (ranking-window rewrite ties), q64
  // (range-partitioned global rank must not depend on the partition
  // count), v33 (decimal sums through two M'Mv rounds), v34 (top-1
  // argmax ties under reshuffle), sp16 (weighted decimal sums)
  private val names = Seq(
    "q01_pricing_summary", "q43_type_top_users", "q44_cusum_changepoint",
    "t30_dup_span_removal", "t33_source_novelty", "d16_dedup_impact",
    "sp12_revenue_hotspots", "v19_pq_recall_audit", "v29_isotropy_audit",
    "d21_corpus_funnel", "v32_label_separation", "d22_langid_eval",
    "q62_distinct_on_latest", "q64_entity_resolution",
    "v33_power_iteration", "v34_kmeanspp_seeds", "sp16_areal_interpolation",
    "v35_all_but_the_top", "q67_market_share", "q71_linear_attribution",
    "v36_rocchio_prf", "d23_threshold_sweep")

  private def run(name: String, parts: String): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    finally graft.util.Persist.releaseAll()
  }

  test("results are bit-identical under 1 / 4 / 7 shuffle partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (name <- names) {
        val ref = run(name, "4")
        assert(ref.nonEmpty, s"$name returned no rows")
        for (p <- Seq("1", "7")) {
          val got = run(name, p)
          assert(got == ref,
            s"$name changed under $p shuffle partitions: " +
              got.zip(ref).collectFirst { case (g, r) if g != r => s"$g != $r" }
                .getOrElse(s"sizes ${got.size} vs ${ref.size}"))
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
