package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * runtime skew-split (which handles sort-merge partitions) can't help:
  * e.g. a shuffled hash join against a dimension that must replicate,
  * or a deliberately pinned non-AQE plan.
  *
  * Shape: the skewed (probe) side gets a uniform random salt in
  * [0, buckets); the compact (build) side is exploded `buckets`× with
  * every salt value; the join key becomes (key, salt), so one hot key's
  * rows spread over `buckets` shuffle partitions instead of one. Build
  * replication is the price — use only when build ≪ probe, which is
  * exactly the skew scenario (hot user, hot token, hot geometry cell).
  *
  * The salt is derived from a hash of the probe row's full key plus a
  * per-row uniform draw via `rand(seed)` — deterministic under a fixed
  * seed for testability; at scale any uniform source works because the
  * salt never leaks into results (it is dropped after the join).
  */
object SkewJoin {

  /** Inner equi-join of `probe` (skewed) with `build` (small) on
    * `keys`, spreading each probe key over `buckets` salt values. */
  def salted(probe: DataFrame, build: DataFrame, keys: Seq[String],
      buckets: Int = 16, seed: Long = 42L): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(probe.columns.toSet.intersect(build.columns.toSet) == keys.toSet,
      "probe/build may only share the join keys")
    val salted = probe.withColumn("__salt",
      (rand(seed) * buckets).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Top-k hot keys by frequency — the diagnosis step before salting
    * (run on a sample at scale; exact here). */
  def hotKeys(df: DataFrame, key: Column, k: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
}
