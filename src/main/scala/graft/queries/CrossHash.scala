package graft.queries

/** Cross-engine deterministic hashing + expression let-binding shared
  * by the dedup/text pipelines (see [[DedupOps]] for the original
  * derivation and pitfalls).
  */
private[graft] object CrossHash {

  /** Cross-engine 64-bit hash: the top 60 bits of md5 as a non-negative
    * BIGINT. Spark and DuckDB compute md5 hex identically and 15 hex
    * digits fit a signed long, so sketches built on it can be
    * hash-compared against the DuckDB oracle. */
  def h64E(x: String): String =
    s"CAST(conv(substring(md5($x), 1, 15), 16, 10) AS BIGINT)"

  /** DuckDB mirror of [[h64E]]. */
  def sqlH64(x: String): String =
    s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"

  /** Let-binding via a single-element transform: evaluates `bound` once
    * and exposes it to `body` as lambda variable `v` — without it,
    * CollapseProject inlines the subexpression into every lambda that
    * references it (the round-1 ~1000× shingle blow-up). */
  def bind(bound: String, v: String)(body: String => String): String =
    s"element_at(transform(array($bound), $v -> ${body(v)}), 1)"
}
