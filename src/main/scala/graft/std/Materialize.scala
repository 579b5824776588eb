package graft.std

import org.apache.spark.sql.DataFrame

/** Materialize-once barrier for diamond-shaped plans.
  *
  * A lazily-composed pipeline whose intermediate frame feeds N downstream
  * consumers (a self-join's two sides, a verify join plus a signature
  * aggregate, ...) re-executes the whole upstream subtree once per
  * consumer unless Spark happens to reuse the exchange — and exchange
  * reuse is fragile under AQE re-planning and alias divergence. For an
  * expensive upstream (regex normalization + shingling over a corpus)
  * that turns an 11 s query into a ~100 s one when the reuse doesn't
  * fire. Pinning the frame makes the cost deterministic: compute once,
  * read N times.
  *
  * `localCheckpoint(eager)` stores the partitions as executor-local
  * blocks and truncates lineage. On a single-node runner that is strictly
  * the right tool. On a 1000-executor cluster, truncated lineage means an
  * executor loss is unrecoverable — there, swap this body for
  * `df.persist(StorageLevel.DISK_ONLY)` + a materializing action, or
  * write/read an intermediate parquet table (which also survives driver
  * restarts and lets AQE re-derive statistics). The call sites only rely
  * on the materialize-once contract, not on the mechanism.
  */
object Materialize {
  def once(df: DataFrame): DataFrame = df.localCheckpoint(true)
}
