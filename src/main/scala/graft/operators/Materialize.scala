package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialize-once policy for re-read intermediates (shingle sets,
  * band keys, label frames): compute the expensive stage exactly once
  * and serve both downstream readers from it.
  *
  * Default mode is `localCheckpoint(eager = true)`: nothing is
  * registered in the SQL cache (no unpersist obligation leaks to the
  * caller — DedupSpec asserts the cache stays empty) and the blocks
  * are freed by the ContextCleaner once the plan is GC'd. The
  * trade-off is truncated lineage: a lost executor's blocks cannot be
  * recomputed, so on clusters with aggressive dynamic allocation or
  * preemptible nodes set `spark.graft.localCheckpoint=false` to fall
  * back to `persist()` (recomputable lineage; callers then own cache
  * hygiene, e.g. `spark.catalog.clearCache()` between corpora as
  * Bench does). Eager materialization also means operators run their
  * heavy stage at CONSTRUCTION time in the default mode.
  */
private[graft] object Materialize {
  def once(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.localCheckpoint", "true").toBoolean)
      df.localCheckpoint(true)
    else df.persist()
}
