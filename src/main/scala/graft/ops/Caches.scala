package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for kernel-internal persisted intermediates (ComBat cell stats,
  * DMP moments, MinHash shingles, …). These caches are deliberately
  * multi-action — they serve an eager driver reduce AND the final lazy plan
  * of the same query — so the kernel cannot unpersist them itself without
  * forcing a recompute. Instead each kernel `track`s what it persists and a
  * session-sharing harness (Verify/Bench/RunOne) calls [[releaseAll]]
  * between queries. Unlike `spark.catalog.clearCache()`, this never touches
  * caches the caller owns (e.g. the memoized derived views in Tables).
  */
object Caches {

  private val tracked = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist (MEMORY_AND_DISK by default via Dataset.persist) and register
    * for later release. Returns the same DataFrame.
    */
  def track(df: DataFrame): DataFrame = {
    tracked.add(df)
    df
  }

  /** Unpersist every tracked intermediate. BLOCKING since r9: the
    * harnesses call this between timed queries, and async unpersist left
    * the blocks of query N resident while query N+1 ran — on the 8 g
    * bench heap that read as diffuse ~0.5 s slowdowns on memory-heavy
    * neighbors. Block removal is reference dropping (no recompute), so
    * the synchronous wait is microseconds-to-ms per cache.
    */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(true)
      catch { case _: Throwable => () } // session may already be stopped
      df = tracked.poll()
    }
  }
}
