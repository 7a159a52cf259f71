package graft.api

import org.apache.spark.sql.DataFrame

/** Tracks DataFrames persisted while BUILDING a lazy plan so the caller
  * can release them after the consuming action.
  *
  * Several pair-finding plans (MinHash / SimHash / NgramJaccard
  * near-dup, enrichment) persist an intermediate that multiple join
  * sides reference — without it Spark recomputes the subplan per
  * reference. Because the builder returns a LAZY DataFrame, it cannot
  * unpersist itself (the cache must live until the caller's action
  * runs). Persisting into a scope gives that lifetime a owner:
  *
  * {{{
  * val scope = new CacheScope
  * val pairs = MinHash.nearDupPairs(docs, "id", "text", scope = scope)
  * pairs.write.parquet(out)   // the consuming action
  * scope.release()            // frees the pinned shingle sets
  * }}}
  *
  * Callers that skip the argument share [[CacheScope.global]]; one-shot
  * drivers (Bench/Verify/Profile) release it after every query, so
  * nothing accumulates across a long session.
  */
final class CacheScope {
  private val dfs = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist `df` and register it for later [[release]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    dfs += p
    p
  }

  /** [[persist]] at an explicit storage level — for the rare CORPUS-
    * sized pin (e.g. q_novelty's distinct postings), where the default
    * deserialized MEMORY_AND_DISK would hold row objects across the
    * whole heap; serialized blocks keep the footprint bounded and
    * spill gracefully (guide §5).
    */
  def persist(df: DataFrame, level: org.apache.spark.storage.StorageLevel): DataFrame =
    synchronized {
      val p = df.persist(level)
      dfs += p
      p
    }

  /** Unpersist everything registered since the last release. */
  def release(blocking: Boolean = false): Unit = synchronized {
    dfs.foreach(_.unpersist(blocking))
    dfs.clear()
  }
}

object CacheScope {
  /** Default scope for callers that don't manage cache lifetime. */
  val global = new CacheScope
}
