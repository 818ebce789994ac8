package graft

import org.apache.spark.sql.DataFrame

/** Tracks DataFrames cached inside operators (the Traverse.expand edge
  * cache, the Dedup shingle-set caches) so long-lived sessions can release
  * them once the lazy results that reference them have been materialized —
  * otherwise repeated catalog runs accumulate cached blocks until executor
  * storage evicts them.
  *
  * Spark's cache manager dedupes by logical plan, so registering the same
  * plan twice costs nothing extra; `releaseAll()` after a query's action is
  * the session-hygiene hook (Bench and Verify call it between catalog
  * entries). Unpersisting before materialization is safe — the plan just
  * recomputes from source.
  */
object CacheRegistry {
  private val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()

  def register(df: DataFrame): DataFrame = synchronized { cached += df; df }

  /** Number of registrations since the last releaseAll — a structural
    * probe for specs (e.g. how many per-level caches a traversal planted).
    */
  def size: Int = synchronized(cached.size)

  def releaseAll(): Unit = synchronized {
    cached.foreach(df => try df.unpersist() catch { case _: Exception => () })
    cached.clear()
  }
}
