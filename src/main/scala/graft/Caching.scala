package graft

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracked persists for reused query intermediates.
  *
  * Several query builders persist a frame that feeds two or more downstream
  * joins (the k-means assignment behind `dedup_semantic`, the SRP signature
  * table, the df-capped postings, the components edge list). The driver
  * harnesses drop those wholesale with `spark.catalog.clearCache()` between
  * queries, but an application embedding this library in a long-lived
  * session needs a targeted release that does not clobber its OWN caches:
  * every internal persist goes through [[persistTracked]], and
  * [[releaseAll]] unpersists exactly those — nothing else.
  *
  * Contract: a query's returned DataFrame must be materialized before
  * [[releaseAll]] is called (releasing earlier is safe but forfeits the
  * reuse the persist exists for). `CacheHygieneSpec` pins that a
  * materialize-then-release round leaves zero cached RDDs behind.
  */
object Caching {
  private val tracked = mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and remember it for [[releaseAll]]. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every tracked frame and forget it. Blocking, so storage is
    * verifiably empty on return; idempotent, and a frame already released
    * by `clearCache()` unpersists as a no-op. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { df =>
      try df.unpersist(blocking = true)
      catch { case _: Throwable => () }
    }
    tracked.clear()
  }
}
