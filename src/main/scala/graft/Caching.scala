package graft

import java.lang.ref.WeakReference

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
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
  * Ownership is arranged so the registry never pins an abandoned session:
  * the strong buffer of tracked frames lives in a no-op
  * [[QueryExecutionListener]] registered ON the owning session, so the only
  * strong path to the buffer runs through the session's own object graph
  * (session → listener manager → holder → frames → session — a cycle
  * contained entirely within the session). The global map holds the session
  * WEAKLY as key and only a [[WeakReference]] to the holder as value, so it
  * contributes no strong edge at all: abandon the session and the whole
  * cycle is collectable as a unit (a plain strong-value WeakHashMap would
  * pin the key forever here, because a Dataset strongly references its
  * session). While the session is alive the holder is reachable through it,
  * so [[releaseAll]] is reliable — nothing tracked can be lost to GC before
  * release. Within a live session the buffer self-compacts on each new
  * persist by dropping frames whose storage level has already reverted to
  * NONE (e.g. via `clearCache()`), so it is bounded by the number of frames
  * actually still cached.
  *
  * One session's `releaseAll()` cannot unpersist another concurrent
  * session's in-flight intermediates — isolation is per session key.
  *
  * Contract: a query's returned DataFrame must be materialized before
  * [[releaseAll]] is called (releasing earlier is safe but forfeits the
  * reuse the persist exists for). `CacheHygieneSpec` pins that a
  * materialize-then-release round leaves zero cached RDDs behind.
  */
object Caching {

  /** Per-session strong buffer of tracked frames, disguised as a no-op
    * query listener so the SESSION holds it (see object doc). */
  private final class Holder extends QueryExecutionListener {
    val frames: mutable.ArrayBuffer[DataFrame] = mutable.ArrayBuffer.empty
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = ()
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  private val tracked =
    mutable.WeakHashMap.empty[SparkSession, WeakReference[Holder]]

  /** The session's holder, registering a fresh one on first use. The weak
    * value can only be empty if the session itself was collectable — and
    * then the map's weak KEY prevents this lookup — so re-registration
    * cannot duplicate a live holder. */
  private def holderFor(session: SparkSession): Holder =
    tracked.get(session).flatMap(r => Option(r.get)) match {
      case Some(h) => h
      case None =>
        val h = new Holder
        session.listenerManager.register(h)
        tracked(session) = new WeakReference(h)
        h
    }

  /** Persist `df` at MEMORY_AND_DISK and remember it for [[releaseAll]]
    * under its own session. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = synchronized {
    val buf = holderFor(df.sparkSession).frames
    buf.filterInPlace(f =>
      try f.storageLevel != StorageLevel.NONE catch { case _: Throwable => false })
    buf += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every frame tracked for `session` and forget it. Blocking,
    * so storage is verifiably empty on return; idempotent, and a frame
    * already released by `clearCache()` unpersists as a no-op. The holder
    * stays registered (it is tiny when empty) so repeated persist/release
    * rounds reuse it instead of stacking listeners. */
  def releaseAll(session: SparkSession): Unit = synchronized {
    tracked.get(session).flatMap(r => Option(r.get)).foreach { h =>
      h.frames.foreach { df =>
        try df.unpersist(blocking = true)
        catch { case _: Throwable => () }
      }
      h.frames.clear()
    }
  }

  /** [[releaseAll]] for the calling thread's active session, falling back
    * to the process default session; a no-op when neither exists. */
  def releaseAll(): Unit =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(releaseAll)
}
