package graft.plans

import java.util.WeakHashMap

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Session-scoped build-once cache — THE device behind every
  * build-once-serve-many materialization in the engine (co-purchase
  * graph, corpus verdict table, BPE merges, LM/DSIR/perceptron
  * models, IVF codebook). One definition so the eight sites cannot
  * drift on lifecycle semantics (ADVICE r15):
  *
  *   - '''No session pinning.''' Entries hang off a [[WeakHashMap]]
  *     keyed by the [[SparkSession]] itself, so a stopped/collected
  *     session releases its cached frames and models instead of
  *     living for the process lifetime (the old per-object
  *     `TrieMap[(SparkSession, String), V]` pinned both forever).
  *   - '''Compute-once.''' The value slot is a lazy thunk inserted
  *     under the map lock and forced OUTSIDE it: concurrent first
  *     users race to insert, exactly one thunk wins the slot, and
  *     Scala's lazy-val initialization lock makes the expensive build
  *     run once — `TrieMap.getOrElseUpdate` could evaluate the build
  *     twice under concurrent first use, materializing the most
  *     expensive chain in the engine redundantly.
  *
  * Forcing outside the lock keeps one session's multi-second build
  * from serializing every other session's cache hits; two concurrent
  * first users of the SAME key block on the same lazy thunk, which is
  * the point.
  *
  * STALENESS CONTRACT (unchanged from the per-site caches): an entry
  * reflects the data dir AS OF first use in the session. Data dirs
  * are immutable snapshots, so within a session a dir denotes one
  * dataset version; in-place rewriters call the owning module's
  * `clear*Cache()` first.
  */
private[graft] final class SessionCache[V] {

  private val bySession =
    new WeakHashMap[SparkSession, mutable.Map[String, () => V]]()

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V = {
    val thunk = bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) { m = mutable.Map.empty; bySession.put(s, m) }
      m.getOrElseUpdate(key, { lazy val v = build; () => v })
    }
    thunk()
  }

  def clear(): Unit = bySession.synchronized(bySession.clear())
}
