package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped keyed cache of [[Materialize]]d DataFrames, shared by
  * operator families whose declared queries consume an identical expensive
  * build (GraphOps' basket/edge tables, DedupOps' df-capped shingle
  * survivors).
  *
  * NOT ConcurrentHashMap.computeIfAbsent: a builder may itself consult the
  * same cache under a different key (GraphOps' edges builder reads the
  * shared baskets), and a nested computeIfAbsent on one map throws
  * IllegalStateException("Recursive update") whenever the two keys land in
  * the same bin — hash-dependent, so it surfaces flakily. Plain
  * get/putIfAbsent never holds a bin lock across a build; a racing
  * duplicate build is benign (deterministic content, first-put wins).
  *
  * Every instance registers itself so [[SessionCache.clearAll]] can drop
  * the WHOLE session state in one call: a cached entry is backed by
  * `localCheckpoint` blocks, and if those blocks are evicted mid-session
  * (executor memory pressure, GC of the backing RDD) the frame is
  * unrecoverable by recomputation — every consumer fails together. Retry
  * harnesses (Verify's second attempt) must clear before retrying, and
  * clearing ALL registered caches means the next cache added to the
  * codebase is covered automatically instead of depending on the harness
  * remembering a new clear call. Long multi-dataset harnesses (ScaleSpot's
  * 10×/100× loop) also clear between datasets so finished checkpoint
  * blocks are released instead of staying pinned by the map.
  */
final class SessionCache[K] {
  private val map = new java.util.concurrent.ConcurrentHashMap[K, DataFrame]()
  SessionCache.register(() => map.clear())

  /** Cached lookup; `build` runs at most once per key per session, modulo
    * a benign first-put-wins race. The builder is responsible for
    * [[Materialize]]-ing what it returns (some builders checkpoint
    * intermediate stages too, so the cache does not double-checkpoint). */
  def getOrBuild(key: K)(build: => DataFrame): DataFrame = {
    val cur = map.get(key)
    if (cur != null) cur
    else {
      val built = build
      val prev = map.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  def clear(): Unit = map.clear()
}

/** [[SessionCache]] for NON-DataFrame session artifacts — the driver-held
  * trained models (k-means centroid arrays, PQ codebooks) that several
  * declared queries re-derive identically from the same parquet input
  * (round 15). Same contract: deterministic content, get/putIfAbsent (no
  * bin lock across a nested build), registered for [[SessionCache.clearAll]]
  * so retry harnesses and multi-dataset loops drop it with everything else. */
final class SessionValueCache[K, V <: AnyRef] {
  private val map = new java.util.concurrent.ConcurrentHashMap[K, V]()
  SessionCache.register(() => map.clear())

  def getOrBuild(key: K)(build: => V): V = {
    val cur = map.get(key)
    if (cur != null) cur
    else {
      val built = build
      val prev = map.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  def clear(): Unit = map.clear()
}

object SessionCache {
  private val all =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  private[operators] def register(clear: () => Unit): Unit = all.add(clear)

  /** Drop every entry of every registered cache (see class doc). */
  def clearAll(): Unit = all.forEach(_.apply())
}
