package graft.api

/** App-layer LRU result cache with TTL — the reference's prescribed
  * "cache identical queries for 5-10 minutes"
  * (`/root/reference/02_method2_manual_vector_embedding.sql:415-417`,
  * `:435`). Keys are normalized request strings; values are materialized
  * response payloads (never DataFrames — plans are cheap, results are what
  * the SLO pays for). Thread-safe; `clock` injectable for tests.
  */
final class ResultCache[V](maxEntries: Int = 1024,
                           ttlMillis: Long = 10 * 60 * 1000L,
                           clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(value: V, at: Long)

  private val map = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
      size() > maxEntries
  }

  private var hitCount = 0L
  private var missCount = 0L

  def getOrCompute(key: String)(compute: => V): V = synchronized {
    val now = clock()
    val hit = map.get(key)
    if (hit != null && now - hit.at <= ttlMillis) {
      hitCount += 1
      hit.value
    } else {
      missCount += 1
      val v = compute
      map.put(key, Entry(v, now))
      v
    }
  }

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def size: Int = synchronized(map.size())
}

/** Cache-fronted Method-1 search endpoint: identical request JSON within the
  * TTL returns the memoized stringified response without running a job.
  */
final class CachedSearch(search: SemanticSearch,
                         cache: ResultCache[String] = new ResultCache[String]()) {
  def searchResponseJson(requestJson: String): String =
    cache.getOrCompute(requestJson.trim)(search.searchResponseJson(requestJson))
}
