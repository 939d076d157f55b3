package graft.core

import scala.collection.concurrent.TrieMap

/** Small threadsafe KV cache shared between a manager and its checks.
  *
  * The reference's `CacheObject` (`core/cache_obj.py:18-40`) is a
  * process-wide `@singleton`, which leaks `"df_count"` across managers when
  * two datasets are checked in one process (SURVEY.md bug B7). Deviation D3:
  * this cache is **per-manager** — each [[graft.DQManager]] constructs its
  * own.
  *
  * Also fixes the reference's `get(key, default)` ordering bug (type check
  * before the None→default fallback, `cache_obj.py:25-29`): here a missing
  * key always yields the default.
  */
final class CacheObject {
  private val m = TrieMap.empty[String, Any]
  def set(key: String, value: Any): Unit = m.update(key, value)
  def get(key: String): Option[Any] = m.get(key)
  def getOrElseUpdate(key: String, value: => Any): Any = m.getOrElseUpdate(key, value)
  def getAs[T](key: String): Option[T] = m.get(key).map(_.asInstanceOf[T])
  def remove(key: String): Unit = m.remove(key)
  def clear(): Unit = m.clear()
  def keys: Set[String] = m.keySet.toSet
}
