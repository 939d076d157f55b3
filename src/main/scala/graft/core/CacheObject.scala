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

  /** Persistence the reference DECLARES but leaves as `pass`
    * (`cache_obj.py:31-34`). Here the declared contract is honored for
    * ALL primitive/scalar values (String, Long, Int, Double, Boolean,
    * Float, Short, Byte, Char, BigDecimal, BigInt): `save` writes
    * type-tagged entries, `load` merges them back with their original
    * types. Non-scalar values (DataFrames, closures, collections) are
    * runtime state, not persistable configuration — skipped by design.
    * @return the number of entries SKIPPED as non-persistable, so a
    *         caller can detect (and log) silent drops instead of
    *         discovering them at load time. */
  def save(path: String): Int = {
    val p = new java.util.Properties()
    var skipped = 0
    m.foreach {
      case (k, v: String) => p.setProperty(k, "s:" + v)
      case (k, v: Long) => p.setProperty(k, "l:" + v)
      case (k, v: Int) => p.setProperty(k, "i:" + v)
      case (k, v: Double) => p.setProperty(k, "d:" + v)
      case (k, v: Boolean) => p.setProperty(k, "b:" + v)
      case (k, v: Float) => p.setProperty(k, "f:" + v)
      case (k, v: Short) => p.setProperty(k, "h:" + v)
      case (k, v: Byte) => p.setProperty(k, "y:" + v)
      case (k, v: Char) => p.setProperty(k, "c:" + v)
      case (k, v: BigDecimal) => p.setProperty(k, "m:" + v)
      case (k, v: BigInt) => p.setProperty(k, "g:" + v)
      case _ => skipped += 1 // runtime-only value: not persistable
    }
    val w = new java.io.FileWriter(path)
    try p.store(w, "graft cache") finally w.close()
    skipped
  }

  def load(path: String): Unit = {
    val p = new java.util.Properties()
    val r = new java.io.FileReader(path)
    try p.load(r) finally r.close()
    p.forEach { (k, v) =>
      val s = v.toString
      val value: Any = s.splitAt(2) match {
        case ("s:", rest) => rest
        case ("l:", rest) => rest.toLong
        case ("i:", rest) => rest.toInt
        case ("d:", rest) => rest.toDouble
        case ("b:", rest) => rest.toBoolean
        case ("f:", rest) => rest.toFloat
        case ("h:", rest) => rest.toShort
        case ("y:", rest) => rest.toByte
        case ("c:", rest) if rest.length == 1 => rest.charAt(0)
        case ("m:", rest) => BigDecimal(rest)
        case ("g:", rest) => BigInt(rest)
        case _ => s
      }
      m.update(k.toString, value)
    }
  }
}
