package graft.checks

import org.scalatest.funsuite.AnyFunSuite
import graft.core.CacheObject

/** `CacheObject.save/load` — the one API the reference declares but
  * implements as `pass` (`cache_obj.py:31-34`); here the declared
  * contract round-trips primitives with their types. */
class CacheObjectSpec extends AnyFunSuite {

  test("save/load round-trips primitive values with their original types") {
    val c = new CacheObject
    c.set("name", "lineitem")
    c.set("df_count", 60000L)
    c.set("threshold", 0.95)
    c.set("retries", 3)
    c.set("strict", true)
    c.set("runtime_only", new Object) // must be skipped, not crash
    val path = java.nio.file.Files.createTempFile("graft_cache", ".properties").toString
    c.save(path)

    val c2 = new CacheObject
    c2.set("pre_existing", "kept") // load merges, it does not clear
    c2.load(path)
    assert(c2.getAs[String]("name").contains("lineitem"))
    assert(c2.getAs[Long]("df_count").contains(60000L))
    assert(c2.getAs[Double]("threshold").contains(0.95))
    assert(c2.getAs[Int]("retries").contains(3))
    assert(c2.getAs[Boolean]("strict").contains(true))
    assert(c2.getAs[String]("pre_existing").contains("kept"))
    assert(c2.get("runtime_only").isEmpty)
  }
}
