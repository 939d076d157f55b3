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
    c.set("ratio_f", 0.5f)
    c.set("small_h", 7.toShort)
    c.set("tiny_y", 3.toByte)
    c.set("grade_c", 'A')
    c.set("money_m", BigDecimal("12345.67"))
    c.set("huge_g", BigInt("123456789012345678901234567890"))
    c.set("runtime_only", new Object) // must be skipped, not crash
    val path = java.nio.file.Files.createTempFile("graft_cache", ".properties").toString
    val skipped = c.save(path)
    assert(skipped === 1) // exactly the runtime-only Object was dropped

    val c2 = new CacheObject
    c2.set("pre_existing", "kept") // load merges, it does not clear
    c2.load(path)
    assert(c2.getAs[String]("name").contains("lineitem"))
    assert(c2.getAs[Long]("df_count").contains(60000L))
    assert(c2.getAs[Double]("threshold").contains(0.95))
    assert(c2.getAs[Int]("retries").contains(3))
    assert(c2.getAs[Boolean]("strict").contains(true))
    assert(c2.getAs[Float]("ratio_f").contains(0.5f))
    assert(c2.getAs[Short]("small_h").contains(7.toShort))
    assert(c2.getAs[Byte]("tiny_y").contains(3.toByte))
    assert(c2.getAs[Char]("grade_c").contains('A'))
    assert(c2.getAs[BigDecimal]("money_m").contains(BigDecimal("12345.67")))
    assert(c2.getAs[BigInt]("huge_g").contains(BigInt("123456789012345678901234567890")))
    assert(c2.getAs[String]("pre_existing").contains("kept"))
    assert(c2.get("runtime_only").isEmpty)
  }

  test("HllAlgebra.mergeInto fails fast on register-width (p) mismatch") {
    val a = new Array[Byte](1 << 10)
    val b = new Array[Byte](1 << 12)
    intercept[IllegalArgumentException] {
      graft.functions.HllAlgebra.mergeInto(a, b)
    }
  }
}
