package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.DQManagerConfig

class DQManagerConfigSpec extends AnyFunSuite {

  test("constructible with defaults; missing .env file means no file settings") {
    val c = DQManagerConfig(envFile = "/nonexistent/.env")
    assert(c.fileSettings.isEmpty)
    assert(c.get("GRAFT_NO_SUCH_KEY").isEmpty)
    assert(c.getOrElse("GRAFT_NO_SUCH_KEY", "fallback") == "fallback")
  }

  test(".env parsing: comments/blank lines skipped, quotes stripped, env wins over file") {
    val f = java.io.File.createTempFile("graft", ".env")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("# comment line")
    w.println("")
    w.println("FROM_FILE=file_value")
    w.println("QUOTED=\"spaced value\"")
    w.println("SHARED=file_side")
    w.println("not a key value line")
    w.close()
    val c = DQManagerConfig(envFile = f.getPath, env = Map("SHARED" -> "env_side"))
    assert(c.get("FROM_FILE").contains("file_value"))
    assert(c.get("QUOTED").contains("spaced value"))
    assert(c.get("SHARED").contains("env_side")) // environment takes precedence
    assert(!c.fileSettings.contains("not a key value line"))
  }
}
