package graft.core

/** Environment-backed settings object — parity stub for the reference's
  * `DQManagerConfig` (`core/config.py:5-6`: a `pydantic_settings.BaseSettings`
  * subclass configured to read a `.env` file, declaring ZERO keys of its
  * own). The Scala twin mirrors that surface: construction loads
  * `key=value` pairs from an optional `.env` file (UTF-8, `#` comments and
  * blank lines ignored, no interpolation) with real environment variables
  * taking precedence — the standard dotenv layering — and exposes them via
  * [[get]]. Since the reference declares no fields, there are no typed
  * accessors to mirror; downstream code (and reference ports calling
  * `DQManagerConfig()`) get a constructible symbol with dotenv semantics
  * rather than a missing type. */
final case class DQManagerConfig(
    envFile: String = ".env",
    /** injectable for tests; defaults to the process environment */
    env: Map[String, String] = sys.env) {

  /** Settings from the `.env` file (if it exists), lowest precedence. */
  val fileSettings: Map[String, String] = {
    val f = new java.io.File(envFile)
    if (!f.isFile) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
        .map { l =>
          val i = l.indexOf('=')
          l.take(i).trim -> l.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
        }
        .toMap
      finally src.close()
    }
  }

  /** Real environment first, then the `.env` file — pydantic-settings'
    * documented precedence order. */
  def get(key: String): Option[String] =
    env.get(key).orElse(fileSettings.get(key))

  def getOrElse(key: String, default: String): String =
    get(key).getOrElse(default)
}
