package graft.core

import org.apache.spark.sql.DataFrame

/** Session-conf-driven lineage truncation for iterative operators
  * (connected components, PageRank, k-core peeling, skyline frontiers,
  * pair-pipeline hand-offs). Every iteration must cut its lineage or the
  * plan grows with rounds; HOW it cuts is a deployment decision:
  *
  *  - `spark.graft.checkpointDir` UNSET (default): `localCheckpoint` —
  *    executor-local block storage, no distributed filesystem needed.
  *    Right for local mode and interactive work, but blocks die with
  *    their executor, so a lost executor mid-iteration fails the job on
  *    a real cluster.
  *  - `spark.graft.checkpointDir=<dir>`: RELIABLE `checkpoint` into that
  *    directory (HDFS/object store on a cluster) — recomputable after
  *    executor loss, the shape a 1000-executor run needs. One conf flips
  *    every iterative operator at once; no code changes.
  *
  * Both variants are EAGER (materialize now), which the call sites rely
  * on to unpersist upstream caches immediately after. */
object Checkpoints {

  final val ConfKey = "spark.graft.checkpointDir"

  // last conf value applied per application: setCheckpointDir mints a
  // fresh unique subdirectory every call, so only re-apply on change
  // (getCheckpointDir returns the QUALIFIED subdir, never equal to the
  // raw conf value — it can't serve as the change detector)
  private val applied = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (applied.put(sc.applicationId, dir) != dir || sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
