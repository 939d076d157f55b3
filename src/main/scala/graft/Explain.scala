package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints `explain("formatted")` for the named
  * queries (all queries if no names given). Used to keep every operator's
  * physical plan honest — pushed filters, pruned schemas, broadcast joins,
  * whole-stage codegen spans.
  *
  * Usage: `sbt "runMain graft.Explain [sfDir] [query ...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
