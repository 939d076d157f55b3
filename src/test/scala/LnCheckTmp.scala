// temporary diagnostic — not part of the repo build
import org.apache.spark.sql.functions._
object LnCheckMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]").getOrCreate()
    spark.range(1, 200001).toDF("nval")
      .select(col("nval"), graft.functions.DetMath.lnPosInt(col("nval")).as("lnv"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/lncheck/spark")
    spark.stop()
  }
}
