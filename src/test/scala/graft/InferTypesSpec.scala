package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiler

class InferTypesSpec extends SparkSpec {

  test("inferTypes classifies clean columns and demotes mixed ones to string") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("1", "1.5", "true", "2024-01-02", "2024-01-02 03:04:05", "abc", "7"),
      ("-42", "-0.25", "FALSE", "1999-12-31", "2024-01-02T03:04:05.123", "1", "x"),
      ("007", ".5", "false", "2024-02-29", "2024-06-01 00:00:00", "", "9")
    ).toDF("c_int", "c_dec", "c_bool", "c_date", "c_ts", "c_mixed", "c_mostly")
    val out = Profiler.inferTypes(df,
        Seq("c_int", "c_dec", "c_bool", "c_date", "c_ts", "c_mixed", "c_mostly"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("inferred")).toMap
    assert(out("c_int") == "int")
    assert(out("c_dec") == "decimal")
    assert(out("c_bool") == "bool")
    assert(out("c_date") == "date")
    assert(out("c_ts") == "timestamp")
    assert(out("c_mixed") == "string")   // 'abc' + '1' + empty: 1/2 informative ints
    assert(out("c_mostly") == "string")  // 2/3 ints < 0.95
  }

  test("inferTypes: int+decimal mix infers decimal; empties don't dilute") {
    val s = spark
    import s.implicits._
    val df = Seq("1", "2.5", "3", "", "").toDF("c")
    val r = Profiler.inferTypes(df, Seq("c")).collect().head
    assert(r.getAs[String]("inferred") == "decimal")
    assert(r.getAs[Long]("n_empty") == 2L && r.getAs[Long]("n") == 5L)
    // lower ratio: a 2/3-int column becomes int at minRatio 0.5
    val loose = Profiler.inferTypes(Seq("1", "2", "zz").toDF("c"), Seq("c"), minRatio = 0.5)
      .collect().head
    assert(loose.getAs[String]("inferred") == "int")
  }
}
