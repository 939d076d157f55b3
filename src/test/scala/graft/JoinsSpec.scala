package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {

  test("asofJoin: backward inclusive match, nulls when no earlier right row") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), // before any right row -> null
      (2L, "u1", 200L), // exactly at right ts 200 -> inclusive match 200
      (3L, "u1", 350L), // between 300 and 400 -> 300
      (4L, "u2", 500L), // other key -> its own timeline
      (5L, "u3", 999L)  // key with no right rows at all -> null
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u1", 200L, 2.0),
      ("u1", 300L, 3.0),
      ("u1", 400L, 4.0),
      ("u2", 450L, 45.0)
    ).toDF("k", "rts", "v")
    val got = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(3.0), 4L -> Some(45.0), 5L -> None))
  }

  test("asofJoin tieCol: right rows tying on (key, ts) resolve to the largest tie value, independent of partition order") {
    import spark.implicits._
    val left = Seq((1L, "u1", 200L)).toDF("id", "k", "ts")
    // two right rows at the same (key, ts); shuffle them across partitions
    // both ways to prove the winner is the tieCol max, not frame order
    val rightRows = Seq(("u1", 200L, 7.0), ("u1", 200L, 3.0))
    for (rows <- Seq(rightRows, rightRows.reverse)) {
      val right = rows.toDF("k", "rts", "v").repartition(4)
      val got = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
        tieCol = Some("v")).select("v").head().getDouble(0)
      assert(got === 7.0)
    }
  }

  test("asofJoin: matched right row's NULL values are preserved, never filled from an older row") {
    import spark.implicits._
    val left = Seq((1L, "u", 120L), (2L, "u", 60L)).toDF("id", "k", "ts")
    // nearest right row for id=1 is rts=100 with v=NULL, w="new"; DuckDB/
    // pandas ASOF takes THAT row's values verbatim — v must stay NULL and
    // w must not pair with the older row's v (no cross-row mixing)
    val right = Seq(
      ("u", 50L, Some(5.0), "old"),
      ("u", 100L, None, "new")
    ).toDF("k", "rts", "v", "w")
    val got = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v", "w"))
      .select("id", "v", "w").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), r.getString(2)))).toMap
    assert(got === Map(1L -> ((None, "new")), 2L -> ((Some(5.0), "old"))))
  }

  test("asofJoin tolerance freshness is judged on the matched row, not a stale carried value") {
    import spark.implicits._
    val left = Seq((1L, "u", 120L)).toDF("id", "k", "ts")
    // match is rts=100 (fresh, within 30); its NULL v must stay NULL rather
    // than resurrecting v=5.0 from rts=50 and calling it fresh
    val right = Seq(("u", 50L, Some(5.0)), ("u", 100L, None)).toDF("k", "rts", "v")
    val got = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
      tolerance = Some(30L)).select("v").head()
    assert(got.isNullAt(0))
  }

  test("asofJoin forward: nearest right ts at-or-after each left ts") {
    import spark.implicits._
    val left = Seq((1L, "u", 100L), (2L, "u", 300L), (3L, "u", 500L)).toDF("id", "k", "ts")
    val right = Seq(("u", 250L, 2.5), ("u", 300L, 3.0), ("u", 450L, 4.5)).toDF("k", "rts", "v")
    val got = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"), forward = true)
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> Some(2.5), 2L -> Some(3.0), 3L -> None))
  }

  test("asofJoin tolerance: stale matches are nulled, rows kept") {
    import spark.implicits._
    val left = Seq((1L, "u", 100L), (2L, "u", 1000L)).toDF("id", "k", "ts")
    val right = Seq(("u", 90L, 9.0)).toDF("k", "rts", "v")
    val got = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
      tolerance = Some(50L))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // id=1: 100-90=10 <= 50 -> match; id=2: 1000-90=910 -> stale -> null
    assert(got === Map(1L -> Some(9.0), 2L -> None))
  }

  test("asofJoin: null timestamps — null right ts matches nothing, null left ts gets nulls") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 300L)).toDF("id", "k", "ts")
      .union(Seq((3L, "u1")).toDF("id", "k").withColumn("ts", lit(null).cast("long")))
    val right = Seq(("u1", 50L, 5.0)).toDF("k", "rts", "v")
      .union(Seq(("u1", 99.0)).toDF("k", "v")
        .select(col("k"), lit(null).cast("long").as("rts"), col("v")))
    // output column order: keyCols ++ leftPayload ++ valueCols = (k, id, ts, v)
    val got = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    // 99.0 (null rts) must never surface; null left ts row gets null
    assert(got === Map(1L -> Some(5.0), 2L -> Some(5.0), 3L -> None))
  }

  test("asofJoin equals the naive per-row max-<=-ts lookup on real events") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("pv"))
    val got = Joins.asofJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts", Seq("pv"))
    // naive oracle: range join + argmax(p_ts) per left row
    val naive = clicks.join(purchases, Seq("user_id"), "left")
      .filter(col("p_ts").isNull || col("p_ts") <= col("ts"))
      .groupBy("event_id")
      .agg(max(struct(col("p_ts"), col("pv"))).getField("pv").as("pv_naive"))
    val joined = got.join(naive, Seq("event_id"), "full")
    val mismatches = joined.filter(
      !(col("pv") <=> col("pv_naive"))).count()
    assert(mismatches === 0)
    assert(got.count() === clicks.count()) // left semantics: no row lost/duplicated
  }

  test("rangeJoinBanded equals cross-join + between filter") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_extendedprice") / col("l_quantity")).as("up"))
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), (col("p_retailprice") * 0.95).as("lo"),
        (col("p_retailprice") * 1.05).as("hi"))
    val banded = Joins.rangeJoinBanded(li, part, "up", "lo", "hi", 10.0)
      .groupBy("p_partkey").count()
    val brute = li.crossJoin(part)
      .filter(col("up").between(col("lo"), col("hi")))
      .groupBy("p_partkey").count()
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
    assert(brute.count() > 0) // fixture actually exercises the operator
  }

  test("saltedJoin output equals plain equi-join") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Joins.saltedJoin(li, o, Seq("l_orderkey"), saltFactor = 8)
    val plain = li.join(o, Seq("l_orderkey"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bloomPreFilteredJoin equals plain join; prefilter sheds non-matching rows") {
    import spark.implicits._
    val small = (1 to 100).map(_.toLong).toDF("k")
    val big = (1 to 10000).map(i => (i.toLong, s"p$i")).toDF("k", "payload")
    val joined = Joins.bloomPreFilteredJoin(big, small, "k",
      expectedItems = 100L, numBits = 1600L)
    val plain = big.join(small, Seq("k"))
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    // the prefilter alone (before the exact join) keeps matches + a small
    // false-positive tail, a tiny fraction of the big side
    val bf = small.agg(graft.functions.bloom_filter_agg(
      xxhash64(col("k")), 100L, 1600L).as("bf")).head().getAs[Array[Byte]]("bf")
    val preCount = big.filter(graft.functions.bloom_might_contain(
      lit(bf), xxhash64(col("k")))).count()
    assert(preCount >= 100 && preCount < 1000, s"prefilter kept $preCount")
  }

  test("fuzzySelfJoin d=1: exact known pairs, no cross-length or d=2 matches") {
    import spark.implicits._
    val df = Seq("abcd", "abce", "abff", "abcd", "xyz", "abcde").toDF("s")
    val out = Joins.fuzzySelfJoin(df, "s", maxDist = 1).collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet ==
      Set(("abcd", "abce", 1))) // abff is d=2; abcde differs in length; dup abcd collapses
  }

  test("fuzzySelfJoin d=1 equals brute-force same-length levenshtein on part names") {
    // plant one-char corruptions: the fixture's distinct names differ by >= 2
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val names = part.select(col("p_name")).unionByName(
      part.filter(col("p_partkey") % 7 === 0)
        .select(concat(lit("x"), expr("substring(p_name, 2)")).as("p_name")))
    val blocked = Joins.fuzzySelfJoin(names, "p_name", maxDist = 1)
    val n = names.select(col("p_name").as("name")).filter(col("name").isNotNull).distinct()
    val brute = n.as("a").join(n.as("b"),
        col("a.name") < col("b.name") &&
          length(col("a.name")) === length(col("b.name")) &&
          levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).as("dist"))
    assert(brute.count() > 0)
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty)
  }
}
