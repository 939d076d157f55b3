package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Specs for the training-data-pipeline extensions: vector kernels, hashing,
  * text analysis, dedup, similarity search. */
class ExtensionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine kernel matches the HOF formulation and SQL registration works") {
    val s = spark
    import s.implicits._
    val df = embs.limit(50).select(col("vec_id"), col("embedding"))
    val a = df.as("a"); val b = df.as("b")
    val pairs = a.crossJoin(b)
      .select(
        cosine_sim(col("a.embedding"), col("b.embedding")).as("fast"),
        cosine_sim_hof(col("a.embedding"), col("b.embedding")).as("hof"))
      .select(max(abs(col("fast") - col("hof"))).as("maxdiff"))
      .head().getDouble(0)
    assert(pairs < 1e-12, s"kernel vs HOF diff $pairs")

    df.createOrReplaceTempView("emb_test")
    val viaSql = spark.sql(
      "SELECT max(cosine_sim(a.embedding, b.embedding)) FROM emb_test a, emb_test b WHERE a.vec_id < b.vec_id")
      .head().getDouble(0)
    assert(viaSql <= 1.0 + 1e-9 && viaSql > -1.0)
  }

  test("minhash estimates jaccard; simhash hamming small for near-identical docs") {
    val s = spark
    import s.implicits._
    val t1 = "a b c d e f g h i j k l m n o p"
    val t2 = "a b c d e f g h i j k l m n o q" // 1 token differs
    val df = Seq((1L, t1), (2L, t2)).toDF("id", "text")
    val sig = df.select(col("id"),
      minhash_signature(TextAnalysis.tokens(col("text")), 256, 1L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val est = sig(1L).zip(sig(2L)).count { case (x, y) => x == y }.toDouble / 256
    // true token-set jaccard = 15/17 ≈ 0.882
    assert(math.abs(est - 15.0 / 17.0) < 0.12, s"minhash estimate $est")

    val hm = Dedup.simHashPairs(df, "id", "text", maxHamming = 20)
    assert(hm.count() == 1) // near-identical docs collide in some band
  }

  test("minhash-LSH finds exactly the brute-force near-dup pairs (planted)") {
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 128, bands = 64, threshold = 0.5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
  }

  test("exact dedup groups by normalized fingerprint") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "different")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "doc_id", "text")
    assert(g.count() == 2)
    assert(g.filter(col("dup_count") === 2).select("keep_id").head().getLong(0) == 1L)
    assert(Dedup.exactDedup(df, "text").count() == 2)
  }

  test("embedding LSH near-dup pairs ⊆ brute force, decent recall") {
    val brute = Dedup.embeddingNearDupBrute(embs, "vec_id", "embedding", 0.45)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", dim = 64, threshold = 0.45)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh.subsetOf(brute))
    assert(lsh.size.toDouble / brute.size > 0.5, s"LSH recall ${lsh.size}/${brute.size}")
  }

  test("brute-force top-k: k rows per query, correctly ranked; LSH recall > 0") {
    val queries = embs.filter(col("vec_id") < 5)
    val topk = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 3)
    val rows = topk.collect()
    assert(rows.length == 15)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(sims.sameElements(sims.sortBy(-(_: Double))))
    }
    val lsh = Similarity.lshTopK(embs, queries, "vec_id", "embedding", 3, dim = 64)
    assert(lsh.count() > 0)
  }

  test("SQL registration covers every native function incl. literal args") {
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "text").createOrReplaceTempView("sqlreg_test")
    val row = spark.sql(
      """SELECT
        |  size(shingle_hashes(split(text, ' '), 2)) AS n_sh,
        |  size(minhash_signature(split(text, ' '), 16)) AS n_mh,
        |  size(winnow_fingerprints(text, 5, 3)) AS n_wf,
        |  size(cdc_boundaries(text, 4, 1)) AS n_cdc,
        |  sorted_intersection_count(shingle_hashes(split(text, ' ')),
        |                            shingle_hashes(split(text, ' '))) AS self_inter,
        |  simhash64(split(text, ' ')) AS sh
        |FROM sqlreg_test""".stripMargin).head()
    assert(row.getAs[Int]("n_sh") === 5)   // 6 tokens -> 5 bigrams
    assert(row.getAs[Int]("n_mh") === 16)
    assert(row.getAs[Int]("n_wf") > 0)
    // d=1 cuts after every full window: len - w + 1 = 35 - 4 + 1
    assert(row.getAs[Int]("n_cdc") === 32)
    assert(row.getAs[Long]("self_inter") === 4L) // 4 distinct trigram hashes
    assert(row.getAs[Long]("sh") !== 0L)
  }

  test("jaro / jaro-winkler: classic Winkler pairs, boost threshold, SQL surface") {
    import spark.implicits._
    val pairs = Seq(
      ("MARTHA", "MARHTA", 0.944444, 0.961111),
      ("DIXON", "DICKSONX", 0.766667, 0.813333),
      ("DWAYNE", "DUANE", 0.822222, 0.84),
      ("JELLYFISH", "SMELLYFISH", 0.896296, 0.896296), // no common prefix -> no boost
      ("abcdefgh", "abzzzzzz", 0.5, 0.5),              // jaro <= 0.7 -> boost gated off
      ("abc", "abc", 1.0, 1.0),
      ("", "abc", 0.0, 0.0),
      ("ab", "ba", 0.0, 0.0)                           // window 0 -> no matches
    ).toDF("a", "b", "want_jaro", "want_jw")
    val got = pairs.select(col("a"), col("b"), col("want_jaro"), col("want_jw"),
      round(graft.functions.jaro_sim(col("a"), col("b")), 6).as("jaro"),
      round(graft.functions.jaro_winkler(col("a"), col("b")), 6).as("jw")).collect()
    got.foreach { r =>
      assert(r.getDouble(4) === r.getDouble(2), s"jaro(${r.getString(0)}, ${r.getString(1)})")
      assert(r.getDouble(5) === r.getDouble(3), s"jw(${r.getString(0)}, ${r.getString(1)})")
    }
    // SQL registration
    val sql = spark.sql("SELECT round(jaro_winkler('MARTHA', 'MARHTA'), 6)").head().getDouble(0)
    assert(sql === 0.961111)
    // null propagation
    assert(pairs.select(graft.functions.jaro_winkler(lit(null).cast("string"), col("b")))
      .head().isNullAt(0))
  }

  test("text analysis: tokens, ngrams, lang-id, quality, fingerprints") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat is on the mat and it is flat"),
      (2L, "el gato que se sienta en la alfombra y los perros"),
      (3L, "der hund ist nicht mit das ein und"),
      (4L, "x")).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.winnowingFingerprints(col("text")).as("wf"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n") == 10)
    assert(out(1L).getAs[String]("lang") == "en")
    assert(out(2L).getAs[String]("lang") == "es")
    assert(out(3L).getAs[String]("lang") == "de")
    val q1 = out(1L).getAs[Double]("q")
    assert(q1 > 0.5 && q1 <= 1.0)
    assert(out(4L).getAs[Double]("q") < q1) // one-char junk scores lower
    assert(out(1L).getAs[String]("fp").length == 32)
    assert(out(1L).getSeq[Long](5).nonEmpty)

    val ng = df.filter(col("id") === 1)
      .select(TextAnalysis.wordNgrams(col("text"), 3).as("g")).head().getSeq[String](0)
    assert(ng.head == "the cat is" && ng.length == 8)
  }

  test("parser extension: SHOW GRAFT CHECKS returns the check catalog; normal SQL delegates") {
    val rows = spark.sql("SHOW GRAFT CHECKS").collect()
    assert(rows.length === graft.plans.GraftSqlParser.catalog.length)
    val names = rows.map(_.getString(0)).toSet
    assert(names.contains("completeness_col_ratio") && names.contains("rule")
      && names.contains("drift_ks"))
    assert(rows.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
    // case-insensitive, trailing semicolon tolerated
    assert(spark.sql("show graft checks;").count() === rows.length.toLong)
    // everything else still parses through the stock grammar
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
  }
}
