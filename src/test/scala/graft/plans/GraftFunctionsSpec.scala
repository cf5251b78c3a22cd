package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraftFunctionsSpec extends AnyFunSuite with SparkTestBase {

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(
      ("the quick brown fox and the lazy dog", 1L),
      ("der hund und die katze", 2L)
    ).toDF("text", "id").createOrReplaceTempView("docs_sql")

    val row = spark.sql(
      """SELECT id,
         token_count(text) AS n,
         lang_id(text) AS lang,
         quality_score(text) AS q,
         doc_fingerprint(text) AS fp,
         simhash64(split(text, ' ')) AS sh,
         count_in_set(split(text, ' '), array('the', 'und')) AS hits,
         crc32_partition(cast(text AS binary), 8) AS part,
         size(minhash_shingle_signature(split(text, ' '), 3, 16)) AS sig_len
         FROM docs_sql ORDER BY id""").collect()

    assert(row(0).getAs[Long]("n") == 8L)
    assert(row(0).getAs[String]("lang") == "en")
    assert(row(1).getAs[String]("lang") == "de")
    assert(row(0).getAs[Int]("hits") == 2)
    assert(row(1).getAs[Int]("hits") == 1)
    assert(row(0).getAs[Int]("sig_len") == 16)
    val p = row(0).getAs[Int]("part")
    assert(p >= 0 && p < 8)
  }

  test("round-5 SQL registrations: shingles, entropy, repetition, partitioners") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a b c a b c a b c", 1L), ("x y z w v u t", 2L))
      .toDF("text", "id").createOrReplaceTempView("docs_sql5")
    val rows = spark.sql(
      """SELECT id,
         size(shingle_hashes(split(text, ' '), 3)) AS nsh,
         size(positional_shingle_hashes(split(text, ' '), 3)) AS nps,
         char_entropy(text).entropy AS ent,
         repetition_ratio(text, 3) AS rep,
         murmur_partition(cast(text AS binary), 8) AS mp,
         md5_partition(cast(text AS binary), 8) AS dp
         FROM docs_sql5 ORDER BY id""").collect()
    // doc 1: 9 tokens, 7 windows, 3 distinct shingles -> repetition 4/7
    assert(rows(0).getAs[Int]("nsh") == 3)
    assert(rows(0).getAs[Int]("nps") == 7)
    assert(math.abs(rows(0).getAs[Double]("rep") - 4.0 / 7.0) < 1e-12)
    // doc 2: all shingles distinct -> zero repetition
    assert(rows(1).getAs[Int]("nsh") == 5 && rows(1).getAs[Double]("rep") == 0.0)
    assert(rows(1).getAs[Double]("ent") > 0.0)
    Seq("mp", "dp").foreach { c0 =>
      val p = rows(0).getAs[Int](c0); assert(p >= 0 && p < 8, c0)
    }
  }

  test("cosine/jaccard SQL functions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0, 0.0), array(1.0, 0.0)) AS c,
         jaccard_similarity(array('a','b'), array('b','c')) AS j,
         hamming64(7, 0) AS h""").collect().head
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("j") - (1.0 / 3.0)) < 1e-12)
    assert(r.getAs[Int]("h") == 3)
  }

  test("vector + avro SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val schema = """{"type":"record","name":"P","fields":[{"name":"a","type":"long"}]}"""
    val payload = graft.functions.WireCodecs.avroEncode(schema, Long.box(9L))
    import spark.implicits._
    Seq(payload).toDF("p").createOrReplaceTempView("avro_sql")
    val r = spark.sql(
      s"""SELECT vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d,
          l2_sq(array(0.0, 3.0), array(4.0, 0.0)) AS l2,
          hyperplane_sketch(array(1.0, -2.0, 0.5), 8) AS hs,
          avro_decode(p, '$schema').a AS a
          FROM avro_sql""").collect().head
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("l2") == 25.0)
    val hs = r.getAs[Long]("hs")
    assert(hs >= 0L && hs < 256L)
    assert(r.getAs[Long]("a") == 9L)
  }

  test("non-literal k rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("k must be"))
  }

  test("shingleHashes is bijective with the distinct shingle-string set") {
    import graft.functions.HashFunctions
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"), (2L, "a"), (3L, ""), (4L, "x y"),
      (5L, "a b c d e f g"), (6L, "c a b c a b")).toDF("id", "text")
    // per-doc distinct counts agree with the string form
    val both = docs.select(col("id"),
      size(HashFunctions.shingleHashes(col("text"), 3)).as("nh"),
      size(HashFunctions.wordShingles(col("text"), 3)).as("ns")).collect()
    both.foreach(r => assert(r.getInt(1) == r.getInt(2), s"doc ${r.getLong(0)}"))
    // cross-doc matching: docs share a hash iff they share a shingle string
    def pairs(c: org.apache.spark.sql.Column) = {
      val sh = docs.select(col("id"), explode(c).as("s"))
      sh.as("a").join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(pairs(HashFunctions.shingleHashes(col("text"), 3)) ==
      pairs(HashFunctions.wordShingles(col("text"), 3)))
  }

  test("scriptProfile: range-based per-script counts, boundary codepoints, mixed text") {
    import spark.implicits._
    val rows = Seq(
      (1L, "Hello мир 你好 سلام"),       // mixed: 5 latin, 3 cyr, 2 cjk, 4 arabic
      (2L, "café"),                      // é (U+00E9) counts latin by range
      (3L, "×÷"),              // × ÷ inside the latin RANGE — counted
                                         // (range-based contract, not isLetter)
      (4L, "ɏɐ"),              // last-in vs first-out of the latin range
      (5L, "一鿿ꀀ"),        // CJK block edges in, next block out
      (6L, "12345 .,;")                  // no letters at all
    ).toDF("id", "text")
    val got = rows.select(col("id"),
        graft.functions.TextFunctions.scriptProfile(col("text")).as("p"))
      .select(col("id"), col("p.n_latin"), col("p.n_cyrillic"),
        col("p.n_cjk"), col("p.n_arabic"))
      .as[(Long, Int, Int, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 5, 3, 2, 4),
      (2L, 4, 0, 0, 0),
      (3L, 2, 0, 0, 0),
      (4L, 1, 0, 0, 0),
      (5L, 0, 0, 2, 0),
      (6L, 0, 0, 0, 0)))
  }
}
