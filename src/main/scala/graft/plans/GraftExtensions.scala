package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType

import graft.functions.{HashFunctions, Partitioners, TextFunctions, VectorFunctions}

/** SQL surface for the engine's function library.
  *
  * Two registration paths, same catalog entries:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` (cluster config)
  *  - `GraftFunctions.register(spark)` (imperative, existing session)
  *
  * Composed functions (cosine, jaccard, quality…) are built through the
  * Column API and unwrapped back to expressions — they stay fully codegen'd;
  * the sketch functions bind to the native expressions directly.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringLit(e: Expression, what: String): String = e match {
    case Literal(s, t) if t == org.apache.spark.sql.types.StringType && s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def stringArrayLit(e: Expression, what: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
      items.map {
        case Literal(s, t) if t == org.apache.spark.sql.types.StringType => s.toString
        case other => throw new IllegalArgumentException(s"$what: non-string element $other")
      }
    case other => throw new IllegalArgumentException(s"$what must be array('a','b',...), got $other")
  }

  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def x(col: Column): Expression = ColumnBridge.expressionEager(col)

  /** name → (usage doc, builder). */
  val functions: Map[String, (String, Seq[Expression] => Expression)] = Map(
    "minhash_signature" -> ("minhash_signature(shingles, k) - k-slot MinHash signature",
      args => MinHashSignatureExpr(args(0), intLit(args(1), "k"))),
    "minhash_shingle_signature" ->
      ("minhash_shingle_signature(tokens, n, k) - fused n-gram MinHash",
      args => MinHashShingleSigExpr(args(0), intLit(args(1), "n"), intLit(args(2), "k"))),
    "simhash64" -> ("simhash64(tokens) - 64-bit SimHash sketch",
      args => SimHash64Expr(args(0))),
    "count_in_set" -> ("count_in_set(tokens, array('a','b')) - membership count",
      args => CountInSetExpr(args(0), stringArrayLit(args(1), "set"))),
    "cosine_similarity" -> ("cosine_similarity(vec_a, vec_b)",
      args => x(VectorFunctions.cosine(c(args(0)), c(args(1))))),
    "jaccard_similarity" -> ("jaccard_similarity(arr_a, arr_b)",
      args => x(HashFunctions.jaccard(c(args(0)), c(args(1))))),
    "hamming64" -> ("hamming64(h1, h2) - bit distance of two i64 sketches",
      args => x(HashFunctions.hamming64(c(args(0)), c(args(1))))),
    "doc_fingerprint" -> ("doc_fingerprint(text) - order-sensitive rolling hash",
      args => x(HashFunctions.docFingerprint(c(args(0))))),
    "quality_score" -> ("quality_score(text) - [0,1] web-text quality heuristic",
      args => x(TextFunctions.qualityScore(c(args(0))))),
    "lang_id" -> ("lang_id(text) - heuristic language tag",
      args => x(TextFunctions.langId(c(args(0))))),
    "token_count" -> ("token_count(text) - whitespace token count",
      args => x(TextFunctions.tokenCount(c(args(0))))),
    "crc32_partition" -> ("crc32_partition(key, n) - reference partitioner",
      args => x(Partitioners.crc32Partition(c(args(0)), intLit(args(1), "n")))),
    "text_profile" -> ("text_profile(text) - one-pass stats struct",
      args => TextProfileExpr(args(0), TextFunctions.defaultStopwords)),
    "subword_count" -> ("subword_count(text) - BPE-ish token count",
      args => x(TextFunctions.subwordCount(c(args(0))))),
    "quality" -> ("quality(text) - alias of quality_score",
      args => x(TextFunctions.qualityScore(c(args(0))))),
    "word_shingles" -> ("word_shingles(text, n) - distinct word n-grams",
      args => x(HashFunctions.wordShingles(c(args(0)), intLit(args(1), "n")))),
    "hyperplane_sketch" ->
      ("hyperplane_sketch(vec, nbits) - cosine-LSH sign sketch (i64)",
      args => HyperplaneSketchExpr(args(0), intLit(args(1), "nbits"))),
    "vec_dot" -> ("vec_dot(vec_a, vec_b) - dot product",
      args => DotExpr(args(0), args(1))),
    "l2_sq" -> ("l2_sq(vec_a, vec_b) - squared euclidean distance",
      args => L2SqExpr(args(0), args(1))),
    "avro_decode" ->
      ("avro_decode(bytes, 'schema-json') - binary avro datum to struct",
      args => AvroDecodeExpr(args(0), stringLit(args(1), "schema-json"))),
    "shingle_hashes" ->
      ("shingle_hashes(tokens, n) - distinct chained n-gram hashes (i64)",
      args => ShingleHashesExpr(args(0), intLit(args(1), "n"))),
    "positional_shingle_hashes" ->
      ("positional_shingle_hashes(tokens, n) - per-window n-gram hashes, index-aligned",
      args => PositionalShingleHashesExpr(args(0), intLit(args(1), "n"))),
    "char_entropy" -> ("char_entropy(text) - Shannon entropy + distinct chars struct",
      args => CharEntropyExpr(args(0))),
    "repetition_ratio" ->
      ("repetition_ratio(text, n) - duplicate word-n-gram fraction",
      args => x(HashFunctions.repetitionRatio(c(args(0)), intLit(args(1), "n")))),
    "murmur_partition" ->
      ("murmur_partition(key, n) - reference murmur3-32 partitioner (Guava parity)",
      args => x(Partitioners.murmurPartition(c(args(0)), intLit(args(1), "n")))),
    "md5_partition" ->
      ("md5_partition(key, n) - reference md5 string-key partitioner",
      args => x(Partitioners.md5StringKeyPartition(c(args(0)), intLit(args(1), "n")))))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, (usage, builder)) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf"),
        builder))
    }
}
