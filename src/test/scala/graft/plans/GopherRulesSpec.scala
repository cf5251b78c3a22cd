package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.TextFunctions

class GopherRulesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def rules(text: String) =
    Seq(text).toDF("text")
      .select(TextFunctions.gopherRules(col("text")).as("g"))
      .select("g.n_words", "g.mean_word_len", "g.symbol_ratio",
        "g.alpha_word_frac", "g.n_required_stop", "g.passes")
      .as[(Long, Double, Double, Double, Long, Boolean)]
      .head()

  test("a natural 60-word English sentence passes every rule") {
    val text = ("the cat sat on the mat and looked out of the window " +
      "with a calm face while the rain kept falling on the roof ") * 3
    val (n, mean, sym, alpha, stop, passes) = rules(text)
    assert(n == 72 && passes)
    assert(mean >= 3.0 && mean <= 10.0)
    assert(sym == 0.0 && alpha == 1.0 && stop >= 2)
  }

  test("symbol-heavy text fails on symbol_ratio") {
    val base = "the data be full of hashes that have come with us now " * 6
    val text = base + ("# " * 20) + "..." // 20 hashes + one ellipsis run
    val (n, _, sym, _, _, passes) = rules(text)
    assert(sym > 0.1 && !passes)
    // counts: 20 '#' + 3-char '...' counted once (as chars/3)
    assert(math.abs(sym - 21.0 / n) < 1e-12)
  }

  test("numeric/token-soup fails alpha_word_frac; short docs fail n_words") {
    val nums = (1 to 60).map(_.toString).mkString(" ")
    val (_, _, _, alpha, _, passesNums) = rules(nums + " the be")
    assert(alpha < 0.8 && !passesNums)
    assert(!rules("the be to of and that")._6) // 6 words < 50
  }

  test("required-stopword rule needs >= 2 distinct hits, case-insensitive") {
    val noStop = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6)
    assert(!rules(noStop)._6)
    val oneStop = noStop + " THE"
    assert(rules(oneStop)._5 == 1)
    val twoStop = noStop + " THE with"
    assert(rules(twoStop)._5 == 2)
  }

  test("empty and whitespace-only text yields zeros, not NaN") {
    for (t <- Seq("", "   ")) {
      val (n, mean, sym, alpha, stop, passes) = rules(t)
      assert(n == 0 && mean == 0.0 && sym == 0.0 && alpha == 0.0
        && stop == 0 && !passes)
    }
  }
}
