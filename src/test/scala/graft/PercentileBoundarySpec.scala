package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q20's boundary-proof percentile contract (ROADMAP item 4): the
  * interpolated value is computed in integer tenth-cents with integer
  * HALF_UP rounding, so a median landing exactly on a half-cent rounds
  * deterministically — where the old float formulation ((a+b)/2 as
  * DOUBLE, then round) sat one ulp from flipping between engines. */
class PercentileBoundarySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q20 rounds exact half-cent medians HALF_UP, not by float luck") {
    val dir = Files.createTempDirectory("q20-boundary")
    // group A: n=2, prices 1.00 / 1.01 → median = 1.005 EXACTLY (the
    //   boundary: as a double that is 1.00499999999999989..., so a float
    //   round gives 1.00 while decimal HALF_UP gives 1.01)
    // group B: n=2, prices 100.00 / 100.05 → p90 index t=9 tenths →
    //   v = 10*10000 + 9*5 = 100045 tenth-cents → ends in 5 → HALF_UP
    //   to 100.05 (HALF_EVEN would give 100.04)
    // group C: n=1 → both percentiles are the single value (the hi-rank
    //   cap path: lo = hi = rank 1)
    Seq(("A", 1.00), ("A", 1.01),
        ("B", 100.00), ("B", 100.05),
        ("C", 7.77))
      .toDF("o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q20_percentiles")(spark, dir.toString)
      .select("o_orderstatus", "median_price", "p90_price")
      .as[(String, Double, Double)].collect()
      .map { case (k, m, p) => k -> ((m, p)) }.toMap
    assert(got("A")._1 == 1.01, s"half-cent median must round HALF_UP: $got")
    assert(got("B")._2 == 100.05, s"half-tenth p90 must round HALF_UP: $got")
    assert(got("C") == ((7.77, 7.77)), s"singleton group: $got")
    // the float formulation this replaced really was fragile here: the
    // double (1.00+1.01)/2 is BELOW the printed 1.005 (exact binary
    // expansion 1.00499999999999989...), so any engine rounding the
    // BINARY value half-up lands on 1.00 while one rounding the SHORTEST
    // DECIMAL repr lands on 1.01 — engine-dependent by one cent
    assert(new java.math.BigDecimal((1.00 + 1.01) / 2)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue == 1.00,
      "the boundary case no longer exercises the hazard — pick a new one")
  }
}
