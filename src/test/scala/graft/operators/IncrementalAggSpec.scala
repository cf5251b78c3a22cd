package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IncrementalAggSpec extends AnyFunSuite with SparkTestBase {

  private def corpus() = {
    import spark.implicits._
    (1 to 200).map(i =>
      (i.toLong, s"k${i % 7}", (i * 37 % 100) / 10.0))
      .toDF("id", "key", "value")
  }

  test("folding any batch split reproduces the one-shot aggregation") {
    val df = corpus()
    def rows(x: org.apache.spark.sql.DataFrame) = x.orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    val direct = rows(IncrementalAgg.partials(df, Seq("key"), "value"))
    for (k <- 1 to 4) {
      val batches = (0 until k).map(i => df.filter(col("id") % k === i))
      val folded = rows(IncrementalAgg.fold(batches, Seq("key"), "value"))
      assert(folded.size == direct.size, s"split into $k batches")
      folded.zip(direct).foreach { case ((fk, fn, fs, fmin, fmax),
          (dk, dn, ds, dmin, dmax)) =>
        assert(fk == dk && fn == dn && fmin == dmin && fmax == dmax,
          s"split into $k batches, key $fk")
        // sum partials re-associate float addition — exact to ~1 ulp scale,
        // which is why MV readouts round (the d69 stance)
        assert(math.abs(fs - ds) < 1e-9, s"split into $k batches, key $fk sum")
      }
    }
  }

  test("empty deltas are no-ops; keys appearing only in a delta are inserted") {
    import spark.implicits._
    val df = corpus()
    val state = IncrementalAgg.partials(df.filter(col("key") =!= "k0"), Seq("key"), "value")
    val empty = IncrementalAgg.partials(df.limit(0), Seq("key"), "value")
    val unchanged = IncrementalAgg.merge(state, empty, Seq("key"))
    assert(unchanged.orderBy("key").collect().toSeq.map(_.toSeq) ==
      state.orderBy("key").collect().toSeq.map(_.toSeq))
    val withNew = IncrementalAgg.merge(state,
      IncrementalAgg.partials(df.filter(col("key") === "k0"), Seq("key"), "value"),
      Seq("key"))
    assert(withNew.count() == state.count() + 1)
    val k0 = withNew.filter(col("key") === "k0").collect()(0)
    val k0direct = IncrementalAgg.partials(df, Seq("key"), "value")
      .filter(col("key") === "k0").collect()(0)
    assert(k0.toSeq == k0direct.toSeq)
  }
}
