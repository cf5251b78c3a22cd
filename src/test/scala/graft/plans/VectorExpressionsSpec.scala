package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VectorFunctions
import graft.operators.{KMeans, Similarity}

class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def norm(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val d = norm(a) * norm(b)
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    when(d === 0, lit(0.0)).otherwise(dot / d)
  }

  private val vecs = Seq(
    (0L, Array(0.3f, -1.2f, 2.4f), Array(1.0f, 0.5f, -0.25f)),
    (1L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
    (2L, Array(1e-8f, 2e8f, -3.5f), Array(-1e-8f, 2e8f, 3.5f))
  ).toDF("id", "a", "b")

  test("native hyperplane sketch is bit-identical to the declarative xxhash64 form") {
    // the declarative form hyperplane_sketch replaced
    def hofSketch(vec: org.apache.spark.sql.Column, nBits: Int) =
      aggregate(
        sequence(lit(0), lit(nBits - 1)),
        lit(0L),
        (acc, b) => {
          val proj = aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (v, d) => v.cast("double") *
                when(pmod(xxhash64(d, b), lit(2L)) === 0L, 1.0).otherwise(-1.0)),
            lit(0.0), (s, x) => s + x)
          acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), b.cast("int")))
            .otherwise(lit(0L)))
        })
    val rnd = new scala.util.Random(3)
    val data = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    for (bits <- Seq(1, 12, 63)) {
      val rows = data.select(
        VectorExpressions.hyperplaneSketch($"v", bits).as("native"),
        hofSketch($"v", bits).as("hof")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$bits"))
    }
  }

  test("native cosine/l2sq are bit-identical to the HOF forms") {
    val rows = vecs.select(
      VectorFunctions.cosine($"a", $"b").as("nc"),
      hofCosine($"a", $"b").as("hc"),
      VectorFunctions.l2Sq($"a", $"b").as("nl"),
      aggregate(zip_with($"a", $"b", (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v).as("hl")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
      assert(java.lang.Double.compare(r.getDouble(2), r.getDouble(3)) == 0)
    }
  }

  test("nearest_cells picks argmin cells with (dist, id) tie-break") {
    val cents = Seq(
      (7, Array(0.0, 0.0)), (3, Array(1.0, 1.0)), (5, Array(1.0, 1.0)))
    val df = Seq((0L, Array(0.9f, 0.9f)), (1L, Array(0.1f, 0.0f)))
      .toDF("id", "vec")
      .select($"id", VectorExpressions.nearestCells($"vec", cents, 2).as("nc"))
    val rows = df.select($"id", $"nc".getField("cell").as("cells")).collect()
    // vec 0: nearest (1,1) — tie between cells 3 and 5 → lower id first
    assert(rows.find(_.getLong(0) == 0L).get.getSeq[Int](1) == Seq(3, 5))
    assert(rows.find(_.getLong(0) == 1L).get.getSeq[Int](1).head == 7)
  }

  test("ScoredTopKAggregator matches sort-take under multi-partition merge") {
    val n = 500
    val data = (0 until n).map(i => (i.toLong % 7, i.toLong, ((i * 37) % 101).toDouble))
      .toDF("g", "id", "score").repartition(8)
    val topk = udaf(new graft.functions.ScoredTopKAggregator(5))
    val got = data.groupBy("g").agg(topk($"id", $"score").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "s")))
      .select($"g", $"s.id".as("id"), $"pos")
      .as[(Long, Long, Int)].collect().toSet
    val expect = (0 until n).map(i => (i.toLong % 7, i.toLong, ((i * 37) % 101).toDouble))
      .groupBy(_._1).flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
          .map { case (r, idx) => (g, r._2, idx) }
      }.toSet
    assert(got == expect)
  }

  test("ANN plans have no Window exchange on the corpus side") {
    val emb = (0L until 50L).map(i => (i, Array(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 2), k = 3)
    assert(!bf.queryExecution.executedPlan.toString.contains("Window"))
    val cents = Similarity.sampledCentroids(emb, 4)
    val ivf = Similarity.ivfTopK(emb, emb.filter($"vec_id" < 2), cents, k = 3)
    assert(!ivf.queryExecution.executedPlan.toString.contains("Window"))
    val assigned = KMeans.assignCells(emb, cents, "embedding", "vec_id")
    assert(!assigned.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("farthest-point seeding spreads seeds across separated blobs") {
    val sample = Array(
      Array(0.0, 0.0), Array(0.1, 0.0), Array(0.05, 0.1),
      Array(10.0, 10.0), Array(10.1, 10.0),
      Array(-10.0, 5.0))
    val seeds = KMeans.farthestPointSeeds(sample, 3)
    // one seed per well-separated region
    def region(v: Array[Double]) = (math.round(v(0) / 10.0), math.round(v(1) / 10.0))
    assert(seeds.map(region).toSet.size == 3)
  }

  test("native centered_project is bit-identical to the HOF aggregate form") {
    // the HOF form centered_project replaced (round-16 optimization):
    // center via zip_with, then one interpreted aggregate per component
    val mean = Array(0.5, -1.0, 2.0)
    val comps = Array(Array(1.0, 0.0, -1.0), Array(0.25, 4.0, 0.125))
    val emb = Seq(
      (0L, Array(0.3f, -1.2f, 2.4f)),
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(1e-8f, 2e8f, -3.5f))
    ).toDF("vec_id", "embedding")
    val centered = zip_with(
      transform($"embedding", x => x.cast("double")),
      array(mean.map(lit): _*), (a, b) => a - b)
    val hof = emb.select($"vec_id", centered.as("c"))
      .select($"vec_id", array(comps.map { comp =>
        aggregate(zip_with($"c", array(comp.map(lit): _*), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)
      }: _*).as("proj"))
    val native = emb.select($"vec_id",
      VectorExpressions.centeredProject($"embedding", mean, comps).as("proj"))
    val h = hof.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val n = native.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(h.length == n.length)
    h.zip(n).foreach { case (a, b) => assert(a == b) } // exact, not approx
  }

  test("native center_scale is bit-identical to the nested zip_with form") {
    val mean = Array(1.0, -2.0, 0.5)
    val sd = Array(2.0, 0.25, 1e-30)
    val emb = Seq(
      (0L, Array(0.3f, -1.2f, 0.5f)),
      (1L, Array(-7.5f, 3.25f, 0.5f))
    ).toDF("vec_id", "embedding")
    val hof = emb.select($"vec_id", zip_with(
      zip_with(transform($"embedding", x => x.cast("double")),
        array(mean.map(lit): _*), (a, b) => a - b),
      array(sd.map(lit): _*), (a, b) => a / b).as("z"))
    val native = emb.select($"vec_id",
      VectorExpressions.centerScale($"embedding", mean, sd).as("z"))
    val h = hof.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val n = native.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    h.zip(n).foreach { case (a, b) => assert(a == b) }
  }

  test("centered_project refuses a vector whose length disagrees with the model") {
    val emb = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      emb.select(VectorExpressions.centeredProject($"embedding",
        Array(0.0, 0.0, 0.0), Array(Array(1.0, 0.0, 0.0)))).collect()
    }
    assert(e.getMessage != null)
  }

  test("adc_sum is bit-identical to the aggregate(zip_with(codes, lut)) HOF form") {
    val rnd = new scala.util.Random(11)
    val m = 8; val cb = 16
    val data = (0 until 60).map { i =>
      (i.toLong,
        Seq.fill(m)(rnd.nextInt(cb)),
        Seq.fill(m)(Seq.fill(cb)(rnd.nextDouble() * 4 - 2)))
    }.toDF("id", "codes", "lut")
    val hof = aggregate(zip_with($"codes", $"lut",
      (c, t) => element_at(t, c + 1)), lit(0.0), (a, x) => a + x)
    data.select(VectorExpressions.adcSum($"codes", $"lut").as("n"),
        hof.as("h")).collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        "adc_sum must match the HOF form bit-for-bit"))
  }

  test("adc_sum null-propagates a length mismatch like zip_with padding") {
    val data = Seq((Seq(0, 1), Seq(Seq(1.0, 2.0)))).toDF("codes", "lut")
    val hof = aggregate(zip_with($"codes", $"lut",
      (c, t) => element_at(t, c + 1)), lit(0.0), (a, x) => a + x)
    val r = data.select(VectorExpressions.adcSum($"codes", $"lut").as("n"),
      hof.as("h")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("adc_sum refuses an out-of-range code loudly") {
    val data = Seq((Seq(5), Seq(Seq(1.0, 2.0)))).toDF("codes", "lut")
    val e = intercept[Exception] {
      data.select(VectorExpressions.adcSum($"codes", $"lut")).collect()
    }
    assert(e.getMessage != null)
  }

  test("kmeans SSE history is non-increasing") {
    val pts = (0L until 90L).map(i =>
      (i, Array((i % 3 * 10).toFloat + (i % 7) * 0.01f, (i % 5) * 0.02f)))
      .toDF("vec_id", "embedding")
    val model = KMeans.fitModel(pts, k = 3, iterations = 4)
    model.sseHistory.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9)
      case _ =>
    }
  }
}
