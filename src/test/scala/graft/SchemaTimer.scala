package graft

/** Diagnostic main (test scope): prints per-entry builder wall time for
  * every SparkEntry.queries entry, slowest first — the tool that decides
  * what belongs in [[SparkEntry.eagerQueries]] (anything whose builder
  * runs driver-side jobs instead of analysis-only planning).
  * Run: `sbt "Test/runMain graft.SchemaTimer"`. */
object SchemaTimer {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("schema-timer").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val times = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).schema
      val ms = (System.nanoTime() - t0) / 1000000
      (name, ms)
    }
    times.filter(_._2 > 300).sortBy(-_._2).foreach { case (n, ms) =>
      val flag = if (SparkEntry.eagerQueries(n)) "eager " else "UNFLAGGED"
      println(f"$ms%6d ms  $flag  $n")
    }
    println(s"TOTAL ${times.map(_._2).sum} ms over ${times.size} queries")
    spark.stop()
  }
}
