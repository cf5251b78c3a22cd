package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump each query's `explain("formatted")` to `<outDir>/<name>_<tag>.txt`
  * — the per-query before/after plan evidence an optimization round
  * commits under `plans/r<N>/` (PLANS.md stays the one-file audit doc;
  * these are the diffable per-query artifacts).
  *
  * Run: `sbt "runMain graft.DumpPlans <outDir> <tag>"` (optional
  * `SPARK_GRAFT_QUERIES` prefix subset, `SPARK_GRAFT_SF_DIR` data dir —
  * defaults to sf0.01 so eager gate builders stay quick). */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSeq)
    val failed = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"),
            df.queryExecution.explainString(ExplainMode.fromString("formatted")))
        } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[plans] $name failed: $e")
        }
      }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[plans] FAILED: ${failed.mkString(",")}")
      sys.exit(1)
    }
  }
}
