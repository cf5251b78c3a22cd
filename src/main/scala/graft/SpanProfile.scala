package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiler for the d86-d88 span family scale question
  * (ROADMAP round-11 item: is the ~5.2x at 10x data pair volume or the
  * window shuffle?). Counts each intermediate relation and times the
  * stages at two scales. Not part of the library surface. */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("span-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      def timed[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      println(s"=== $dir  docs=$nDocs")
      val idx = operators.Dedup.cappedAnchorIndex(docs, 8, 64, "text", "doc_id")
        .persist()
      val nAnchors = timed("anchor index rows")(idx.count())
      println(s"  anchors=$nAnchors")
      // gram-match join volume (before diagonal grouping)
      val joined = idx.select(col("gram"), col("id").as("doc_a"), col("pos").as("pa"))
        .join(idx.select(col("gram"), col("id").as("doc_b"), col("pos").as("pb")),
          Seq("gram"))
        .filter(col("doc_a") < col("doc_b"))
      val nMatches = timed("gram-match rows")(joined.count())
      println(s"  matches=$nMatches")
      val spans = operators.Dedup.sharedSpans(docs)
      val nSpans = timed("span rows (full op)")(spans.count())
      println(s"  spans=$nSpans")
      idx.unpersist()
    }
    spark.stop()
  }
}
