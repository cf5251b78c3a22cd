package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fail-fast schema contract for the driver-generated testdata tables.
  *
  * The round-6 postmortem: the driver regenerated `/root/testdata` and
  * `events.ts` changed physical type (TIMESTAMP(NANOS) → timestamp[us]),
  * which broke 20 queries as scattered per-query AnalysisExceptions that the
  * harness then swallowed. This check runs once at Verify/Bench startup and
  * turns any such drift into ONE readable diff, before a single query runs.
  *
  * A contract entry lists, per table, each required column and its permitted
  * Spark types (a column may legitimately arrive in more than one physical
  * encoding — `ts` is the canonical case; the query layer normalizes).
  * Extra columns in the data are allowed (additive drift is harmless);
  * missing columns and type mismatches are not.
  */
object TableContracts {

  private val TsVariants: Seq[DataType] = Seq(TimestampType, TimestampNTZType, LongType)

  val contracts: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Seq(IntegerType, LongType),
      "r_name" -> Seq(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Seq(IntegerType, LongType),
      "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(IntegerType, LongType)),
    "customer" -> Seq(
      "c_custkey" -> Seq(LongType, IntegerType),
      "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(IntegerType, LongType),
      "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Seq(LongType, IntegerType),
      "s_name" -> Seq(StringType),
      "s_nationkey" -> Seq(IntegerType, LongType),
      "s_acctbal" -> Seq(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Seq(LongType, IntegerType),
      "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType),
      "p_type" -> Seq(StringType),
      "p_size" -> Seq(IntegerType, LongType),
      "p_retailprice" -> Seq(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Seq(LongType, IntegerType),
      "o_custkey" -> Seq(LongType, IntegerType),
      "o_orderstatus" -> Seq(StringType),
      "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> (TsVariants :+ DateType),
      "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Seq(LongType, IntegerType),
      "l_partkey" -> Seq(LongType, IntegerType),
      "l_suppkey" -> Seq(LongType, IntegerType),
      "l_linenumber" -> Seq(IntegerType, LongType),
      "l_quantity" -> Seq(DoubleType),
      "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType),
      "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType),
      "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> (TsVariants :+ DateType)),
    "events" -> Seq(
      "event_id" -> Seq(LongType, IntegerType),
      "ts" -> TsVariants,
      "user_id" -> Seq(LongType, IntegerType),
      "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType),
      "props" -> Seq(StringType)),
    "documents" -> Seq(
      "doc_id" -> Seq(LongType, IntegerType),
      "text" -> Seq(StringType),
      "lang" -> Seq(StringType),
      "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType, IntegerType)),
    "embeddings" -> Seq(
      "vec_id" -> Seq(LongType, IntegerType),
      "embedding" -> Seq(ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType, containsNull = true),
        ArrayType(DoubleType, containsNull = false)),
      "label" -> Seq(IntegerType, LongType)))

  /** Validate every contracted table under `sfDir`; returns human-readable
    * violation lines (empty = contract holds). Schema-only — no data read. */
  def violations(spark: SparkSession, sfDir: String): Seq[String] =
    contracts.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      val loaded =
        try Right(spark.read.parquet(path).schema)
        catch { case e: Throwable => Left(s"$table: unreadable at $path (${e.getMessage})") }
      loaded match {
        case Left(err) => Seq(err)
        case Right(schema) =>
          val byName = schema.fields.map(f => f.name -> f.dataType).toMap
          cols.flatMap { case (col, allowed) =>
            byName.get(col) match {
              case None => Some(s"$table.$col: MISSING (have: ${schema.fieldNames.mkString(", ")})")
              case Some(dt) if !allowed.contains(dt) =>
                Some(s"$table.$col: type ${dt.simpleString} not in permitted {${allowed.map(_.simpleString).mkString(", ")}}")
              case _ => None
            }
          }
      }
    }

  /** Assert the contract, throwing one readable error listing every
    * violation. Call at harness startup so drift fails fast and loudly. */
  def assertContract(spark: SparkSession, sfDir: String): Unit = {
    val v = violations(spark, sfDir)
    if (v.nonEmpty) throw new IllegalStateException(
      s"testdata contract violated under $sfDir:\n  " + v.mkString("\n  "))
  }
}
