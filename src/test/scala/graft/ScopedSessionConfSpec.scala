package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scoped-conf multi-key set must be all-or-restored: a throw on a
  * later key restores every key already mutated (the session is never left
  * with a half-applied scope — the leak the scoped-conf discipline exists
  * to eliminate). */
class ScopedSessionConfSpec extends AnyFunSuite with SparkTestBase {

  test("setAllOrRestore applies all keys on success") {
    val conf = spark.conf
    val priorW = conf.get("spark.sql.shuffle.partitions")
    val priorA = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      ScopedSessionConf.setAllOrRestore(conf,
        Seq("spark.sql.shuffle.partitions" -> "2",
          "spark.sql.adaptive.enabled" -> "false"),
        Map("spark.sql.shuffle.partitions" -> priorW,
          "spark.sql.adaptive.enabled" -> priorA))
      assert(conf.get("spark.sql.shuffle.partitions") == "2")
      assert(conf.get("spark.sql.adaptive.enabled") == "false")
    } finally {
      conf.set("spark.sql.shuffle.partitions", priorW)
      conf.set("spark.sql.adaptive.enabled", priorA)
    }
  }

  test("a throw on the SECOND key restores the first before rethrowing") {
    val conf = spark.conf
    val priorW = conf.get("spark.sql.shuffle.partitions")
    val priorA = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // a boolean conf rejects a non-boolean value — the real failure mode
      // (typed-conf validation) after the width already shrank
      intercept[IllegalArgumentException] {
        ScopedSessionConf.setAllOrRestore(conf,
          Seq("spark.sql.shuffle.partitions" -> "2",
            "spark.sql.adaptive.enabled" -> "not-a-boolean"),
          Map("spark.sql.shuffle.partitions" -> priorW,
            "spark.sql.adaptive.enabled" -> priorA))
      }
      assert(conf.get("spark.sql.shuffle.partitions") == priorW,
        "the already-applied width must snap back on a later-key failure")
      assert(conf.get("spark.sql.adaptive.enabled") == priorA)
    } finally {
      conf.set("spark.sql.shuffle.partitions", priorW)
      conf.set("spark.sql.adaptive.enabled", priorA)
    }
  }

  test("a throw on the FIRST key leaves nothing mutated") {
    val conf = spark.conf
    val priorW = conf.get("spark.sql.shuffle.partitions")
    intercept[Exception] {
      ScopedSessionConf.setAllOrRestore(conf,
        Seq("spark.sql.adaptive.enabled" -> "nope",
          "spark.sql.shuffle.partitions" -> "2"),
        Map("spark.sql.shuffle.partitions" -> priorW))
    }
    assert(conf.get("spark.sql.shuffle.partitions") == priorW)
  }
}
