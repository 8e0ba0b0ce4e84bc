package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salted aggregation/join must equal their unsalted forms. */
class SkewOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  lazy val skewed = spark.range(0, 10000)
    .select(when($"id" % 100 === 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 7)).as("key"),
      $"id".as("v"))

  test("saltedSum equals plain groupBy sum") {
    val plain = skewed.groupBy($"key")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedSum(skewed, "key", $"v", 8, $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin equals plain join") {
    val dim = spark.createDataFrame(
      Seq(("hot", "H"), ("k1", "A"), ("k3", "B"))).toDF("key", "label")
    val plain = skewed.join(dim, Seq("key"))
      .groupBy($"key", $"label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedJoin(skewed, dim, "key", 8, $"v")
      .groupBy($"key", $"label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain)
  }
}
