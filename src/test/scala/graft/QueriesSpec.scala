package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs on sf0.001 and returns rows;
  * oracle coverage is complete; the flagship entry works. (Value-level
  * correctness is the driver's DuckDB gate, replicated locally by
  * tools/local_verify.py.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("every query dumps scalar columns only (Verify dump-edge contract)") {
    // the driver's checker sorts dump rows by every column; array/map/
    // struct cells are unsortable there (r7 ir_inverted_index red row)
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}:${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"non-scalar dump columns: $offenders")
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("Proto order keys and query keys agree (modulo semantically-ordered queries)") {
    val dangling = Proto.order.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"Proto entry without query: $dangling")
    // these end in a sort+limit (or TakeOrdered) — already totally ordered
    val semanticallyOrdered =
      Set("topk_orders", "q3_shipping_priority", "sample_uniform_k",
        "q10_returned_items", "rel_bm25_search", "basket_lift_pairs",
        "events_path_analysis", "text_token_lang_chi2",
        "text_cooccurrence_pmi", "text_keyphrase_rake",
        "ir_query_expansion", "ir_phrase_search", "ir_proximity_search")
    val unsorted = SparkEntry.queries.keySet -- Proto.order.keySet --
      semanticallyOrdered
    assert(unsorted.isEmpty,
      s"query without a Verify-protocol order: $unsorted")
  }
}
