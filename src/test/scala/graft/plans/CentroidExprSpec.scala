package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Equivalence contract for the fused centroid-ranking kernel
  * ([[org.apache.spark.sql.graftexpr.CentroidKernel]]) against the HOF
  * towers it replaced — the k-means argmin/top-2 (score
  * |q|² − 2·q·c + |c|², `add_qnorm = true`) and the IVF cell ranking
  * (|c|² − 2·q·c, `add_qnorm = false`) — because the whole cluster,
  * sim_ivf and dedup_semantic oracle surface was gated against those
  * towers.
  */
class CentroidExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private val dir = "/root/testdata/sf0.01"

  /** The original k-means tower: full sorted (d2, cid) ranking. */
  private def hofKmeans = expr(
    """array_sort(transform(cents, c ->
      |  struct(qnorm - 2 * long_array_dot(q, c.cv) + c.cnorm2 AS s,
      |         c.cid AS cid)))""".stripMargin)

  /** The original IVF tower (no qnorm term). */
  private def hofIvf = expr(
    """array_sort(transform(cents, c ->
      |  struct(c.cnorm2 - 2 * long_array_dot(q, c.cv) AS s, c.cid AS cid)))""".stripMargin)

  /** Corpus rows joined to a broadcast centroid array (the consumers'
    * exact shape), centroids = first `k` corpus vectors.
    */
  private def frame(nCents: Int) = {
    val q = graft.functions.Dedup.quantized(spark, dir).select($"vec_id", $"q")
    val cents = q.filter($"vec_id" < nCents)
      .select(struct($"vec_id".as("cid"), $"q".as("cv"),
        ArrayOps.longArrayNormSq($"q").as("cnorm2")).as("c"))
      .agg(collect_list($"c").as("cents"))
    q.withColumn("qnorm", ArrayOps.longArrayNormSq($"q"))
      .join(broadcast(cents), lit(true))
  }

  test("centroidRank(k, addQNorm=true) == slice of the k-means HOF tower") {
    for (k <- Seq(1, 2, 8)) {
      val bad = frame(8).select(
          ArrayOps.centroidRank($"q", $"cents", k, addQNorm = true).as("kn"),
          slice(hofKmeans, 1, k).as("h"))
        .filter(not($"kn" <=> $"h"))
      assert(bad.count() === 0, s"k=$k diverges")
    }
  }

  test("centroidRank(k, addQNorm=false) == slice of the IVF HOF tower") {
    for (k <- Seq(1, 2, 16)) {
      val bad = frame(16).select(
          ArrayOps.centroidRank($"q", $"cents", k, addQNorm = false).as("kn"),
          slice(hofIvf, 1, k).as("h"))
        .filter(not($"kn" <=> $"h"))
      assert(bad.count() === 0, s"k=$k diverges")
    }
  }

  test("k past the centroid count truncates like slice; ties break by cid") {
    import org.apache.spark.sql.graftexpr.CentroidKernel
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    def longs(xs: Long*): GenericArrayData = new GenericArrayData(
      xs.map(java.lang.Long.valueOf).toArray[Any])
    def cent(cid: Long, cv: GenericArrayData, cnorm2: Long) =
      new GenericInternalRow(Array[Any](java.lang.Long.valueOf(cid), cv,
        java.lang.Long.valueOf(cnorm2)))
    // two IDENTICAL centroids (score tie) + one farther — tie must break
    // by lowest cid, exactly like struct sort
    val cents = new GenericArrayData(Array[Any](
      cent(7L, longs(1L, 1L), 2L), cent(3L, longs(1L, 1L), 2L),
      cent(9L, longs(100L, 100L), 20000L)))
    val r = CentroidKernel.rank(longs(1L, 1L), cents, 5, addQNorm = true)
    assert(r.numElements() === 3) // k=5 > 3 centroids truncates
    assert(r.getStruct(0, 2).getLong(1) === 3L) // tie -> lowest cid first
    assert(r.getStruct(1, 2).getLong(1) === 7L)
    assert(r.getStruct(2, 2).getLong(1) === 9L)
    // score check: |q|²=2, dot=2, |c|²=2 -> 2-4+2 = 0 for the twins
    assert(r.getStruct(0, 2).getLong(0) === 0L)
    // shorter centroid vector: dot truncates at the shorter length
    // (the long_array_dot contract)
    val short = new GenericArrayData(Array[Any](cent(1L, longs(5L), 25L)))
    val r2 = CentroidKernel.rank(longs(2L, 9L), short, 1, addQNorm = false)
    assert(r2.getStruct(0, 2).getLong(0) === 25L - 2L * 10L)
  }

  test("null elements/structs/fields raise the NAMED error, never an NPE/garbage read") {
    // the registered SQL function admits containsNull inputs the
    // in-repo producers never emit — a null must fail with the
    // expression's name (PqKernel precedent), not NPE in getStruct or
    // read undefined bytes via UnsafeArrayData.getLong
    import org.apache.spark.sql.graftexpr.CentroidKernel
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    def longs(xs: Any*): GenericArrayData = new GenericArrayData(xs.toArray)
    def cent(cid: Any, cv: Any, cnorm2: Any) =
      new GenericInternalRow(Array[Any](cid, cv, cnorm2))
    val goodCents = new GenericArrayData(Array[Any](
      cent(1L, longs(1L, 2L), 5L)))
    def named(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("centroid_rank"), e.getMessage)
    }
    // null query element — read by both the qnorm loop and the dot loop
    named(CentroidKernel.rank(longs(1L, null), goodCents, 1, addQNorm = true))
    named(CentroidKernel.rank(longs(1L, null), goodCents, 1, addQNorm = false))
    // null centroid struct
    named(CentroidKernel.rank(longs(1L, 2L),
      new GenericArrayData(Array[Any](null)), 1, addQNorm = false))
    // null struct field (cv)
    named(CentroidKernel.rank(longs(1L, 2L),
      new GenericArrayData(Array[Any](cent(1L, null, 5L))), 1, addQNorm = false))
    // null centroid vector element
    named(CentroidKernel.rank(longs(1L, 2L),
      new GenericArrayData(Array[Any](cent(1L, longs(1L, null), 5L))), 1,
      addQNorm = false))
    // null PAST the read window (q longer than cv, addQNorm=false never
    // reads q(1)) is harmless — guards sit at read sites only
    val ok = CentroidKernel.rank(longs(3L, null),
      new GenericArrayData(Array[Any](cent(1L, longs(2L), 4L))), 1,
      addQNorm = false)
    assert(ok.getStruct(0, 2).getLong(0) === 4L - 2L * 6L)
    // and through the registered SQL function with a containsNull array
    val e = intercept[Exception] {
      spark.sql(
        """SELECT centroid_rank(array(1L, CAST(NULL AS BIGINT)),
          |  array(named_struct('cid', 1L, 'cv', array(1L, 2L), 'cnorm2', 5L)),
          |  1, true)""".stripMargin).collect()
    }
    assert(e.getMessage.contains("centroid_rank"), e.getMessage)
  }

  test("kernel swap leaves the trained k-means assignment unchanged (real corpus)") {
    // end-to-end guard on the shared Lloyd path: every consumer's gate
    // hashes these values
    val out = graft.functions.Clustering.kmeansAssign(spark, dir)
      .agg(count(lit(1)).as("n"), sum($"dist2").as("sd"),
        sum($"cluster").as("sc")).collect().head
    assert(out.getLong(0) > 0)
  }
}
