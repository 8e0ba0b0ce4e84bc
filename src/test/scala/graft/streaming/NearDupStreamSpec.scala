package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

object NearDupStreamSpec {
  case class D(doc_id: Long, text: String, ts: Long)
}

/** Streaming MinHash-LSH near-dup detection: first owner wins, later
  * colliders are flagged against the owner, distinct docs pass, and
  * state carries across micro-batches.
  */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr
  import NearDupStreamSpec.D

  implicit lazy val enc: org.apache.spark.sql.Encoder[D] = Encoders.product[D]
  val t0 = 1700000000000L

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the sun sets slowly behind distant purple mountains tonight"

  test("near-identical docs flag against the first owner across batches") {
    val ms = MemoryStream[D](enc, spark)
    val q = NearDupStream.nearDups(ms.toDF())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      ms.addData(
        D(1, base, t0),
        D(2, "a completely different tiny document about database engines and " +
          "storage formats with columnar layouts and vectorized execution", t0 + 1000))
      q.processAllAvailable()
      // batch 2: a near-copy of doc 1 (one word changed) and an exact copy
      ms.addData(D(3, base.replace("lazy", "sleepy"), t0 + 2000),
        D(4, base, t0 + 3000))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .select($"doc_id", $"dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // docs 3 and 4 must both be flagged against owner 1; doc 2 clean
      assert(got.contains((4L, 1L)), got)
      assert(got.exists(_._1 == 3L), got)
      assert(!got.exists(_._1 == 2L), got)
      assert(!got.exists(_._1 == 1L), got)
    } finally q.stop()
  }

  test("a late duplicate with a SMALLER doc_id is flagged against the stored owner") {
    val ms = MemoryStream[D](enc, spark)
    val q = NearDupStream.nearDups(ms.toDF())
      .writeStream.format("memory").queryName("neardup_late")
      .outputMode("append").start()
    try {
      ms.addData(D(10, base, t0))
      q.processAllAvailable()
      ms.addData(D(3, base, t0 + 1000)) // exact copy, smaller id, later batch
      q.processAllAvailable()
      val got = spark.table("neardup_late")
        .select($"doc_id", $"dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((3L, 10L)), got)
    } finally q.stop()
  }

  test("band-owner state survives query restart from checkpoint") {
    val work = java.nio.file.Files.createTempDirectory("neardup-restart").toString
    val ms = MemoryStream[D](enc, spark)
    val out = NearDupStream.nearDups(ms.toDF())
    def start() = out.writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()

    val q1 = start()
    ms.addData(D(1, base, t0))
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // fresh query instance, same checkpoint
    ms.addData(D(7, base, t0 + 1000)) // duplicate seen only post-restart
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(s"$work/out")
      .select($"doc_id", $"dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // flagged against the PRE-restart owner only if state was recovered
    assert(got == Set((7L, 1L)), got)
  }

  test("batch mode (NoTimeout path) matches the collision contract") {
    import spark.implicits._
    val df = Seq(D(10, base, t0), D(11, base, t0 + 1),
      D(12, "unrelated short words only here", t0 + 2)).toDF()
    val got = NearDupStream.nearDups(df)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((11L, 10L)))
  }

  // ---- census family ------------------------------------------------

  private val Hour = 3600000L
  private val near = base.replace("lazy", "sleepy")
  private val other = "a completely different tiny document about database " +
    "engines and storage formats with columnar layouts and vectorized execution"

  /** Streamed census must equal the batch twin on the same closed input,
    * however the arrival is batched — including an out-of-order arrival
    * where the EVENT-time-first doc lands in a later micro-batch (the
    * watermark-bounded fold holds newer hits until the older one is
    * consumed; candidates' stored-owner-wins rule would disagree here).
    */
  test("census cells: streamed multi-batch run has exact batch parity under out-of-order arrival") {
    import spark.implicits._
    val docs = Seq(
      D(5, base, t0 + 10 * 60000), // event-time FIRST of the base family
      D(1, base, t0 + 20 * 60000),
      D(3, near, t0 + 30 * 60000),
      D(2, other, t0 + 15 * 60000),
      D(4, other, t0 + 40 * 60000))
    val expect = NearDupStream.censusCells(docs.toDF())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the base family must have owner 5 (event-time first), and the
    // copies must have collapsed cross-band to ONE membership each
    assert(expect(5L) === 3L, expect)
    assert(expect(2L) === 2L, expect)
    assert(expect.keySet === Set(5L, 2L))

    val work = java.nio.file.Files.createTempDirectory("neardup-census").toString
    val ms = MemoryStream[D](enc, spark)
    val q = NearDupStream.serveCensus(ms.toDF(), s"$work/store", s"$work/ckpt")
    try {
      // doc 1 ARRIVES first; doc 5 (earlier ts, within the 1 h horizon)
      // arrives a batch later — the fold must still crown 5 the owner
      ms.addData(docs(1))
      q.processAllAvailable()
      ms.addData(docs(0), docs(3))
      q.processAllAvailable()
      ms.addData(docs(2), docs(4))
      q.processAllAvailable()
      ms.addData(D(99, "watermark sentinel advancing far ahead", t0 + 48 * Hour))
      q.processAllAvailable()
      val got = DwsSink.read(spark, s"$work/store", "neardup_census",
          Seq("owner", "cluster_size"))
        .collect().map(r => r.getString(0).toLong -> r.getString(1).toLong).toMap
      assert(got === expect)
    } finally q.stop()
  }

  test("census cells survive checkpoint restart without double counting") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("neardup-census-rs").toString
    val ms = MemoryStream[D](enc, spark)
    def start() = NearDupStream.serveCensus(ms.toDF(), s"$work/store", s"$work/ckpt")
    def stored(): Map[Long, Long] =
      DwsSink.read(spark, s"$work/store", "neardup_census",
          Seq("owner", "cluster_size"))
        .collect().map(r => r.getString(0).toLong -> r.getString(1).toLong).toMap

    val q1 = start()
    try {
      ms.addData(D(1, base, t0), D(2, base, t0 + 1000))
      q1.processAllAvailable()
      ms.addData(D(50, "drain sentinel one two three", t0 + 3 * Hour))
      q1.processAllAvailable()
      assert(stored() === Map(1L -> 2L))
    } finally q1.stop()

    // restart on the same checkpoint: a third copy extends the SAME
    // cluster (owner state recovered), the earlier membership must not
    // recount, and a re-sent exact copy of doc 2 must not inflate
    val q2 = start()
    try {
      ms.addData(D(3, base, t0 + 4 * Hour), D(2, base, t0 + 5 * Hour))
      q2.processAllAvailable()
      ms.addData(D(51, "second drain sentinel four five six", t0 + 12 * Hour))
      q2.processAllAvailable()
      assert(stored() === Map(1L -> 3L))
    } finally q2.stop()
  }

  test("collapsed census: streamed cells match the batch fingerprint groups") {
    import spark.implicits._
    // a 4-copy exact-dup family (one copy WORD-PERMUTED — unigram
    // SimHash is order-independent, so it must join the family), one
    // 2-copy family, one singleton
    val permuted = base.split(" ").reverse.mkString(" ")
    val docs = Seq(
      D(7, base, t0 + 10 * 60000), // arrives before the eventual rep
      D(2, base, t0 + 20 * 60000), // min doc_id -> rep moves to 2
      D(9, permuted, t0 + 30 * 60000),
      D(4, base, t0 + 40 * 60000),
      D(5, other, t0 + 15 * 60000),
      D(6, other, t0 + 25 * 60000),
      D(8, "a lone unrelated catalog description of columnar engines",
        t0 + 35 * 60000))
    // independent batch derivation: the collapse groups ARE the
    // fingerprint groups (same kernel expression as Dedup.simhash)
    val expect = docs.toDF()
      .select(graft.plans.ArrayOps.simhashFp(
          graft.functions.TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")),
          graft.functions.Dedup.SimBits).as("fp"), org.apache.spark.sql.functions.col("doc_id"))
      .groupBy(org.apache.spark.sql.functions.col("fp"))
      .agg(org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("doc_id")).as("owner"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("sz"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(expect.values.map(_._2).toSeq.sorted === Seq(1L, 2L, 4L),
      s"fixture families wrong: $expect")
    // batch twin IS the operator (NoTimeout single pass)
    val batchCells = NearDupStream.collapsedCensus(docs.toDF())
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(batchCells.view.mapValues(v => (v._1, v._2)).toMap === expect)
    batchCells.values.foreach { case (_, sz, pairs) =>
      assert(pairs === sz * (sz - 1) / 2, "n_doc_pairs accounting identity")
    }

    // streamed, out of order, across batches: the store keyed by fp
    // must converge to one up-to-date cell per family — including the
    // rep moving 7 -> 2 after the smaller id arrives
    val work = java.nio.file.Files.createTempDirectory("neardup-collapse").toString
    val ms = MemoryStream[D](enc, spark)
    val q = NearDupStream.serveCollapsedCensus(ms.toDF(), s"$work/store", s"$work/ckpt")
    try {
      ms.addData(docs(0), docs(4))
      q.processAllAvailable()
      ms.addData(docs(1), docs(2), docs(6))
      q.processAllAvailable()
      ms.addData(docs(3), docs(5))
      q.processAllAvailable()
      val got = DwsSink.read(spark, s"$work/store", "neardup_collapsed",
          Seq("fp", "owner", "group_size", "n_doc_pairs"))
        .collect()
        .map(r => r.getString(0).toLong ->
          ((r.getString(1).toLong, r.getString(2).toLong, r.getString(3).toLong)))
        .toMap
      assert(got === batchCells, s"served cells diverge: got $got")
    } finally q.stop()
  }

  test("collapsed census: state and rep survive checkpoint restart") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("neardup-collapse-rs").toString
    val ms = MemoryStream[D](enc, spark)
    def start() = NearDupStream.serveCollapsedCensus(
      ms.toDF(), s"$work/store", s"$work/ckpt")
    def stored(): Map[Long, (Long, Long)] =
      DwsSink.read(spark, s"$work/store", "neardup_collapsed",
          Seq("fp", "owner", "group_size"))
        .collect()
        .map(r => r.getString(0).toLong ->
          ((r.getString(1).toLong, r.getString(2).toLong)))
        .toMap
    val q1 = start()
    try {
      ms.addData(D(3, base, t0), D(5, base, t0 + 1000))
      q1.processAllAvailable()
      assert(stored().values.toSeq === Seq((3L, 2L)))
    } finally q1.stop()
    // restart: growth continues from recovered (rep, size); a smaller
    // doc_id arriving post-restart still takes over as rep
    val q2 = start()
    try {
      ms.addData(D(1, base, t0 + 2000))
      q2.processAllAvailable()
      assert(stored().values.toSeq === Seq((1L, 3L)))
    } finally q2.stop()
  }
}
