package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Multimodal._

/** The real-decode contract: javax.imageio round-trips genuine PNG/BMP
  * bytes (dims, band count, exact solid-color channel means), undecodable
  * payloads fall back to the stub with zeroed image fields, and the whole
  * stage stays narrow.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  test("PNG and BMP fixtures decode to the seed arithmetic") {
    val rows = imageRoundtrip(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.nonEmpty)
    for ((id, r) <- rows) {
      assert(r.getString(1) == (if (id % 2 == 0) "png" else "bmp"))
      assert(r.getLong(2) == 8 + id % 9, s"width for doc $id")
      assert(r.getLong(3) == 8 + id % 7, s"height for doc $id")
      assert(r.getLong(4) == 3, s"bands for doc $id")
      assert(r.getLong(5) == id % 256, s"mean_r for doc $id")
      assert(r.getLong(6) == id * 7 % 256, s"mean_g for doc $id")
      assert(r.getLong(7) == id * 13 % 256, s"mean_b for doc $id")
    }
  }

  test("undecodable payload falls back to the stub with zero image fields") {
    val rec = MediaRecord(42L, "audio", "not an image".getBytes("UTF-8"))
    val viaImage = ImageIoDecoder.decode(rec)
    assert(viaImage == StubDecoder.decode(rec))
    assert(viaImage.width == 0 && viaImage.height == 0 &&
      viaImage.n_channels == 0 && viaImage.mean_r == 0)
    assert(viaImage.checksum60 > 0) // md5 path still runs
  }

  test("decode on a decodable payload keeps the payload checksum") {
    val img = imageFixtures(spark, sf).head()
    val real = ImageIoDecoder.decode(img)
    val stub = StubDecoder.decode(img)
    assert(real.checksum60 == stub.checksum60 && real.n_bytes == stub.n_bytes)
    assert(real.n_frames == 1L && real.width > 0)
  }

  test("mediaTable payloads (text bytes) are never decoded as images") {
    val cnt = decodeFeatures(spark, sf)
      .filter("width != 0 OR height != 0 OR n_channels != 0").count()
    assert(cnt == 0)
  }

  test("image round-trip is a pure narrow plan") {
    val plan = imageRoundtrip(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("aHash pairs: every planted even/odd twin found at hamming 0, pairs symmetric-free") {
    val dir = "/root/testdata/sf0.001"
    val out = Multimodal.imageAHashPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(out.nonEmpty)
    val pairSet = out.map(_._1).toSet
    assert(pairSet.size === out.length, "duplicate pair rows")
    out.foreach { case ((a, b), h) =>
      assert(a < b && h >= 0 && h <= Multimodal.AHashMaxHamming)
    }
    // ids 2k / 2k+1 encode identical images -> hamming 0 pair guaranteed
    val ids = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val twins = ids.filter(i => i % 2 == 0 && ids(i + 1)).map(i => (i, i + 1))
    assert(twins.nonEmpty)
    twins.foreach { t =>
      assert(out.exists(p => p._1 == t && p._2 === 0L), s"missing planted twin $t")
    }
  }
}
