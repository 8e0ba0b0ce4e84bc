package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** FileTransport: fixed-topic and dynamic-topic (K2) delivery. */
class TransportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr
  import org.apache.spark.sql.functions._

  test("dynamic-topic writeStream fans records out per topic column") {
    val root = Files.createTempDirectory("transport").toString
    val t = new FileTransport(root)
    // seed an input topic
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    Files.writeString(java.nio.file.Paths.get(s"$root/in/a.jsonl"),
      "x1\nx2\ny1\n")
    val routed = t.readStream(spark, "in")
      .withColumn("topic",
        when($"value".startsWith("x"), lit("topic_x")).otherwise(lit("topic_y")))
    val q = t.writeStream(routed, None, s"$root/ckpt")
    q.processAllAvailable(); q.stop()
    assert(t.read(spark, "topic_x").count() === 2)
    assert(t.read(spark, "topic_y").count() === 1)
  }
}
