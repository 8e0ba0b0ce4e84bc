package graft

/** Plan inspector: runMain graft.Explain <queryName> [sfDir] prints the
  * formatted physical plan of a registered query — the tool for checking
  * pushdown (PushedFilters/ReadSchema), join strategies (broadcast vs
  * shuffle), and WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Session.get("graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"=== $name ===")
    df.explain("formatted")
    spark.stop()
  }
}
