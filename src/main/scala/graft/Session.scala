package graft

import org.apache.spark.sql.SparkSession

/** Single place for engine session defaults, shared by Verify, Bench and
  * the test suites.
  *
  * Scale posture: shuffle partitions default to the local core count
  * (the driver contract pins local mode); on a real cluster this knob —
  * and `spark.sql.files.maxPartitionBytes` — are sized so a shuffle
  * partition fits in executor memory. AQE is on so skewed shuffles are
  * split and tiny partitions coalesced at runtime, which is the setting
  * that carries a plan from sf0.1 to 100 TB unchanged.
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors()).toString)

  /** Shuffle width: defaults to the core count; SPARK_GRAFT_SHUFFLE
    * overrides it independently of local[n] — the knob a real cluster
    * sizes to the target SF (per-task aggregate/join state is
    * data÷width; a fixed width means per-task state grows with scale,
    * which is what the sf3 decade probes measure when a ratio exceeds
    * the data growth).
    */
  def shufflePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // Scan-split open-cost floor. The synthetic fixtures compress to a
      // few MB, so Spark's 4 MB default floor caps even a 6 M-row table
      // at 1-2 scan partitions; SPARK_GRAFT_OPEN_COST=65536 restores
      // 32-way scans on multi-row-group fixtures (sf1 layout). Default
      // stays Spark's: on SINGLE-row-group files (the driver's sf0.1
      // data) extra splits are empty and cost a measured ~2.5%, and at
      // cluster scale files are >=128 MB so the floor never binds.
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (4 * 1024 * 1024).toString))
      // events.parquet carries TIMESTAMP(NANOS); Spark only reads it as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB-backed streaming state: state spills to local disk
      // instead of living on the JVM heap — the setting that lets the
      // stateful operators (dedup, CEP, stream-stream joins) carry
      // 100 TB-scale key cardinalities. Default on; SPARK_GRAFT_HDFS_STATE=1
      // reverts to the in-memory provider.
      .config("spark.sql.streaming.stateStore.providerClass",
        if (sys.env.get("SPARK_GRAFT_HDFS_STATE")
            .exists(v => v == "1" || v.equalsIgnoreCase("true")))
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
        else
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      // catalog tables (bucketed layouts) land outside the repo tree
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))

  def get(appName: String): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // engine SQL surface (tokenize, tokenize_explode, word_tiles,
    // struct_sort_project, md5_prefix60, minhash_sig, simhash_fp,
    // word_shingles, long_array_dot, sketch aggregates); idempotent
    org.apache.spark.sql.graftexpr.GraftFunctions.registerAll(s)
    s
  }
}
