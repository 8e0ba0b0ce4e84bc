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

  /** Shuffle width: explicit SPARK_GRAFT_SHUFFLE wins, then the
    * scale-factor auto-default installed by [[sizeShuffleFor]], then
    * the core count. The knob a real cluster sizes to the target SF:
    * per-task aggregate/join state is data÷width, so a FIXED width
    * means per-task state grows linearly with scale — the one
    * super-linear residue the r14 sf3 basket probe measured (50→168
    * MB/task at 3× data, width 32; width 96 restored linear CPU).
    */
  def shufflePartitions: String =
    sys.env.get("SPARK_GRAFT_SHUFFLE")
      .orElse(sys.props.get("graft.shuffle.auto"))
      .getOrElse(cpus)

  /** Scale factor parsed off an sf directory name ("…/sf0.1" → 0.1);
    * None when the basename isn't sf-tagged (caller keeps the default).
    */
  def sfOf(dir: String): Option[Double] = {
    val base = new java.io.File(dir).getName
    if (base.startsWith("sf"))
      scala.util.Try(base.drop(2).toDouble).toOption.filter(_ > 0)
    else None
  }

  /** Auto shuffle width for a scale factor: `cpus × max(1, ⌈3·sf⌉)` —
    * 32 at the driver scales (sf ≤ 0.1), 96 at sf1, 288 at sf3. The
    * multiplier tracks data linearly above the bench baseline so
    * per-task shuffle state stays bounded (the cluster-realistic
    * configuration the basket probe's width-96 control demonstrated),
    * while the sf ≤ 0.33 floor keeps tasks at least core-count-wide.
    */
  def autoShuffleWidth(sfDir: String): Int = {
    val mult = sfOf(sfDir).map(sf => math.max(1, math.ceil(3 * sf).toInt))
      .getOrElse(1)
    cpus.toInt * mult
  }

  /** Install the sf-derived width as the session default (called by
    * Bench/Verify BEFORE the session is built; explicit
    * SPARK_GRAFT_SHUFFLE still overrides). Returns the width the next
    * session will use, for artifact recording.
    */
  def sizeShuffleFor(sfDir: String): Int = {
    sys.props("graft.shuffle.auto") = autoShuffleWidth(sfDir).toString
    shufflePartitions.toInt
  }

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
