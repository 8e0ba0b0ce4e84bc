package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet tables from there. At cluster scale these would be catalog
  * tables; the single-file parquet layout is the test stand-in. Filters
  * and projections are left to Catalyst so parquet pushdown happens
  * naturally (verify via `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread an under-split source across the cluster's cores.
    *
    * The testdata parquet is one row group per file, so every scan is a
    * single task and per-row kernels (regex tokenize, JSON parse,
    * MinHash) run single-core no matter how many cores exist. A
    * round-robin repartition fixes that locally — and is deliberately
    * CONDITIONAL: at production scale a 100 TB table scans as tens of
    * thousands of splits, `getNumPartitions >= defaultParallelism`
    * already, and this is a no-op (never a 100 TB shuffle down to
    * core-count partitions, which an unconditional `repartition(n)`
    * would be). Round-robin is skew-proof and keyless; Catalyst still
    * pushes filters and column pruning below a Repartition node, so
    * scan pushdown is unaffected.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark reads only as a
    * long (`spark.sql.legacy.parquet.nanosAsLong=true`, set in
    * [[Session]]). Normalize to microsecond TimestampType by floor
    * division — the same ns→µs truncation DuckDB applies, so oracle
    * comparisons agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    val typed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
    // events feeds the JSON-parse pipelines (per-row get_json_object
    // dominates); documents feeds the text/MinHash kernels — both want
    // every core on the narrow stage
    spread(typed)
  }
  def documents(s: SparkSession, d: String): DataFrame =
    spread(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
