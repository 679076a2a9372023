package graft

import org.apache.spark.sql.SparkSession

/** Single place to build a correctly-configured session.
  *
  * Local mode is `local[N]` for testing, but every knob here is chosen for
  * the 1000-executor case: AQE on (runtime coalescing + skew-join
  * splitting), broadcast threshold left at default so dim tables
  * auto-broadcast, shuffle partitions sized to the local core count
  * (at cluster scale AQE coalesces from a higher initial number).
  */
object GraftSession {
  def apply(appName: String = "graft",
            cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries INT64(TIMESTAMP(NANOS)) which Spark's vanilla
      // reader rejects; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // snapshot reads pass EXPLICIT file lists from the manifest (no
      // directory walk), so the default threshold of 32 paths launches a
      // pointless distributed listing JOB per scan leg — per-file status
      // on an explicit list is driver-cheap far beyond 32. Genuine
      // directory-discovery scans with thousands of paths still go
      // parallel above this.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      // InferFiltersFromGenerate adds size(g)>0/isnotnull(g) above every
      // explode; predicate pushdown then substitutes the generator's WHOLE
      // expression into those filters, so an expensive computed array
      // (shingles, token windows) is evaluated 3× per row instead of once
      // (measured 3-10× slowdowns on the dedup family, r8). Every explode
      // input in this library is already pre-filtered by a cheap
      // predicate, so the inferred filters only burn CPU.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
