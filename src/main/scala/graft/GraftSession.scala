package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-oriented defaults: AQE (runtime re-plan +
  * skew-join splitting), shuffle partitions sized to the deployment (32
  * for local[32]; set to ~2-3x total cores on a real cluster), UTC
  * session time for deterministic event-time semantics, and graft's
  * SQL extensions (custom expressions) installed.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // DATA-AWARE partition sizing knobs (r15): on a cluster, set
      // SPARK_GRAFT_PARALLELISM_FIRST=false and
      // SPARK_GRAFT_ADVISORY_PARTITION_BYTES=128-256m so post-shuffle
      // partition counts track BYTES (guide §2.2: 100 MB-1 GB
      // partitions) instead of the core count. The LOCAL default
      // keeps Spark's parallelism-first coalescing, for a measured
      // reason: with bytes-based sizing on at sf0.1, per-round state
      // checkpoints coalesce below the iterative operators' pinned
      // edge partitioning and every round's join re-Exchanges the big
      // side — the driver-metered shuffle bytes rose 15-40% across
      // the whole rank family (g2/g7/g8/g11/g12/g17, s33, t6) with
      // advisory=1m, and 16m additionally serialized compute-dense
      // stages (d20 5.1→8.5 s). Bytes-based sizing is the right
      // at-scale policy exactly when the advisory target exceeds the
      // per-round state size, which 128m+ does.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE sort-merge→shuffled-hash rewrite: when every post-shuffle
      // partition's build side is under this RUNTIME-measured size,
      // the sorts are skipped (guide §3.1 — often faster when one
      // side is moderately small per partition; the runtime check
      // bounds the build-side memory, unlike the estimate-based
      // preferSortMergeJoin=false). Default off upstream; measured
      // here (see OPTIMIZATION_r15.md).
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP_BYTES", "0"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // graft tables are FIELD-ID mapped (Iceberg-style column
      // identity: RENAME resolves old files by id, a re-added dropped
      // name can never match retired bytes). Matching engages only
      // when a read's requested schema carries ids — every other
      // parquet read keeps plain name matching, so this is inert
      // outside graft catalogs
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      // streaming state that spills: the default provider keeps every
      // key on-heap (executor-memory-bound); RocksDB keeps working
      // state off-heap/on-disk with incremental checkpoints — the
      // provider a long-running large-state stream needs
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Changelog checkpointing (r15): commit uploads the per-batch
      // changelog instead of a full RocksDB snapshot — the per-batch
      // commit cost stops scaling with total state size (snapshots
      // still happen, asynchronously in the background). Same state
      // semantics, same provider; this is the documented production
      // setting for frequent small commits.
      .config("spark.sql.streaming.stateStore.rocksdb" +
        ".changelogCheckpointing.enabled", "true")
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)

  /** Local session for tests / exploration. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
