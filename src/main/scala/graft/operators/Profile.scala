package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.kmv_distinct

/** Single-pass column profiler for data audits: null counts, distinct
  * estimates (graft's KMV sketch — works for any hashable type
  * including arrays/binary), and min/max, computed for every column in
  * ONE aggregation over the table (4 x n_cols aggregates, all partial
  * map-side). The 1-row result is reshaped driver-side — no data-sized
  * driver work. The first thing to run against an unknown 100 TB drop.
  */
object Profile {
  def profile(df: DataFrame, distinctK: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        kmv_distinct(c, distinctK).as(s"${f.name}__distinct"),
        min(c.cast("string")).as(s"${f.name}__min"),
        max(c.cast("string")).as(s"${f.name}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val out = cols.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString,
        row.getLong(i * 5), row.getLong(i * 5 + 1),
        math.round(row.getDouble(i * 5 + 2)),
        row.getString(i * 5 + 3), row.getString(i * 5 + 4))
    }
    val schema = StructType(Seq(
      StructField("column", StringType), StructField("type", StringType),
      StructField("n_rows", LongType), StructField("n_nulls", LongType),
      StructField("approx_distinct", LongType),
      StructField("min_value", StringType), StructField("max_value", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq), schema)
  }

  /** Windowed profile over event time — the "first audit" for a
    * continuously-arriving corpus. Unlike [[profile]] (whose 1-row
    * reshape is driver-side), the reshape here is a declarative
    * explode of per-column stat structs, so the SAME code runs on a
    * streaming DataFrame: per-window partials (count / null count /
    * KMV sketch / min / max — all mergeable) accumulate in the
    * streaming aggregation state and finalized windows emit in append
    * mode once the watermark passes. On a batch frame it computes the
    * identical result, which is what the batch-parity spec and the
    * SQL oracle check.
    *
    * Output: one row per (window, column) —
    * (window_start, column, type, n_rows, n_nulls, approx_distinct,
    * min_value, max_value). */
  def profileWindowed(df: DataFrame, tsCol: String, windowDuration: String,
      columns: Seq[String] = Nil, watermark: String = "0 seconds",
      distinctK: Int = 256): DataFrame = {
    val cols = df.schema.fields
      .filter(f => f.name != tsCol && (columns.isEmpty || columns.contains(f.name)))
    require(cols.nonEmpty, "profileWindowed: no columns to profile")
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        kmv_distinct(c, distinctK).as(s"${f.name}__distinct"),
        min(c.cast("string")).as(s"${f.name}__min"),
        max(c.cast("string")).as(s"${f.name}__max"))
    }
    val agged = df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("__g_w"))
      .agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { f =>
      struct(lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("type"),
        col(s"${f.name}__n").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        round(col(s"${f.name}__distinct")).cast("long").as("approx_distinct"),
        col(s"${f.name}__min").as("min_value"),
        col(s"${f.name}__max").as("max_value"))
    }
    agged.select(col("__g_w.start").as("window_start"),
        explode(array(entries: _*)).as("__g_p"))
      .select(col("window_start"), col("__g_p.*"))
  }

  /** Population-stability-index drift between two snapshots of one
    * column (two crawls, two days, two sources): PSI = Σ (p−q)·ln(p/q)
    * over a shared bucketing with add-one smoothing, so empty buckets
    * never divide by zero and the metric is symmetric-finite. The
    * industry thresholds (≈0.1 drifting / ≈0.25 shifted) apply to the
    * unquantized value; the output is quantized to 2^-20 steps so the
    * ulp-level sum-order noise cannot leak into comparisons.
    *
    * Cost: one groupBy per side on the bucket key (map-side combine,
    * at most |buckets| rows out), one tiny full-outer join, three
    * scalars collected. `bucket` is any deterministic expression —
    * the [[histogram]] bucket for numerics, the raw column for
    * categoricals. */
  def driftPsi(a: DataFrame, b: DataFrame, bucket: Column,
      metric: String): DataFrame = {
    val ca = a.groupBy(bucket.as("k")).agg(count(lit(1)).as("na"))
    val cb = b.groupBy(bucket.as("k")).agg(count(lit(1)).as("nb"))
    val j = ca.join(cb, Seq("k"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
    val t = j.agg(sum("na"), sum("nb"), count(lit(1))).head
    val (tna, tnb, kb) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val p = (col("na") + lit(1)).cast("double") / lit((tna + kb).toDouble)
    val q = (col("nb") + lit(1)).cast("double") / lit((tnb + kb).toDouble)
    j.select(((p - q) * log(p / q)).as("term"))
      .agg(floor(sum(col("term")) * lit(1048576.0)).cast("long").as("psi_q"))
      .select(lit(metric).as("metric"), col("psi_q"))
  }

  /** Robust per-group outlier audit — median/MAD, the estimator family
    * that survives the very outliers it is hunting (mean/stddev get
    * dragged by them). All arithmetic is EXACT: values quantized to
    * integer cents, "median" defined as the LOWER median (the element
    * at sorted position (n+1) div 2), deviations and the k·MAD fence
    * in BIGINTs — so the result is a pure function of the multiset,
    * independent of partitioning and float summation order, and a SQL
    * oracle can mirror it bit-for-bit.
    *
    * Cost: two sort-based window passes per group (exact medians ARE
    * a per-group sort — that is their price anywhere). Window sorts
    * spill, and groups spread across the cluster, so this holds up
    * for "many groups × large-but-sortable each"; for a handful of
    * colossal groups, the approximate path (a4's KLL quantiles) is
    * the 100 TB answer and this is the audit-grade one.
    *
    * @return per group: n, med_cents, mad_cents, n_outliers
    *         (|dev| > k·MAD; zero-MAD groups flag any nonzero dev),
    *         max_dev. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        round(col(valueCol) * 100).cast("long").as("cents"))
    val wg = Window.partitionBy("g")
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = in
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy(c)))
      .withColumn("nn", count(lit(1)).over(wg))
      .where(col("rn") === expr("(nn + 1) div 2"))
      .select(col("g"), col(c).as(out))
    val med = lowerMedian(base, "cents", "med_cents")
    val dev = base.join(med, "g")
      .withColumn("dev", abs(col("cents") - col("med_cents")))
    val mad = lowerMedian(dev.select("g", "dev"), "dev", "mad_cents")
    dev.join(mad, "g")
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n"),
        first("med_cents").as("med_cents"),
        first("mad_cents").as("mad_cents"),
        sum(when(col("dev") > lit(k.toLong) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max("dev").as("max_dev"))
  }

  /** PSI drift per event-time window against a fixed reference frame
    * — the CONTINUOUS monitor form of [[driftPsi]]: is this hour's
    * distribution sliding away from the baseline crawl? The bucket
    * domain is the union of reference and current buckets (a full
    * windows×buckets grid, so Laplace smoothing sees every bucket
    * either side ever saw — no window silently loses support);
    * per-side counts are one partially-aggregated groupBy each, the
    * grid and the reference counts broadcast (both are tiny — buckets
    * × windows), and the output is one row per window regardless of
    * input size. Same fixed-point psi_q quantization as driftPsi. */
  def driftPsiWindowed(df: DataFrame, tsCol: String, windowDur: String,
      reference: DataFrame, bucket: Column, metric: String): DataFrame = {
    val ref = reference.groupBy(bucket.as("k")).agg(count(lit(1)).as("na"))
    val cur = df
      .groupBy(window(col(tsCol), windowDur).getField("start").as("ws"),
        bucket.as("k"))
      .agg(count(lit(1)).as("nb"))
    val wins = cur.select("ws").distinct()
    val ks = ref.select("k").unionByName(cur.select("k")).distinct()
    val glob = ref.agg(sum("na").as("tna")).crossJoin(
      ks.agg(count(lit(1)).as("kb")))
    val grid = wins.crossJoin(broadcast(ks))
      .join(broadcast(ref), Seq("k"), "left")
      .join(cur, Seq("ws", "k"), "left")
      .na.fill(0L, Seq("na", "nb"))
    val tnb = grid.groupBy("ws").agg(sum("nb").as("tnb"))
    val j = grid.join(broadcast(tnb), Seq("ws")).crossJoin(broadcast(glob))
    val p = (col("na") + lit(1)).cast("double") /
      (col("tna") + col("kb")).cast("double")
    val q = (col("nb") + lit(1)).cast("double") /
      (col("tnb") + col("kb")).cast("double")
    // per-TERM fixed-point quantization (not floor-of-sum): the
    // window PSI is an exact integer sum of per-bucket floors, so
    // shuffle arrival order cannot wiggle the last ulp of a double
    // accumulation — deterministic across runs, engines, partitions
    j.select(col("ws"), col("tnb"),
        floor(((p - q) * log(p / q)) * lit(1048576.0)).cast("long")
          .as("term_q"))
      .groupBy("ws")
      .agg(sum(col("term_q")).as("psi_q"), max("tnb").as("n_rows"))
      .select(lit(metric).as("metric"),
        date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("psi_q"), col("n_rows"))
  }

  /** Equi-width histogram of a numeric column: one groupBy on the
    * bucket index (map-side combine reduces the shuffle to at most
    * `bins` rows per partition), out-of-range values clamp into the
    * edge buckets, nulls drop. Empty buckets are omitted — the result
    * is at most `bins` rows however large the table. */
  def histogram(df: DataFrame, column: String, bins: Int,
      lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo)
    val width = (hi - lo) / bins
    val b = least(greatest(
        floor((col(column) - lit(lo)) * lit(bins) / lit(hi - lo)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.filter(col(column).isNotNull)
      .groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bucket") * lit(width))
      .withColumn("bin_hi", lit(lo) + (col("bucket") + 1) * lit(width))
      .select("bucket", "bin_lo", "bin_hi", "n")
  }

  /** FUNCTIONAL-DEPENDENCY profiling — for each candidate FD a → b,
    * the exact g₃ violation count (Σ over a-groups of rows outside
    * the group's majority b — the minimum deletions that would make
    * the FD hold; the standard approximate-FD error measure) plus
    * group/row counts and the holds verdict. One (a, b) count
    * aggregation then one a-level aggregation per pair — both
    * map-side reducible; NULL is a value (a determinant group and a
    * dependent value like any other, identically in both engines).
    * The discovery workhorse behind key detection, denormalization
    * audits, and schema inference on an unknown 100 TB corpus. */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    // SINGLE PASS over however many candidate pairs (r11): explode one
    // (pair-index, determinant-value, dependent-value) struct per pair
    // per row, then ONE (i, k, v) aggregation — k pairs previously
    // cost k scans of the table; at 100 TB the scans dominate, so one
    // k×-wider map-side-reduced shuffle is the right trade. Values
    // ride as strings (canonical casts are injective per column, and
    // the pair index keeps columns apart), preserving exact counts;
    // NULL stays a value. The per-pair rollup then mirrors the
    // original two-level aggregation unchanged.
    val items = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("i"), col(a).cast("string").as("k"),
        col(b).cast("string").as("v"))
    }
    val dets = array(pairs.map(p => lit(p._1)): _*)
    val deps = array(pairs.map(p => lit(p._2)): _*)
    df.select(explode(array(items: _*)).as("p"))
      .select(col("p.i").as("__i"), col("p.k").as("__k"),
        col("p.v").as("__v"))
      .groupBy("__i", "__k", "__v")
      .agg(count(lit(1)).as("__n"))
      .groupBy("__i", "__k")
      .agg(sum("__n").as("__na"), max("__n").as("__mx"))
      .groupBy("__i")
      .agg(sum("__na").as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(col("__na") - col("__mx")).as("violations"))
      .select(element_at(dets, col("__i") + 1).as("determinant"),
        element_at(deps, col("__i") + 1).as("dependent"),
        col("n_rows"), col("n_groups"), col("violations"),
        (col("violations") === 0).as("holds"))
  }

  /** The DuckDB mirror of [[fdProfile]] — one UNION ALL block per
    * candidate pair, same two-level aggregation. */
  def fdOracleSql(table: String, pairs: Seq[(String, String)]): String = {
    val blocks = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS determinant, '$b' AS dependent,
         |  CAST(sum(na) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(na - mx) AS BIGINT) AS violations,
         |  sum(na - mx) = 0 AS holds
         |FROM (SELECT k, sum(n) AS na, max(n) AS mx
         |  FROM (SELECT $a AS k, $b AS v, count(*) AS n FROM $table
         |    GROUP BY 1, 2) GROUP BY 1)""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n",
      "\nORDER BY determinant, dependent")
  }

  /** K-ANONYMITY audit (Sweeney, IJUFKS 2002) over a quasi-identifier
    * combination — the governance gate a training-data release needs
    * before rows with demographic-ish attributes ship: every
    * equivalence class (distinct quasi-identifier tuple) smaller than
    * `k` re-identifies its members to within `n_rows` candidates.
    * Emits one row per class with its size and the at-risk flag; the
    * release's k-anonymity is the min class size (spec-checked).
    * One hash aggregation — the audit costs a groupBy however wide
    * the table, and the quasi columns arrive pre-bucketed by the
    * caller (generalization IS the mitigation, so the caller owns it).
    *
    * @return (quasi..., n_rows, at_risk) — at_risk iff n_rows < k
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need quasi cols and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .select(quasiCols.map(col) ++ Seq(col("n_rows"),
        (col("n_rows") < k).as("at_risk")): _*)
  }

  /** JOIN-KEY SKEW AUDIT — the "should this key be salted?" report a
    * 100 TB join plan needs BEFORE it runs: per candidate key column,
    * group-size extremes and the heaviest key's row share (integer
    * ppm, float-free: exact max·10⁶ div rows below 10¹² rows, and the
    * denominator-first max div (rows div 10⁶) above — within 1 ppm,
    * and never the silent signed-64 overflow the exact product would
    * hit past ~9.2·10¹² heavy-key rows). A share above `riskPpm` marks the column: one
    * reducer would own that fraction of the shuffle, the regime where
    * salting / AQE skew-join pays. Two map-side-reducible
    * aggregations per column (the fdProfile shape) — the audit costs
    * a groupBy per candidate however wide the table; ties on the
    * heaviest key break to the smallest key string.
    *
    * @return (column, n_rows, n_keys, max_group, top_key, share_ppm,
    *         at_risk) — one row per audited column.
    */
  def skewAudit(df: DataFrame, keyCols: Seq[String],
      riskPpm: Long = 100000L): DataFrame = {
    require(keyCols.nonEmpty && riskPpm >= 1, "need key cols and riskPpm >= 1")
    // SINGLE PASS (r11): one (column, key) explode + one aggregation
    // instead of a full table scan per audited column — the fdProfile
    // trade, same exact output
    val items = keyCols.map { c =>
      struct(lit(c).as("c"),
        coalesce(col(c).cast("string"), lit("<null>")).as("k"))
    }
    df.select(explode(array(items: _*)).as("p"))
      .select(col("p.c").as("__c"), col("p.k").as("__k"))
      .groupBy("__c", "__k")
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("__c").as("column"))
        .agg(sum("__n").as("n_rows"), count(lit(1)).as("n_keys"),
          max("__n").as("max_group"),
          min(struct((-col("__n")).as("nn"), col("__k").as("k")))
            .as("__pick"))
        .select(col("column"), col("n_rows"), col("n_keys"),
          col("max_group"), col("__pick.k").as("top_key"),
          // exact ppm while max·10⁶ fits signed 64-bit (any table under
          // 10¹² rows — the product is then < 10¹⁸); beyond that, divide
          // the denominator first: ≤1 ppm absolute error instead of a
          // silent signed overflow flipping the share negative and
          // suppressing the at_risk flag on exactly the joins the audit
          // exists for
          expr("CASE WHEN n_rows < 1000000000000L " +
            "THEN max_group * 1000000L div n_rows " +
            "ELSE max_group div (n_rows div 1000000L) END")
            .as("share_ppm"))
        .withColumn("at_risk", col("share_ppm") > riskPpm)
  }

  /** DuckDB mirror of [[skewAudit]] — one block per column, same
    * integer ppm and the same (count DESC, key ASC) argmax. */
  def skewAuditOracleSql(table: String, keyCols: Seq[String],
      riskPpm: Long = 100000L): String = {
    val blocks = keyCols.map { c =>
      // mirrors the engine's overflow-guarded branch: exact ppm below
      // 10¹² rows, denominator-first division above (operands stay
      // non-negative on both branches, so DuckDB // == Spark div)
      val ppm = s"CASE WHEN sum(n) < 1000000000000 " +
        s"THEN max(n) * 1000000 // sum(n) " +
        s"ELSE max(n) // (sum(n) // 1000000) END"
      s"""SELECT '$c' AS "column", CAST(sum(n) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(max(n) AS BIGINT) AS max_group,
         |  first(k ORDER BY n DESC, k) AS top_key,
         |  CAST($ppm AS BIGINT) AS share_ppm,
         |  $ppm > $riskPpm AS at_risk
         |FROM (SELECT COALESCE(CAST($c AS VARCHAR), '<null>') AS k, count(*) AS n
         |  FROM $table GROUP BY 1)""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** DuckDB mirror of [[kAnonymity]]: same grouping over the same
    * pre-bucketed quasi expressions. */
  def kAnonymityOracleSql(fromSql: String, quasiCols: Seq[String], k: Int)
      : String = {
    val qs = quasiCols.mkString(", ")
    s"""SELECT $qs, CAST(count(*) AS BIGINT) AS n_rows,
      |  count(*) < $k AS at_risk
      |FROM ($fromSql) GROUP BY $qs
      |ORDER BY ${quasiCols.map(c => s"$c NULLS FIRST").mkString(", ")}""".stripMargin
  }
}
