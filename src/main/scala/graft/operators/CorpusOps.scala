package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline runs after
  * cleaning: deterministic train/val/test splits, vocabulary building,
  * intra-document repetition scoring (the MassiveText/Gopher-style
  * quality rule), and benchmark decontamination via n-gram overlap.
  *
  * All pure codegen'd column expressions and shuffle equi-joins; every
  * operator has an exact SQL mirror (md5 and IEEE division behave
  * identically in DuckDB), so all four are oracle-checkable.
  */
object CorpusOps {
  /** Word n-grams of `text` as strings; a doc shorter than `n` words
    * contributes its whole text as one gram (same convention as the
    * Jaccard-join shingles, so oracles share one mirror formula).
    * Backed by the ShingleStrings expression — one split per row; the
    * split/transform/slice formulation re-splits per gram (O(words^2)
    * per doc, 10x slower on the test corpus). */
  def wordGrams(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.shingle_strings(text, n)

  /** 32-hex-digit boundary string for cumulative weight w: an md5 hex
    * digest is uniform over [0, 16^32), so `md5 < boundary(w)` selects
    * a w-fraction of keys, identically in any engine that compares
    * lowercase hex strings lexicographically. */
  private def hexBoundary(w: Double): String = {
    require(w >= 0.0 && w <= 1.0)
    if (w >= 1.0) "g" // lexicographically above every hex digest
    else {
      val scaled = (BigDecimal(w) * BigDecimal(BigInt(1) << 128)).toBigInt
      val s = scaled.toString(16)
      "0" * (32 - s.length) + s
    }
  }

  /** Deterministic hash split: each row lands in exactly one named
    * split with the given weight, decided by md5(id:salt) — stable
    * across runs, engines, partitionings, and cluster sizes, which is
    * what makes held-out sets trustworthy. The assignment expression is
    * a pure codegen'd CASE over one md5 call (no shuffle at all). */
  def hashSplit(df: DataFrame, idCol: String, salt: String = "graft",
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val h = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val cum = weights.map(_._1).zip(weights.scanLeft(0.0)(_ + _._2).tail)
    val assign = cum.init.foldRight(lit(cum.last._1): Column) {
      case ((name, upper), acc) => when(h < lit(hexBoundary(upper)), name).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** SQL mirror of `hashSplit`'s assignment for a DuckDB oracle. */
  def hashSplitSql(idExpr: String, salt: String = "graft",
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): String = {
    val h = s"md5($idExpr || ':$salt')"
    val cum = weights.map(_._1).zip(weights.scanLeft(0.0)(_ + _._2).tail)
    cum.init.map { case (name, upper) =>
      s"WHEN $h < '${hexBoundary(upper)}' THEN '$name'"
    }.mkString("CASE ", " ", s" ELSE '${cum.last._1}' END")
  }

  /** Deterministic STRATIFIED sampling: each row survives iff
    * md5(id:salt) falls below its stratum's rate boundary — a per-
    * stratum Bernoulli sample that is exact-in-expectation, stable
    * across runs/engines/cluster sizes, and pure map-side (no shuffle,
    * no RNG state). The workhorse for corpus mixture re-weighting
    * ("keep 50% of en, 10% of everything else") at any scale: the
    * filter is a codegen'd CASE over one md5 and pushes down to the
    * scan. Unlisted strata use `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Double)], defaultRate: Double,
      salt: String = "graft-sample"): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0.0 && r <= 1.0))
    val h = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val boundary = rates.foldRight(lit(hexBoundary(defaultRate)): Column) {
      case ((stratum, rate), acc) =>
        when(col(strataCol) === stratum, lit(hexBoundary(rate))).otherwise(acc)
    }
    df.where(h < boundary)
  }

  /** SQL mirror of `stratifiedSample`'s predicate for a DuckDB oracle. */
  def stratifiedSampleSql(idExpr: String, strataExpr: String,
      rates: Seq[(String, Double)], defaultRate: Double,
      salt: String = "graft-sample"): String = {
    val cases = rates.map { case (stratum, rate) =>
      s"WHEN $strataExpr = '$stratum' THEN '${hexBoundary(rate)}'"
    }.mkString(" ")
    s"md5($idExpr || ':$salt') < (CASE $cases ELSE '${hexBoundary(defaultRate)}' END)"
  }

  /** LEAKAGE-SAFE train/val/test split: near-duplicate documents land
    * in the SAME split — a plain per-doc hash split scatters a near-dup
    * group across train and test, and evaluation silently inflates on
    * memorized copies. Assignment is the usual md5-range split keyed by
    * the near-dup GROUP (component min id; singletons key by their own
    * id), so the extra cost over [[hashSplit]] is exactly the near-dup
    * pair computation + one component pass — all shuffle equi-joins.
    *
    * The guarantee is only as strong as pair RECALL. `exactPairs =
    * true` (default) derives pairs from the exact prefix-filtered
    * Jaccard join — every pair at Jaccard >= `threshold` is found, so
    * the no-near-copy-across-splits claim is ABSOLUTE. `exactPairs =
    * false` routes through MinHash-LSH banding instead (the cheaper
    * 100 TB path) with a QUANTIFIED bound: the band count is DERIVED
    * from (`threshold`, `maxMissProb`) via [[Dedup.minhashBandsFor]] —
    * the s2 table-count discipline — so a pair at Jaccard >= threshold
    * is caught with probability >= 1 - maxMissProb (default 0.01; at
    * threshold 0.5 that is 72 bands x 4 rows = 288 hashes — the hash
    * budget is the stated recall's price, not a hopeful constant).
    * Use the LSH mode when the eval harness also decontaminates;
    * keep the exact default when the split IS the guarantee. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      salt: String = "graft",
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      exactPairs: Boolean = true, threshold: Double = 0.5,
      maxMissProb: Double = 0.01): DataFrame = {
    val pairs =
      if (exactPairs)
        Dedup.jaccardJoinPrefixRare(docs, idCol, textCol,
          shingleWords = 3, threshold = threshold)
      else {
        val rows = 4
        val bands = Dedup.minhashBandsFor(threshold, rows, maxMissProb)
        Dedup.minhashLsh(docs, idCol, textCol,
          shingleWords = 3, numHashes = bands * rows, bands = bands,
          threshold = threshold)
      }
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "__cid")
    val grouped = docs
      .join(comp, col(idCol) === col("__cid"), "left")
      .withColumn("__group", coalesce(col("comp"), col(idCol)))
    hashSplit(grouped, "__group", salt, weights)
      .drop("__cid", "comp", "__group")
  }

  /** Deterministic weighted sampling WITHOUT replacement (the
    * Efraimidis-Spirakis exponential-keys scheme, RNG replaced by a
    * hash): each row gets priority ln(u)/w with u uniform from the
    * first 13 hex digits of md5(id:salt) (exact in a double: 52-bit
    * integer + 0.5 over 2^52) and w its weight column; the k largest
    * priorities are the sample. Heavier rows win proportionally more
    * often, the choice is stable across runs/engines/partitionings,
    * and the plan is a distributed top-k (TakeOrderedAndProject:
    * per-partition heads merged on the driver — no global sort, no
    * shuffle of losers), so it runs at any corpus size.
    * Priorities of distinct (hash, weight) inputs differ by far more
    * than the ulp-level libm slack in ln, so selection is portable;
    * the priority itself stays out of the output. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "graft-wsample"): DataFrame = {
    val h = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 13),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val key = log(u) / col(weightCol).cast("double")
    // ln(u) < 0, so a negative weight would flip the priority POSITIVE
    // and always win — exclude non-positive weights (ES requires w > 0)
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol).asc)
      .limit(k)
      .drop("__wkey")
  }

  /** SQL mirror of `weightedSample`'s priority for a DuckDB oracle. */
  def weightedSampleSql(idExpr: String, weightExpr: String,
      salt: String = "graft-wsample"): String =
    s"ln((('0x' || substr(md5($idExpr || ':$salt'), 1, 13))::BIGINT + 0.5)" +
      s" / 4503599627370496.0) / $weightExpr"

  /** Deterministic SHARDED training-order shuffle: each row hashes to a
    * shard and gets a position within it by hash order — the layout a
    * training run reads (one file per shard, locally shuffled).
    * Reshuffling for a new epoch is just a new salt. Stable across
    * runs/engines/partitionings.
    *
    * Shard derivation uses the first 15 md5 hex digits (60 bits), so
    * the `% shards` bias is <= shards/2^60 — immeasurable for any
    * sane shard count (the old single-byte form made low shards ~1/256
    * heavier whenever 256 % shards != 0).
    *
    * Positions are TWO-PHASE, never one row_number task per shard: at
    * small shard counts each shard's rows are cut into contiguous
    * hash-prefix buckets (bucketing is monotone in the sort key `__h`,
    * so bucket order = hash order), ranked within (shard, bucket), and
    * shifted by the exclusive prefix of per-bucket counts — a
    * metadata-size frame (<= 16384 rows) joined back broadcast. Bucket
    * fan-out adapts down as shards grow (at >= 16384 shards the
    * per-shard window is already narrow and the offset join is
    * skipped), so per-task sorted input is bounded by
    * corpus/(shards*buckets) at every shard count. */
  def shardShuffle(df: DataFrame, idCol: String, shards: Int,
      salt: String = "graft-shuffle"): DataFrame = {
    require(shards >= 1 && shards <= (1 << 24), "1 <= shards <= 2^24")
    // keep shards * buckets <= 16384 so the offset frame stays metadata
    val buckets = math.max(1, math.min(256, (1 << 14) / shards))
    val h = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val keyed = df.withColumn("__h", h)
      .withColumn("shard",
        conv(substring(col("__h"), 1, 15), 16, 10).cast("long") % shards)
    if (buckets == 1) {
      val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
      keyed.withColumn("pos", row_number().over(w).cast("long")).drop("__h")
    } else {
      val sliced = keyed.withColumn("__b",
        floor(conv(substring(col("__h"), 1, 2), 16, 10).cast("long") *
          buckets / 256).cast("long"))
      val offsets = sliced.groupBy(col("shard"), col("__b"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__off", coalesce(sum(col("__n")).over(
          Window.partitionBy(col("shard")).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .drop("__n")
      val w = Window.partitionBy(col("shard"), col("__b"))
        .orderBy(col("__h"), col(idCol))
      sliced.join(broadcast(offsets), Seq("shard", "__b"))
        .withColumn("pos", (col("__off") + row_number().over(w)).cast("long"))
        .drop("__h", "__b")
    }
  }

  /** Deterministic PER-GROUP CAP: keep at most `k` rows of each group,
    * chosen by hash order (md5(id:salt)) — the class-balancing /
    * source-capping step of a training-data pipeline ("at most k docs
    * per domain"), stable across runs, engines, and partitionings, and
    * uniform within each group (the hash order is a random order that
    * every engine can replay).
    *
    * SKEW-SAFE by the [[shardShuffle]] two-phase discipline: corpora
    * are capped per group precisely BECAUSE one group dominates, so a
    * plain `row_number() OVER (PARTITION BY group)` — one sorted task
    * holding the dominant group's every row — is the wrong plan at
    * exactly the moment the operator matters. Rows instead slice into
    * 256 contiguous hash-prefix buckets inside each group (bucket
    * order = hash order), rank within (group, bucket), and shift by
    * the exclusive prefix of per-bucket counts; the counts frame is
    * groups x 256 rows. Per-task sorted input is bounded by
    * |group|/256 whatever the skew. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
      salt: String = "graft-cap"): DataFrame = {
    require(k >= 1)
    val h = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val sliced = df.withColumn("__h", h)
      .withColumn("__b",
        conv(substring(col("__h"), 1, 2), 16, 10).cast("long"))
    val offsets = sliced.groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    // buckets whose exclusive prefix already reaches k can be DROPPED
    // before the rank shuffle — the map-side prune that makes the cap
    // cheap on the dominant group (only ~k surviving rows rank)
    val w = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
    sliced.join(broadcast(offsets), Seq(groupCol, "__b"))
      .where(col("__off") < k)
      .withColumn("__r", col("__off") + row_number().over(w))
      .where(col("__r") <= k)
      .drop("__h", "__b", "__off", "__r")
  }

  /** SQL mirror of `capPerGroup`'s selection for a DuckDB oracle. */
  def capPerGroupSql(idExpr: String, groupExpr: String, k: Int,
      salt: String = "graft-cap"): String =
    s"""row_number() OVER (PARTITION BY $groupExpr
       |    ORDER BY md5($idExpr || ':$salt'), $idExpr) <= $k""".stripMargin

  /** SQL mirror of `shardShuffle`'s shard + ordering for an oracle. */
  def shardShuffleSql(idExpr: String, shards: Int,
      salt: String = "graft-shuffle"): (String, String) = {
    val h = s"md5($idExpr || ':$salt')"
    (s"(('0x' || substr($h, 1, 15))::BIGINT % $shards)", h)
  }

  /** Token-budget corpus MIXING: per stratum, keep documents in id
    * order until the stratum's token budget fills (a doc that straddles
    * the boundary stays in — budgets are soft caps, the x11 packing
    * convention) — the "N billion tokens per language/source" recipe
    * step.
    *
    * The cumulative sum is TWO-PHASE, never one window per stratum: a
    * stratum column like language has ~single-digit cardinality, so
    * `Window.partitionBy(stratum)` would pour an entire language —
    * tens of TB at corpus scale — through ONE sorted task. Instead the
    * id range of each stratum is cut into `buckets` contiguous slices
    * (bucketing is id-monotone, so slice order = id order); phase 1
    * windows only within (stratum, bucket), phase 2 shifts each slice
    * by the exclusive prefix of per-slice totals — a metadata-size
    * frame (strata x buckets rows) joined back broadcast. Per-task
    * input is bounded by stratum/buckets regardless of stratum
    * cardinality, and the kept set is identical to the single-window
    * form (the global cumsum at each row does not depend on where the
    * cuts fall). Requires a numeric id (the testdata convention);
    * id-range slicing keeps the cut assignment a pure map-side
    * expression. */
  def budgetMix(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, budget: Long, buckets: Int = 64): DataFrame = {
    val base = df.select(col(strataCol), col(idCol),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    twoPhaseCumsum(base, strataCol, idCol, "n_tokens", buckets)
      .where(col("__cum") - col("n_tokens") < budget)
      .select(col(strataCol), col(idCol), col("n_tokens"))
  }

  /** INCLUSIVE running sum of `valueCol` in `idCol` order within each
    * `partCol` group, as column `__cum` — computed TWO-PHASE so a
    * low-cardinality partition column (language, source, split) never
    * pours a whole group through one sorted task: the id range of each
    * group is cut into `buckets` contiguous slices (id-monotone, so
    * slice order = id order), phase 1 windows only within (group,
    * slice), phase 2 shifts each slice by the exclusive prefix of
    * per-slice totals — a metadata-size frame (groups x buckets rows)
    * joined back broadcast. The cumsum at each row is identical to the
    * single-window form (where the cuts fall cannot change a prefix
    * sum); per-task input is bounded by group/buckets. Requires a
    * numeric id (the testdata convention) so slice assignment stays a
    * pure map-side expression. Intermediate columns `__b`/`__off` are
    * dropped; callers consume and then drop `__cum`. */
  private def twoPhaseCumsum(base: DataFrame, partCol: String,
      idCol: String, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1)
    // per-group id range: one partial-aggregated groupBy, tiny result
    val ranges = base.groupBy(partCol)
      .agg(min(col(idCol)).cast("double").as("__idmin"),
        max(col(idCol)).cast("double").as("__idmax"))
    // contiguous id-range slice; ids may be skewed (slices then
    // unbalanced) but correctness never depends on balance
    val slice = least(lit(buckets - 1), greatest(lit(0),
      floor((col(idCol).cast("double") - col("__idmin")) * buckets /
        (col("__idmax") - col("__idmin") + 1d)))).cast("long")
    val sliced = base.join(broadcast(ranges), Seq(partCol))
      .withColumn("__b", slice).drop("__idmin", "__idmax")
    // exclusive prefix of per-slice totals — groups x buckets rows,
    // windowed per group over <= `buckets` rows
    val offsets = sliced.groupBy(col(partCol), col("__b"))
      .agg(sum(col(valueCol)).as("__btot"))
      .withColumn("__off", coalesce(sum(col("__btot")).over(
        Window.partitionBy(col(partCol)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__btot")
    val w = Window.partitionBy(col(partCol), col("__b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliced.join(broadcast(offsets), Seq(partCol, "__b"))
      .withColumn("__cum", col("__off") + sum(col(valueCol)).over(w))
      .drop("__b", "__off")
  }

  /** Sliding-window CHUNKING for context-length-bounded training/RAG:
    * each doc yields token windows of `size` starting every `stride`
    * tokens (overlap = size - stride), tail windows included. Pure
    * per-row codegen'd collection expressions + one posexplode — no
    * shuffle, embarrassingly parallel at any corpus size. Output rows
    * carry the window's token count and text md5 (checksum keeps the
    * verify payload narrow; callers wanting the text select it). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size)
    val toks = split(trim(col(textCol)), "\\s+")
    val chunks = transform(
      sequence(lit(0), greatest(org.apache.spark.sql.functions.size(toks) - 1, lit(0)),
        lit(stride)),
      st => array_join(slice(toks, st + 1, lit(size)), " "))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk")))
      .select(col(idCol), col("chunk_id"),
        org.apache.spark.sql.functions.size(split(col("chunk"), "\\s+"))
          .as("n_tokens"),
        md5(col("chunk")).as("chunk_md5"))
  }

  /** SENTENCE-AWARE chunking — the RAG splitter that never cuts
    * mid-sentence: the doc splits at `[.!?]+\s+` boundaries (a
    * deterministic regex both engines share; the delimiter is
    * consumed — a definition, not a loss), each sentence lands in
    * chunk `floor(tokens-before-it / budget)` (closed form over the
    * per-doc exclusive prefix sum — no iterative packer), and chunks
    * re-assemble in sentence order. A sentence longer than `budget`
    * gets its own chunk rather than being cut. Per-doc work is one
    * posexplode + one window over that doc's sentences — wide docs
    * sort locally, docs spread across the cluster.
    *
    * @return (id, chunk_id, n_sentences, n_tokens, chunk_md5) */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    require(budget > 0)
    val sents = split(trim(col(textCol)), "[.!?]+\\s+")
    val w = Window.partitionBy(col(idCol)).orderBy(col("idx"))
    df.select(col(idCol), posexplode(sents).as(Seq("idx", "s")))
      .where(length(trim(col("s"))) > 0)
      .withColumn("nt", org.apache.spark.sql.functions.size(
        split(trim(col("s")), "\\s+")).cast("long"))
      .withColumn("before", coalesce(
        sum("nt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("chunk_id", floor(col("before") / budget).cast("long"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum("nt").as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("s")))),
          x => x.getField("s")), " ")).as("chunk_md5"))
  }

  /** Token-budget PACKING: stream docs (ordered by `idCol` within each
    * `partitionCol` shard) into consecutive packs of ~`budget` tokens —
    * the sequence-packing step that batches variable-length docs into
    * fixed context windows. A doc joins the pack its exclusive prefix
    * sum lands in (`floor(prefix/budget)`): a closed form over the
    * running token sum, no iterative bin-packing driver loop. The
    * prefix sum is the shared TWO-PHASE cumsum (see [[budgetMix]]), so
    * a low-cardinality shard column — languages, splits — never sorts
    * a whole shard in one task. */
  def packByBudget(df: DataFrame, idCol: String, textCol: String,
      partitionCol: String, budget: Long, buckets: Int = 64): DataFrame = {
    require(budget > 0)
    val nTokens = org.apache.spark.sql.functions.size(
      split(trim(col(textCol)), "\\s+")).cast("long")
    val base = df.select(col(partitionCol), col(idCol),
      nTokens.as("n_tokens"))
    twoPhaseCumsum(base, partitionCol, idCol, "n_tokens", buckets)
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / budget).cast("long"))
      .drop("__cum")
  }

  /** Top-k vocabulary by token frequency (whitespace tokens,
    * lowercased). The global top-k is a TakeOrdered over the
    * partially-aggregated (token, freq) pairs — never a single-
    * partition sort of the full vocabulary; ranks are then assigned
    * among just the k winners. Ties break alphabetically. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val winners = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc).limit(k)
    winners.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token").asc)))
  }

  /** Corpus-level n-gram frequency table: total occurrences and
    * document frequency of the `k` most frequent word n-grams — the
    * most-duplicated-passages corpus audit (which boilerplate strings
    * dominate a web crawl, what decontamination should look for).
    * Two-stage aggregation: (doc, gram) counts first — doc-local, so
    * partial aggregation collapses each doc's repeats map-side — then
    * one row per distinct (doc, gram) feeds freq = sum / doc_freq =
    * count; the global top-k is TakeOrdered over partial per-partition
    * heaps, never a full sort of the gram table. */
  def ngramTopK(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 50): DataFrame = {
    val winners = df
      .select(col(idCol), explode(wordGrams(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy("gram").agg(sum("c").as("freq"), count(lit(1)).as("doc_freq"))
      .orderBy(col("freq").desc, col("gram").asc).limit(k)
    winners.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("gram").asc)))
  }

  /** COLLOCATION extraction by LIFT — P(ab) / (P(a)·P(b)), the
    * log-free core of pointwise mutual information (same ranking:
    * log is monotone), over whitespace bigrams: which word pairs
    * co-occur far above chance (multi-word expressions, named
    * entities — the phrases a tokenizer or a stopword list should
    * know about). Counts are exact; the score is one double
    * expression evaluated identically by both engines
    * (n_ab·Nuni²/(Nbi·Ca·Cb), left-associated). `minCount` prunes the
    * long tail BEFORE the unigram joins (prune-first: the joined
    * relation is the surviving bigrams, not the corpus), and the
    * global top-k is TakeOrdered, never a full sort. Corpus totals
    * ride as a one-row cross join.
    *
    * @return (term_a, term_b, n_ab, lift, rank), rank 1..k by
    *         (lift desc, term_a, term_b).
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1)
    val sp = split(trim(lower(col(textCol))), "\\s+")
    val toks = df.select(sp.as("__sp"))
    val uni = toks.select(explode(col("__sp")).as("t"))
    val uc = uni.groupBy("t").agg(count(lit(1)).as("c"))
    // guard: sequence(1, 0) would DESCEND for a 1-token doc
    val bi = toks.where(size(col("__sp")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__sp")) - 1),
        i => struct(element_at(col("__sp"), i).as("a"),
          element_at(col("__sp"), i + 1).as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
    val tot = uni.agg(count(lit(1)).as("nu"))
      .crossJoin(bi.agg(count(lit(1)).as("nb")))
    val bc = bi.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    val scored = bc
      .join(uc.select(col("t").as("a"), col("c").as("__ca")), "a")
      .join(uc.select(col("t").as("b"), col("c").as("__cb")), "b")
      .crossJoin(tot)
      .withColumn("lift",
        col("n_ab").cast("double") * col("nu") * col("nu") /
          (col("nb").cast("double") * col("__ca") * col("__cb")))
    scored
      .orderBy(col("lift").desc, col("a").asc, col("b").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("a").asc, col("b").asc)))
      .select(col("a").as("term_a"), col("b").as("term_b"), col("n_ab"),
        col("lift"), col("rank"))
  }

  /** Per-document repetition stats on word n-grams: total grams,
    * distinct grams, and the duplicate fraction — the published
    * repetition quality filter (heavily repeated passages predict
    * low-quality/boilerplate text). One codegen'd pass, no shuffle. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val grams = wordGrams(col(textCol), n)
    df.withColumn("total_ngrams", size(grams).cast("long"))
      .withColumn("distinct_ngrams", size(array_distinct(grams)).cast("long"))
      .withColumn("dup_ratio",
        (col("total_ngrams") - col("distinct_ngrams")).cast("double") /
          col("total_ngrams").cast("double"))
  }

  // PII patterns restricted to the Java-regex/RE2 common subset (no
  // lookaround, no backreferences) so Spark and DuckDB agree exactly
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrub: mask emails, then phone numbers, then IPv4 addresses
    * (staged in that order — an email can contain digits and dots, so
    * later patterns run on the already-masked text), counting matches
    * at each stage. Pure codegen'd regexp expressions, no shuffle;
    * masking is the standard pre-training scrub for web corpora. */
  def maskPii(df: DataFrame, textCol: String): DataFrame = {
    val t1 = regexp_replace(col(textCol), EmailRe, "[EMAIL]")
    val t2 = regexp_replace(t1, PhoneRe, "[PHONE]")
    val t3 = regexp_replace(t2, Ipv4Re, "[IP]")
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t1, lit(PhoneRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t2, lit(Ipv4Re), lit(0))))
      .withColumn("masked", t3)
  }

  /** Benchmark decontamination: for each corpus doc, how many of its
    * distinct word n-grams appear anywhere in `benchmark`. Corpus docs
    * with overlap 0 don't appear (inner join) — callers anti-join to
    * drop contaminated docs. Both sides explode to (gram) rows and
    * meet in a shuffle equi-join on the gram string: the exact shape
    * this runs at 100 TB (benchmark side is usually small enough to
    * broadcast, which Catalyst/AQE decides from its size). */
  def decontaminationOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val cg = corpus.select(col(idCol),
      explode(array_distinct(wordGrams(col(textCol), n))).as("gram"))
    val bg = benchmark.select(explode(wordGrams(col(textCol), n)).as("gram"))
      .distinct()
    cg.join(bg, "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
  }

  /** EXACT decontamination with a Bloom-prefiltered scan: return the
    * corpus rows sharing NO word n-gram with `benchmark`.
    *
    * The benchmark's distinct grams aggregate into ONE fixed-size bloom
    * bit array (mergeable map-side; the partial carries numBits/8 bytes
    * regardless of benchmark size) which broadcasts to the corpus scan,
    * where `bloom_might_contain` drops non-candidate grams BEFORE any
    * shuffle. Bloom false positives cannot corrupt the result — the
    * surviving candidates still exact-join against the real gram set,
    * and zero false negatives means no contaminated doc escapes. At
    * 100 TB this turns "join every corpus gram" into "join ~FP-rate of
    * them": the shuffle shrinks by ~the bloom's rejection rate while
    * the output stays bit-identical to the unfiltered anti-join. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    import graft.functions.GraftFunctions.{bloom_agg, bloom_might_contain}
    val bg = benchmark.select(explode(wordGrams(col(textCol), n)).as("gram"))
      .distinct()
    val bloom = bg.agg(bloom_agg(xxhash64(col("gram")), numBits, numHashes)
      .as("bloom"))
    // ONE bounded row (numBits/8 bytes) back to the driver, re-shipped
    // as a literal inside the probe predicate — the centroid-literal
    // pattern. Joining the bloom in instead (even broadcast) would
    // copy the bit array into EVERY joined gram row: measured 8 s vs
    // 0.9 s for this whole query at sf0.1.
    val bloomBytes = bloom.head.getAs[Array[Byte]]("bloom")
    val cg = corpus.select(col(idCol),
      explode(array_distinct(wordGrams(col(textCol), n))).as("gram"))
    val candidates = cg
      .where(bloom_might_contain(lit(bloomBytes), xxhash64(col("gram")), numHashes))
      .select(col(idCol), col("gram"))
    val contaminated = candidates.join(bg, "gram").select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
