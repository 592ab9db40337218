package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) vocabulary TRAINING — the
  * tokenizer-training step of an LLM data pipeline, built on the
  * property that makes BPE tractable at corpus scale: after ONE
  * corpus-sized pass that collapses the text into a distinct-word
  * frequency dictionary, every merge round runs over the DICTIONARY
  * (vocabulary-sized, heavy-tailed, orders of magnitude smaller than
  * the corpus) weighted by the word counts. At 100 TB the corpus pass
  * is a plain shuffle-agg on the word; the R merge rounds touch only
  * the dict, so round cost is independent of corpus size.
  *
  * Determinism and oracle parity hinge on the tokenization ENCODING:
  * a word's token sequence is kept as a string with tokens joined by
  * TWO spaces and wrapped in single spaces (` t  h  e `). Applying a
  * merge (x, y) is then one non-regex `replace(s, " x  y ", " xy ")`
  * — both Spark and DuckDB scan left-to-right non-overlapping over
  * the ORIGINAL string, and because the matched 6-char-frame consumes
  * exactly one full separator on each side, the double-space invariant
  * survives every rewrite (` a  a  a  a ` → ` aa  aa `, ` a  a  a ` →
  * ` aa  a ` — greedy leftmost, the BPE convention). Tokens never
  * contain spaces, so a pattern can only match at separator-aligned
  * positions: no mid-token rewrites, byte-identical across engines.
  *
  * Each round's winning pair is a global argmax — ONE row collected
  * per round (count desc, then lexicographic pair: fully
  * deterministic), the same bounded-driver-state shape as the k-means
  * centroids; the merge table itself (R rows) is the output. Rounds
  * chain lazily on the dict DataFrame via `replace`, so the per-round
  * job is: map-side tokenize + pair explode, one partial-agg shuffle
  * on the pair, a distributed top-1. Nothing corpus-sized moves after
  * round 0.
  *
  * Reference scope: the reference pipeline
  * (StreamingJob.java:60-75) treats text fields as opaque strings;
  * tokenizer training is part of the training-data surface this
  * engine adds on top (SURVEY §2 x-family).
  */
object Bpe {
  /** Train `rounds` BPE merges over `textCol`. Words are lowercase
    * ASCII-letter runs (`[a-z]+` — the md5-basis oracle convention:
    * non-Latin text simply contributes no words, identically in both
    * engines). Returns the learned merge table:
    * (round, lhs, rhs, merged, pair_count), one row per round in
    * learning order. Fails loudly if the dictionary runs out of pairs
    * before `rounds` merges (a corpus too small for the requested
    * vocab is a config error, not a silent short table). */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "1 <= rounds <= 64")
    val spark = docs.sparkSession
    // corpus pass: distinct-word dict with counts, then the spaced
    // char encoding (` t  h  e `)
    var dict = docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "),
        array_join(regexp_extract_all(col("word"), lit("[a-z]"), lit(0)),
          "  "), lit(" ")).as("s"), col("cnt"))
      // truncate lineage HERE: the corpus shuffle-agg runs exactly once
      // and the merge rounds iterate over the stored vocabulary-sized
      // dict — without this, round r would re-tokenize the whole corpus
      .localCheckpoint()
    val merges = Seq.newBuilder[Row]
    for (r <- 1 to rounds) {
      val t = split(trim(col("s")), "  ")
      // adjacent pairs: zip the sequence against its own tail; slice
      // lengths clamp to 0 for single-token words (no pairs)
      val pairs = zip_with(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => struct(a.as("x"), b.as("y")))
      val top = dict
        .select(explode(pairs).as("p"), col("cnt"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      require(top.nonEmpty,
        s"bpe: dictionary exhausted at round $r of $rounds — " +
          "corpus too small for the requested merge count")
      val (x, y, c) = (top(0).getString(0), top(0).getString(1),
        top(0).getLong(2))
      merges += Row(r, x, y, x + y, c)
      dict = dict.withColumn("s",
        replace(col("s"), lit(s" $x  $y "), lit(s" ${x + y} ")))
      // bound the chained-replace plan depth: every 8 rounds the dict
      // is re-stored so analysis/codegen cost stays O(8) regardless of
      // the merge count (same cadence as the star-rounds checkpoints)
      if (r % 8 == 0 && r < rounds) dict = dict.localCheckpoint()
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Apply a learned merge table to the corpus, ZERO-shuffle: each
    * doc's words are re-encoded and every merge is applied in learning
    * order as a chained map-side `replace` inside a `transform` lambda,
    * then `aggregate` folds per-word token counts into the per-doc
    * total — no explode, no join, no exchange; the merge table is R
    * driver-side rows baked in as literals (the broadcast-reference
    * shape every trained operator here uses). Docs with no `[a-z]+`
    * words are dropped (they have no token count), mirroring the
    * oracle's inner join. Output: (idCol, n_words, bpe_tokens). */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "empty merge table")
    val words = regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))
    def ntok(w: org.apache.spark.sql.Column) = {
      val spaced = concat(lit(" "),
        array_join(regexp_extract_all(w, lit("[a-z]"), lit(0)), "  "),
        lit(" "))
      val applied = merges.foldLeft(spaced) { case (s, (x, y)) =>
        replace(s, lit(s" $x  $y "), lit(s" $x$y "))
      }
      size(split(trim(applied), "  ")).cast("long")
    }
    docs
      .where(size(words) > 0)
      .select(col(idCol),
        size(words).cast("long").as("n_words"),
        aggregate(transform(words, ntok(_)), lit(0L), _ + _).as("bpe_tokens"))
  }

  /** Collected merge table as (lhs, rhs) pairs in learning order —
    * R rows, the bounded driver state [[encodeTokenCounts]] needs. */
  def collectMerges(mergeTable: DataFrame): Seq[(String, String)] =
    mergeTable.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Shared oracle CTE prefix: word-frequency dict `w`, spaced
    * encoding `d1`, then one MATERIALIZED (pairs, winner, rewrite)
    * CTE triple per round — the winner CTE is referenced twice
    * (output + rewrite), and without materialization the chain would
    * re-expand exponentially in the round count, the kmeans-oracle
    * lesson. `word` rides through every rewrite so the final
    * `d{rounds+1}` still keys per-word tokenizations. */
  private def trainCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT pr[1] AS x, pr[2] AS y,
         |    CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |      i -> [t[i], t[i+1]])) AS pr, cnt
         |    FROM (SELECT string_split(trim(s), '  ') AS t, cnt FROM d$r))
         |  GROUP BY x, y),
         |m$r AS MATERIALIZED (SELECT x, y, c FROM p$r
         |  ORDER BY c DESC, x ASC, y ASC LIMIT 1),
         |d${r + 1} AS MATERIALIZED (SELECT word,
         |    replace(s, ' ' || m.x || '  ' || m.y || ' ',
         |      ' ' || m.x || m.y || ' ') AS s, cnt
         |  FROM d$r, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""w AS MATERIALIZED (SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |    FROM documents) WHERE word <> '' GROUP BY word),
       |d1 AS MATERIALIZED (SELECT word, ' ' ||
       |    array_to_string(regexp_extract_all(word, '[a-z]'), '  ') ||
       |    ' ' AS s, cnt FROM w),
       |$roundCtes""".stripMargin
  }

  /** The unrolled DuckDB mirror of [[trainMerges]]. */
  def trainMergesOracleSql(rounds: Int): String = {
    val union = (1 to rounds).map(r =>
      s"SELECT $r AS round, x AS lhs, y AS rhs, x || y AS merged, " +
        s"c AS pair_count FROM m$r").mkString(" UNION ALL ")
    s"""WITH ${trainCtes(rounds)}
       |SELECT CAST(round AS INT) AS round, lhs, rhs, merged, pair_count
       |FROM ($union) ORDER BY round""".stripMargin
  }

  /** Mirror of train-then-[[encodeTokenCounts]]: the final rewrite CTE
    * `d{rounds+1}` already holds every word's post-merge tokenization,
    * so encoding is one lookup join — per-doc word unnest, inner join
    * on the word, count/sum. */
  def encodeOracleSql(rounds: Int): String =
    s"""WITH ${trainCtes(rounds)},
       |wt AS (SELECT word, CAST(len(string_split(trim(s), '  ')) AS BIGINT)
       |    AS ntok FROM d${rounds + 1}),
       |dw AS (SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(ntok) AS BIGINT) AS bpe_tokens
       |FROM dw JOIN wt USING (word) WHERE word <> ''
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
