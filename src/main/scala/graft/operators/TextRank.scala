package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the corpus: BM25 for a literal query
  * set and per-document TF-IDF top terms — the retrieval/feature side
  * of a training-data pipeline (RAG indexing, near-duplicate query
  * mining, keyword extraction).
  *
  * Plan shape at 100 TB: the corpus-side work is two shuffle
  * aggregations with map-side combine (doc length by doc_id; term
  * frequency by (doc_id, term) — the latter pre-filtered to query
  * terms for BM25, so only matching postings ever shuffle). Query
  * terms and their document frequencies are tiny and broadcast. No
  * driver-side loops; the only collected state is two scalar corpus
  * statistics (bounded like the IVF centroid sample).
  *
  * Outputs carry (query/doc, rank, id) but NOT the floating score:
  * scores of distinct (tf, dl, df) inputs differ by far more than any
  * last-ulp libm divergence between engines, and identical inputs give
  * identical scores within each engine, so rank + id tie-break is
  * engine-portable while a raw double column would not be.
  */
object TextRank {
  private def tokens(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")

  /** BM25 top-k docs per query; `queries` is a literal (id, terms) set.
    * N and avgdl are taken over docs with at least one token. */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = tokens(docs, idCol, textCol)
    val dl = t.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val statsRow = dl.agg(count(lit(1)), sum(col("dl"))).head
    if (statsRow.getLong(0) == 0L) {
      // no tokenized documents: every query retrieves nothing
      return docs.sparkSession.emptyDataFrame
        .select(lit(0).as("query_id"), lit(0).as("rank"),
          lit(0L).as(idCol)).limit(0)
    }
    val (nDocs, totTok) = (statsRow.getLong(0), statsRow.getLong(1))
    val avgdl = totTok.toDouble / nDocs
    val allTerms = queries.flatMap(_._2).distinct
    val qt = queries.flatMap { case (qid, ts) => ts.map(tm => (qid, tm)) }
      .toDF("query_id", "term")
    val tf = t.filter(col("term").isInCollection(allTerms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .join(broadcast(qt), "term")
      .withColumn("s",
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
    val agg = scored.groupBy(col("query_id"), col(idCol))
      .agg(sum("s").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    agg.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol))
  }

  /** PHRASE-constrained BM25: rank only documents containing each
    * query's terms CONTIGUOUSLY, scored by phrase frequency — the
    * positional-index retrieval step ("exact phrase" search) a bag-of-
    * words BM25 cannot express.
    *
    * Positional postings: one posexplode per doc, immediately filtered
    * to the phrase vocabulary, so only candidate (doc, term, pos) rows
    * ever shuffle. The phrase constraint is the classic positional
    * intersection as ONE aggregation — each posting joins the (tiny,
    * broadcast) phrase slots it could fill, votes for the anchor
    * position `pos - slot`, and an anchor holding ALL slots is a real
    * occurrence (duplicate terms in a phrase work: each slot must be
    * present distinctly). BM25 then scores with tf = occurrence count
    * and df = phrase document frequency. No windows except the final
    * per-query top-k; every stage is a shuffle agg or broadcast join,
    * the shape that holds at corpus scale. Rank-only output, same
    * libm-portability argument as [[bm25TopK]]. */
  def bm25PhraseTopK(docs: DataFrame, phrases: Seq[(Int, Seq[String])],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_._2.nonEmpty))
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = phrases.flatMap(_._2).distinct
    val pos = docs.select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+"))
          .as(Seq("pos", "term")))
      .filter(col("term") =!= "" && col("term").isInCollection(allTerms))
    val pt = phrases.flatMap { case (qid, ts) =>
        ts.zipWithIndex.map { case (tm, off) => (qid, off, tm) } }
      .toDF("query_id", "off", "term")
    val qlen = phrases.map { case (qid, ts) => (qid, ts.length) }
      .toDF("query_id", "qlen")
    val occs = pos.join(broadcast(pt), "term")
      .groupBy(col("query_id"), col(idCol),
        (col("pos") - col("off")).as("anchor"))
      .agg(countDistinct(col("off")).as("nslots"))
      .join(broadcast(qlen), "query_id")
      .where(col("nslots") === col("qlen"))
    val pf = occs.groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("pf"))
    val dfq = pf.groupBy("query_id").agg(count(lit(1)).as("df"))
    val t = tokens(docs, idCol, textCol)
    val dl = t.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val statsRow = dl.agg(count(lit(1)), sum(col("dl"))).head
    if (statsRow.getLong(0) == 0L) {
      return docs.sparkSession.emptyDataFrame
        .select(lit(0).as("query_id"), lit(0).as("rank"),
          lit(0L).as(idCol)).limit(0)
    }
    val (nDocs, totTok) = (statsRow.getLong(0), statsRow.getLong(1))
    val avgdl = totTok.toDouble / nDocs
    val scored = pf
      .join(broadcast(dfq), "query_id")
      .join(dl, idCol)
      .withColumn("score",
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("pf") * lit(k1 + 1)) /
          (col("pf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol))
  }

  /** PROXIMITY-constrained BM25: rank only documents where ALL of a
    * query's terms co-occur within a `window`-token span (unordered —
    * the middle ground between bag-of-words BM25 and exact-phrase
    * [[bm25PhraseTopK]]), scored by the number of qualifying spans.
    *
    * A span qualifies at anchor position p (any query-term posting)
    * when every distinct query term has a posting in [p, p+window).
    * Postings are pre-filtered to the query vocabulary before any
    * shuffle; the span check is ONE self-join on (query, doc) with a
    * banded position predicate — per-doc candidate postings are few
    * (query terms only), so the join stays narrow at corpus scale.
    * tf = qualifying anchor count, df = qualifying document count;
    * rank-only output, same libm-portability argument as the other
    * retrieval entries. */
  def bm25ProximityTopK(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      window: Int, k: Int, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && queries.nonEmpty && queries.forall(_._2.nonEmpty))
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val pos = docs.select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+"))
          .as(Seq("pos", "term")))
      .filter(col("term") =!= "" && col("term").isInCollection(allTerms))
    val qt = queries.flatMap { case (qid, ts) => ts.distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val qlen = queries.map { case (qid, ts) => (qid, ts.distinct.length) }
      .toDF("query_id", "qlen")
    val an = pos.join(broadcast(qt), "term")
      .select(col("query_id"), col(idCol), col("pos"), col("term"))
    val a = an.select(col("query_id"), col(idCol), col("pos").as("__pa"))
    val bb = an.select(col("query_id"), col(idCol), col("pos").as("__pb"),
      col("term").as("__tb"))
    val occs = a.join(bb, Seq("query_id", idCol))
      .where(col("__pb") >= col("__pa") && col("__pb") < col("__pa") + window)
      .groupBy(col("query_id"), col(idCol), col("__pa"))
      .agg(countDistinct(col("__tb")).as("nterm"))
      .join(broadcast(qlen), "query_id")
      .where(col("nterm") === col("qlen"))
    val pf = occs.groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("pf"))
    val dfq = pf.groupBy("query_id").agg(count(lit(1)).as("df"))
    val t = tokens(docs, idCol, textCol)
    val dl = t.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val statsRow = dl.agg(count(lit(1)), sum(col("dl"))).head
    if (statsRow.getLong(0) == 0L) {
      return docs.sparkSession.emptyDataFrame
        .select(lit(0).as("query_id"), lit(0).as("rank"),
          lit(0L).as(idCol)).limit(0)
    }
    val (nDocs, totTok) = (statsRow.getLong(0), statsRow.getLong(1))
    val avgdl = totTok.toDouble / nDocs
    val scored = pf
      .join(broadcast(dfq), "query_id")
      .join(dl, idCol)
      .withColumn("score",
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("pf") * lit(k1 + 1)) /
          (col("pf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol))
  }

  /** ORDERED phrase-with-slop BM25 (Lucene's slop in windowed form):
    * rank documents containing the query terms IN ORDER at strictly
    * increasing positions within a `window`-token span — looser than
    * exact-phrase [[bm25PhraseTopK]] (gaps allowed), stricter than
    * unordered [[bm25ProximityTopK]] (order enforced). tf = distinct
    * chain START positions, df = qualifying docs.
    *
    * Each query compiles to a CHAIN of equi-joins over the
    * vocabulary-filtered positional postings — slot i joins slot i-1
    * on (doc, position-after, within-window). Query sets are literal
    * and small, so the per-query plans union; every join is a shuffle
    * equi-join on the doc key over postings already pre-filtered to
    * the query's own terms, the shape that holds at corpus scale.
    * Rank-only output, the usual libm-portability argument. */
  def bm25SlopTopK(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      window: Int, k: Int, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && queries.nonEmpty && queries.forall(_._2.nonEmpty))
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val pos = docs.select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+"))
          .as(Seq("pos", "term")))
      .filter(col("term") =!= "" && col("term").isInCollection(allTerms))
    val perQuery: Seq[DataFrame] = queries.map { case (qid, terms) =>
      var chain = pos.filter(col("term") === terms.head)
        .select(col(idCol), col("pos").as("__p0"), col("pos").as("__pl"))
      terms.drop(1).foreach { t =>
        val nxt = pos.filter(col("term") === t)
          .select(col(idCol).as("__nid"), col("pos").as("__pn"))
        chain = chain.join(nxt,
            col(idCol) === col("__nid") && col("__pn") > col("__pl") &&
              col("__pn") - col("__p0") < window)
          .select(col(idCol), col("__p0"), col("__pn").as("__pl"))
      }
      chain.groupBy(col(idCol))
        .agg(countDistinct(col("__p0")).as("pf"))
        .withColumn("query_id", lit(qid))
    }
    val pf = perQuery.reduce(_ unionByName _)
    val dfq = pf.groupBy("query_id").agg(count(lit(1)).as("df"))
    val t = tokens(docs, idCol, textCol)
    val dl = t.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val statsRow = dl.agg(count(lit(1)), sum(col("dl"))).head
    if (statsRow.getLong(0) == 0L) {
      return docs.sparkSession.emptyDataFrame
        .select(lit(0).as("query_id"), lit(0).as("rank"),
          lit(0L).as(idCol)).limit(0)
    }
    val (nDocs, totTok) = (statsRow.getLong(0), statsRow.getLong(1))
    val avgdl = totTok.toDouble / nDocs
    val scored = pf
      .join(broadcast(dfq), "query_id")
      .join(dl, idCol)
      .withColumn("score",
        log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("pf") * lit(k1 + 1)) /
          (col("pf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol))
  }

  /** Language-model quality scoring: a bigram LM trained ON the corpus
    * scores every document by mean log-probability, and the `bottomK`
    * most-surprising docs surface for review — the KenLM-style quality
    * filter a training pipeline runs, self-contained (no external LM).
    *
    * A doc shorter than 2 words contributes its whole text as one gram
    * (the repo's shingle convention, shared with the Jaccard/repetition
    * oracles). Scores quantize to 2^-20 steps BEFORE ranking: the
    * per-doc sum of ln(p) is order-dependent at the ulp level, and the
    * quantization absorbs that while keeping 6 decimal digits of
    * discrimination; ties fall to doc_id.
    *
    * Plan: two shuffle aggregations with map-side combine (bigram
    * counts, context counts) sized by VOCABULARY not corpus, one
    * scoring join (AQE broadcasts the LM table when it is small), one
    * distributed bottom-k. */
  def bigramLmScore(docs: DataFrame, bottomK: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ShingleStrings = ONE split per row; the split/transform/element_at
    // formulation re-splits per gram (the documented O(words^2) trap —
    // measured 6.6 s vs 1 s at sf0.1)
    val gramsCol = graft.functions.GraftFunctions
      .shingle_strings(lower(col(textCol)), 2)
    val g = docs.select(col(idCol), explode(gramsCol).as("g"))
    val c2 = g.groupBy("g").agg(count(lit(1)).as("c2"))
    val gw = c2.withColumn("w1", split(col("g"), " ").getItem(0))
    val c1 = gw.groupBy("w1").agg(sum("c2").as("c1"))
    val lm = gw.join(c1, "w1")
      .select(col("g"),
        log(col("c2").cast("double") / col("c1").cast("double")).as("lnp"))
    g.join(lm, "g")
      .groupBy(col(idCol))
      .agg(sum("lnp").as("s"), count(lit(1)).as("n_bigrams"))
      .withColumn("score_q",
        floor(col("s") / col("n_bigrams") * lit(1048576.0)).cast("long"))
      .orderBy(col("score_q").asc, col(idCol).asc)
      .limit(bottomK)
      .select(col(idCol), col("score_q"), col("n_bigrams"))
  }

  /** Top-n TF-IDF terms per document (score = tf * ln(N/df), N = docs
    * with at least one token), ties broken by term ascending. */
  def tfidfTopTerms(docs: DataFrame, topN: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(docs, idCol, textCol)
    val tf = t.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = tf.select(col(idCol)).distinct().count()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(dfreq), "term")
      .withColumn("score",
        col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= topN)
      .select(col(idCol), col("rank"), col("term"))
  }

  /** TEXTRANK keyword extraction (Mihalcea & Tarau '04) — PageRank
    * over the word co-occurrence graph, composed from two components
    * the engine already proves separately: x31's collocation bigrams
    * build the graph (frequent words as nodes, adjacent pairs as
    * undirected edges) and g2's EXACT fixed-point [[Graph.pageRank]]
    * ranks it, so the whole extraction inherits the integer
    * determinism that lets the oracle unroll every round. Word →
    * node id is the 60-bit md5-prefix derivation used across the
    * engine (deterministic and computed IDENTICALLY by both engines,
    * so even an improbable collision yields the same merged node on
    * both sides). `minCount` prunes the long-tail vocabulary before
    * the graph exists — the node set is the frequent vocabulary, not
    * the corpus.
    *
    * @return (word, score, rank) — top `k` by (score desc, word asc),
    *         score in PageRank micro-units.
    */
  def keywords(docs: DataFrame, textCol: String, minCount: Long = 5,
      iterations: Int = 4, k: Int = 20): DataFrame = {
    require(minCount >= 1 && iterations >= 1 && k >= 1)
    def hid(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val sp = split(trim(lower(col(textCol))), "\\s+")
    val toks = docs.select(sp.as("__sp"))
    val freq = toks.select(explode(col("__sp")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
    val bi = toks.where(size(col("__sp")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__sp")) - 1),
        i => struct(element_at(col("__sp"), i).as("a"),
          element_at(col("__sp"), i + 1).as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
    val ed = bi
      .join(freq.select(col("w").as("a")), "a")
      .join(freq.select(col("w").as("b")), "b")
      .where(col("a") =!= col("b"))
      .select(hid(col("a")).as("src"), hid(col("b")).as("dst"))
    val und = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
    val pr = Graph.pageRank(und, "src", "dst", iterations)
    val words = freq.select(col("w").as("word"), hid(col("w")).as("node"))
    pr.join(words, "node")
      .orderBy(col("rank_u").desc, col("word").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rank_u").desc, col("word").asc)).cast("int"))
      .select(col("word"), col("rank_u").as("score"), col("rank"))
  }

  /** Reciprocal-rank fusion of N ranked lists — HYBRID retrieval
    * (lexical BM25 + vector ANN is the canonical pair; Cormack et al.,
    * SIGIR'09). Each input carries (queryCol, rankCol, idCol); a
    * document's fused score is Σ_lists 1/(kRrf + rank), absent lists
    * contributing zero.
    *
    * EXACT-INTEGER scores: every contribution is scaled by
    * lcm(kRrf+1 .. kRrf+maxRank), so 1/(kRrf+r) becomes the exact
    * integer L/(kRrf+r) and the fused score is an exact BIGINT sum —
    * no float summation order, no last-ulp rank flips, bit-identical
    * across engines (the same discipline as the quantized-cosine
    * searchers). Ties break by document id ascending.
    *
    * Plan shape: inputs are already top-maxRank per query (tiny), so
    * the union + groupBy is a shuffle over at most
    * queries × lists × maxRank rows — negligible next to the
    * retrieval stages that produced them; fusion adds no corpus-scale
    * work at all. */
  def rrfFuse(ranked: Seq[DataFrame], k: Int, kRrf: Int = 60,
      maxRank: Int = 10, queryCol: String = "query_id",
      idCol: String = "doc_id", rankCol: String = "rank"): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    val scale = (kRrf + 1 to kRrf + maxRank)
      .foldLeft(BigInt(1))((l, d) => l * d / l.gcd(BigInt(d)))
    require(scale.isValidLong, s"rrf scale overflows Long for " +
      s"kRrf=$kRrf maxRank=$maxRank; shrink the window")
    val unioned = ranked
      .map(_.select(col(queryCol), col(idCol), col(rankCol)))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    unioned
      .withColumn("contrib",
        expr(s"${scale.toLong}L div ($kRrf + $rankCol)"))
      .groupBy(col(queryCol), col(idCol))
      .agg(sum("contrib").as("rrf_score"), count(lit(1)).as("n_lists"))
      .withColumn(rankCol, row_number().over(w).cast("int"))
      .where(col(rankCol) <= k)
      .select(col(queryCol), col(rankCol), col(idCol),
        col("rrf_score"), col("n_lists"))
  }
}
