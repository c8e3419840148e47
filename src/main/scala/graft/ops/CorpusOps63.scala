package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 65 (SURVEY.md §2.M): the TOKENIZER
  * CHOICE DATACARD — all three production tokenizer algorithms (BPE,
  * unigram-LM, WordPiece), each trained on THIS corpus and measured
  * on THIS corpus, in one per-(algo, source) fertility table. The
  * per-algorithm legs already ship (q_bpe_apply,
  * q_tok_unigram_fertility, q_tok_wordpiece_fertility); choosing an
  * algorithm means reading them SIDE BY SIDE, and a composed query
  * is where a silent contract drift between the legs would hide —
  * so the datacard is oracled as ONE query whose DuckDB side chains
  * the same three CTE programs (the q_pipeline_e2e discipline).
  *
  * Column contract: (algo, source, n_words, n_tokens,
  * tokens_per_word_milli). BPE and WordPiece share the symbolized
  * dictionary + boundary-anchored merges (only the pick rule
  * differs); the unigram leg's n_words counts words of length ≤ 16
  * only — the trainer's declared DP bound (CorpusOps49), visible in
  * the datacard as a slightly smaller word census for that row.
  *
  * Scale: the corpus collapses ONCE to the per-source word
  * frequencies; both merge trainers and the unigram DP run
  * dictionary-sized; the three readouts are vocab-bounded joins.
  * 100 TB of text is scanned exactly once.
  */
object CorpusOps63 {

  val qTokAlgoDatacard: Q = (s, dir) =>
    datacardFrom(Tables(s, dir, "documents")
      .select(col("source"), col("text")))

  /** The datacard behind [[qTokAlgoDatacard]] and
    * `Graft.tokenizerDatacard`: `docs` = (source, text). */
  private[graft] def datacardFrom(docs: DataFrame): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ws = graft.CacheScope.track(docs
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("freq_s"))
      .persist(mad))
    val dict0 = graft.CacheScope.track(ws
      .groupBy(col("word")).agg(sum(col("freq_s")).as("freq"))
      .withColumn("sym",
        concat(regexp_replace(col("word"), "(.)", "$1 "), lit("</w>")))
      .persist(mad))
    def leg(algo: String, merges: Seq[String]): DataFrame =
      TextAnalysis.fertilityFrom(ws, dict0, merges, "source")
        .select(lit(algo).as("algo"), col("source"), col("n_words"),
          col("n_bpe_tokens").as("n_tokens"),
          col("bpe_per_word_milli").as("tokens_per_word_milli"))
    val bpe = leg("bpe", TextAnalysis.bpeMerges(dict0, 6)
      .orderBy(col("round")).collect().map(_.getString(1)).toSeq)
    val wp = leg("wordpiece", CorpusOps59.wordpieceMerges(dict0, 6)
      .orderBy(col("round")).collect().map(_.getString(1)).toSeq)
    val uni = CorpusOps49.unigramFertilityFrom(
      docs.select(col("source").as("grp"), col("text")), "grp")
      .select(lit("unigram").as("algo"), col("grp").as("source"),
        col("n_tokens").as("n_words"), col("n_pieces").as("n_tokens"),
        col("fertility_milli").as("tokens_per_word_milli"))
    bpe.unionByName(uni).unionByName(wp)
      .orderBy(col("algo"), col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_tok_algo_datacard" -> qTokAlgoDatacard)

  /** The shared fertility readout tail over a post-merge dictionary
    * CTE `d6` (the q_bpe_apply shape). */
  private def mergeLegSql(algo: String): String = s"""
      sl AS (SELECT word,
               CAST(len(string_split(sym, ' ')) AS BIGINT) AS toks
             FROM d6),
      ws AS (SELECT source, word, CAST(count(*) AS BIGINT) AS freq_s
             FROM (SELECT source,
                     unnest(string_split(text, ' ')) AS word
                   FROM documents) t
             GROUP BY 1, 2)
      SELECT '$algo' AS algo, source,
        CAST(sum(freq_s) AS BIGINT) AS n_words,
        CAST(sum(freq_s * toks) AS BIGINT) AS n_tokens,
        CAST(sum(freq_s * toks) * 1000 // sum(freq_s) AS BIGINT)
          AS tokens_per_word_milli
      FROM ws JOIN sl USING (word)
      GROUP BY source"""

  private val d0Sql = """
      d0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq,
          regexp_replace(word, '(.)', '\1 ', 'g') || '</w>' AS sym
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents) t
        GROUP BY word)"""

  val oracle: Map[String, String] = Map(
    // each leg is its own parenthesized WITH program (BPE and
    // WordPiece both name their dictionaries d0..d6, so the chains
    // must not share one namespace); the union re-reads the same
    // three programs the per-algorithm oracles run
    "q_tok_algo_datacard" -> s"""
      SELECT algo, source, n_words, n_tokens, tokens_per_word_milli
      FROM (
        SELECT * FROM (
          WITH ${TextAnalysis.bpeChainSql},
          ${mergeLegSql("bpe")}) bpe_leg
        UNION ALL
        SELECT * FROM (
          WITH ${CorpusOps49.coreSql},
          ws AS MATERIALIZED (
            SELECT word, count(*) AS wnp FROM (
              ${(1 to 16).map(k =>
                s"SELECT word, piece FROM bt1_$k WHERE piece IS NOT NULL")
                .mkString(" UNION ALL ")}) u
            GROUP BY word),
          sw AS (SELECT source, word, count(*) AS freq FROM (
                   SELECT source, unnest(string_split(text, ' ')) AS word
                   FROM documents) x
                 WHERE length(word) BETWEEN 1 AND 16
                 GROUP BY source, word)
          SELECT 'unigram' AS algo, source,
            CAST(sum(freq) AS BIGINT) AS n_words,
            CAST(sum(freq * wnp) AS BIGINT) AS n_tokens,
            CAST(sum(freq * wnp) * 1000 // sum(freq) AS BIGINT)
              AS tokens_per_word_milli
          FROM sw JOIN ws USING (word)
          GROUP BY source) uni_leg
        UNION ALL
        SELECT * FROM (
          WITH $d0Sql,
          ${(1 to 6).map(CorpusOps59.wpRoundSql).mkString(",")},
          ${mergeLegSql("wordpiece")}) wp_leg)
      ORDER BY algo, source""")
}
