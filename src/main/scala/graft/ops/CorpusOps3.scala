package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Third wave of corpus-preparation operators (SURVEY.md §2.M):
  * PII redaction, train/test cross-split decontamination, and
  * vocabulary-coverage (OOV-rate) profiling.
  *
  * Published grounding: PII scrubbing as a standard pretraining step —
  * e.g. BigScience ROOTS (Laurencon et al., 2022) and the Pile
  * (Gao et al., 2020) describe regex-class email/IP/phone removal;
  * decontamination — GPT-3 (Brown et al., 2020) appendix C n-gram
  * overlap removal against benchmark sets; OOV/vocab coverage is the
  * classic corpus-LM fit diagnostic.
  *
  * All three are deterministic string/integer pipelines, fully
  * DuckDB-oracled (regex subset chosen to behave identically under
  * Java regex and RE2).
  */
object CorpusOps3 {

  // regexes shared by the Spark query and the DuckDB oracle — conservative
  // syntax (classes, bounded counts, \b) that Java regex and RE2 read
  // identically.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val CardRe = "\\b\\d{13,16}\\b"

  /** PII redaction: the fixture corpus is synthetic word soup, so each
    * doc first gets a deterministic PII suffix (same expression in the
    * oracle — both engines redact identical inputs), then a codegen'd
    * regexp_replace chain scrubs emails, phones, IPv4s and card
    * numbers, with per-class counts from regexp_count.
    *
    * Scale: pure map-side projection — no shuffle at all; the regex
    * chain stays inside one whole-stage-codegen span. Replace order
    * matters: emails first (their local part may contain digits),
    * then phones (dashed) and IPs (dotted) before the bare-digit
    * card pattern. */
  val qPiiRedact: Q = (s, dir) => {
    val withPii = Tables(s, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@mail.example.com"),
          lit(" from 10.2."), col("doc_id") % 256, lit(".9"),
          lit(" card 4242424242424242 tel 555-867-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
          .as("raw"))
    withPii.select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
              PhoneRe, "<PHONE>"),
            IpRe, "<IP>"),
          CardRe, "<CARD>").as("redacted"),
        regexp_count(col("raw"), lit(EmailRe)).as("n_email"),
        regexp_count(col("raw"), lit(PhoneRe)).as("n_phone"),
        regexp_count(col("raw"), lit(IpRe)).as("n_ip"),
        regexp_count(col("raw"), lit(CardRe)).as("n_card"))
      .orderBy(col("doc_id"))
  }

  /** Cross-split decontamination: the complement of q_contamination —
    * emit the CLEAN train split (every train doc sharing no 4-gram
    * with the held-out split is kept; under-4-token docs have no
    * grams and are kept by construction).
    *
    * Scale: the held-out gram set is the small side (a benchmark /
    * eval split, not the corpus) so it broadcasts; the corpus gram
    * stream anti-joins map-side with zero corpus shuffle, then the
    * contaminated-id set (small) broadcasts into a second map-side
    * anti-join against the doc table. */
  val qDecontaminate: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 4)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 4), i -> " +
          "array_join(slice(a, i + 1, 4), ' '))")).as("g"))
      .distinct()
    val held = grams(docs.filter(col("doc_id") % 97 === 0))
      .select(col("g")).distinct()
    val contaminated = grams(docs.filter(col("doc_id") % 97 =!= 0))
      .join(broadcast(held), Seq("g"))
      .select(col("doc_id")).distinct()
    docs.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary coverage / OOV-rate profiling: rank the corpus
    * vocabulary by frequency (deterministic (freq desc, token)
    * tie-break), take the top 25 as the "tokenizer vocab", and score
    * each source by its out-of-vocabulary token rate — the standard
    * tokenizer-fit diagnostic before training.
    *
    * Scale: token counts partial-aggregate map-side; the vocab is
    * top-k over the aggregated counts (tiny) and broadcasts into a
    * map-side anti-join of the token stream. OOV rate is an exact
    * int/int division — bit-identical cross-engine. */
  val qVocabCoverage: Q = (s, dir) => {
    val toks = Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(25)
      .select(col("tok"))
    val tot = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("tot_toks"))
    val oov = toks.join(broadcast(vocab), Seq("tok"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("oov_toks"))
    tot.join(oov, Seq("source"), "left")
      .select(col("source"), col("tot_toks"),
        coalesce(col("oov_toks"), lit(0L)).as("oov_toks"))
      .withColumn("oov_rate",
        col("oov_toks").cast("double") / col("tot_toks").cast("double"))
      .orderBy(col("source"))
  }

  /** DSIR-style importance selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", 2023,
    * arXiv:2302.03169): rank raw-pool documents by how target-like
    * their hashed-bigram feature vector is, where the target profile is
    * a designated high-quality slice (here source = 'src0'). Features
    * are bigrams hashed into 128 buckets via the cross-engine
    * md5-prefix trick; a document's score is the exact integer dot
    * product of its bucket counts with the target's bucket counts,
    * length-normalized by one IEEE division (bit-identical in both
    * engines). Top-50 selected.
    *
    * Scale: the target profile is BOUNDED (128 rows however large the
    * target corpus) and broadcasts; the pool side is one map-side
    * partial-aggregated shuffle on (doc_id, bucket) followed by a
    * per-doc agg; selection is orderBy+limit, which lowers to
    * TakeOrderedAndProject (no global sort). The target slice reads
    * through a pushed-down source filter — at 100 TB it would be its
    * own small corpus, not a rescan. */
  val qSelectImportance: Q = (s, dir) => {
    val B = 128
    val grams = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("source"),
        explode(when(size(col("t")) >= 2,
          expr("""transform(sequence(1, size(t) - 1),
                  i -> concat_ws(' ', element_at(t, i),
                                 element_at(t, i + 1)))"""))
          .otherwise(array())).as("g"))
      .withColumn("b", expr(
        s"cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % $B"))
    val target = grams.filter(col("source") === "src0")
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val docBuckets = grams.filter(col("source") =!= "src0")
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    docBuckets.join(broadcast(target), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * coalesce(col("tc"), lit(0L))).as("score"),
        sum(col("c")).as("nbig"))
      .withColumn("sim",
        col("score").cast("double") / col("nbig").cast("double"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(50)
  }

  val queries: Map[String, Q] = Map(
    "q_pii_redact" -> qPiiRedact,
    "q_decontaminate" -> qDecontaminate,
    "q_vocab_coverage" -> qVocabCoverage,
    "q_select_importance" -> qSelectImportance)

  val oracle: Map[String, String] = Map(
    "q_pii_redact" -> """
      WITH raw AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) ||
          '@mail.example.com from 10.2.' ||
          CAST(doc_id % 256 AS VARCHAR) || '.9' ||
          ' card 4242424242424242 tel 555-867-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        FROM documents)
      SELECT doc_id,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(raw,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
              '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
          '\b\d{13,16}\b', '<CARD>', 'g') AS redacted,
        CAST(len(regexp_extract_all(raw,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
          AS n_email,
        CAST(len(regexp_extract_all(raw, '\b\d{3}-\d{3}-\d{4}\b')) AS INT)
          AS n_phone,
        CAST(len(regexp_extract_all(raw,
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip,
        CAST(len(regexp_extract_all(raw, '\b\d{13,16}\b')) AS INT)
          AS n_card
      FROM raw ORDER BY doc_id""",
    "q_decontaminate" -> """
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      idx AS (
        SELECT doc_id, a, unnest(range(0, len(a) - 3)) AS i FROM toks),
      grams AS (
        SELECT DISTINCT doc_id,
          array_to_string(a[i + 1 : i + 4], ' ') AS g
        FROM idx),
      held AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
      SELECT doc_id, source, lang, n_chars
      FROM documents d
      WHERE doc_id % 97 <> 0
        AND NOT EXISTS (
          SELECT 1 FROM grams JOIN held USING (g)
          WHERE grams.doc_id = d.doc_id)
      ORDER BY doc_id""",
    "q_vocab_coverage" -> """
      WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      vocab AS (
        SELECT tok FROM (SELECT tok, count(*) AS f FROM toks GROUP BY tok)
        ORDER BY f DESC, tok LIMIT 25),
      tot AS (SELECT source, count(*) AS tot_toks FROM toks GROUP BY source),
      oov AS (SELECT source, count(*) AS oov_toks FROM toks
              WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY source)
      SELECT t.source, tot_toks, coalesce(oov_toks, 0) AS oov_toks,
        CAST(coalesce(oov_toks, 0) AS DOUBLE) / CAST(tot_toks AS DOUBLE)
          AS oov_rate
      FROM tot t LEFT JOIN oov o ON t.source = o.source
      ORDER BY t.source""",
    "q_select_importance" -> """
      WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                    FROM documents),
      g AS (SELECT doc_id, source, t[i] || ' ' || t[i + 1] AS g
            FROM (SELECT *, unnest(range(1, len(t))) AS i FROM toks)),
      gb AS (SELECT doc_id, source,
               CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 128 AS b
             FROM g),
      target AS (SELECT b, count(*) AS tc FROM gb
                 WHERE source = 'src0' GROUP BY b),
      db AS (SELECT doc_id, b, count(*) AS c FROM gb
             WHERE source <> 'src0' GROUP BY 1, 2),
      sc AS (SELECT doc_id,
               CAST(sum(c * coalesce(tc, 0)) AS BIGINT) AS score,
               CAST(sum(c) AS BIGINT) AS nbig
             FROM db LEFT JOIN target USING (b) GROUP BY doc_id)
      SELECT doc_id, score, nbig,
        CAST(score AS DOUBLE) / CAST(nbig AS DOUBLE) AS sim
      FROM sc ORDER BY sim DESC, doc_id LIMIT 50""")
}
