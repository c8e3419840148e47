package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Second wave of the Hive scalar library (SURVEY.md §2.I): the
  * less-common string/date functions with exact DuckDB reconstructions,
  * plus a rows-only query for functions with no cross-engine analogue
  * (soundex, sentences, bround half-even on noisy doubles — DuckDB's
  * round_even disagrees with Java BigDecimal on representational
  * near-ties, measured r02 — format_number, crc32, xpath).
  */
object Scalars2 {

  /** substring_index / find_in_set / elt / overlay / initcap / base64 /
    * concat over binary — Hive string surface, wave 2. */
  val qFnString2: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 200)
      .select(
        col("p_partkey"),
        substring_index(col("p_name"), " ", 1).as("si1"),
        substring_index(concat_ws(".", col("p_brand"), col("p_type"),
          col("p_name")), ".", 2).as("si2"),
        expr("find_in_set(p_type, 'SMALL,MEDIUM,LARGE')").as("fis"),
        expr("elt(1 + p_size % 3, 'one', 'two', 'three')").as("e"),
        overlay(col("p_name"), lit("XY"), lit(3), lit(2)).as("ov"),
        initcap(col("p_name")).as("ic"),
        base64(col("p_name").cast("binary")).as("b64"),
        unbase64(base64(col("p_name").cast("binary"))).cast("string")
          .as("b64rt"),
        format_string("%s#%03d", col("p_brand"), col("p_size")).as("fmt"),
        expr("str_to_map(concat('type:', p_type, ',size:', p_size), ',', ':')['size']")
          .as("stm"),
        width_bucket(col("p_retailprice"), lit(0.0), lit(2500.0), lit(25))
          .as("wb"))
      .orderBy(col("p_partkey"))
  }

  /** months_between / next_day / from_utc_timestamp / dayofyear /
    * weekday / make_date / trunc — Hive date surface, wave 2. The
    * months_between oracle reconstructs Spark's documented 31-day
    * fraction rule (times here are all midnight). */
  val qFnDate2: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        months_between(lit("2002-03-15").cast("timestamp"),
          col("o_orderdate")).as("mb"),
        date_format(next_day(col("o_orderdate").cast("date"), "Monday"),
          "yyyy-MM-dd").as("next_mon"),
        date_format(from_utc_timestamp(col("o_orderdate"),
          "America/Los_Angeles"), "yyyy-MM-dd HH:mm:ss").as("la_time"),
        date_format(to_utc_timestamp(col("o_orderdate"),
          "Asia/Tokyo"), "yyyy-MM-dd HH:mm:ss").as("from_tokyo"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekday(col("o_orderdate")).as("wd"),
        date_format(make_date(year(col("o_orderdate")),
          month(col("o_orderdate")), lit(1)), "yyyy-MM-dd").as("made"),
        date_format(trunc(col("o_orderdate").cast("date"), "year"),
          "yyyy-MM-dd").as("ytrunc"))
      .orderBy(col("o_orderkey"))
  }

  /** Functions with no faithful DuckDB twin — determinism is still
    * guaranteed (pure functions of the input), so the driver's rows-only
    * check plus the run-twice determinism spec cover them. */
  val qFnMisc: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 200)
      .select(
        col("p_partkey"),
        soundex(col("p_name")).as("sdx"),
        size(sentences(col("p_name"))).as("n_sentences"),
        bround(col("p_retailprice") / 7, 2).as("br"),
        format_number(col("p_retailprice"), 1).as("fn"),
        crc32(col("p_name").cast("binary")).as("crc"),
        conv(col("p_partkey").cast("string"), 10, 16).as("cv"),
        expr("hypot(p_size, 3.0)").as("hyp"),
        expr("xpath_string('<a><b>hello</b></a>', 'a/b')").as("xp"),
        hash(col("p_name"), col("p_size")).as("spark_hash"),
        xxhash64(col("p_name")).as("xx64"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q_fn_string2" -> qFnString2,
    "q_fn_date2" -> qFnDate2,
    "q_fn_misc" -> qFnMisc)

  val oracle: Map[String, String] = Map(
    "q_fn_string2" -> """
      SELECT p_partkey,
        split_part(p_name, ' ', 1) AS si1,
        array_to_string((string_split(p_brand || '.' || p_type || '.' ||
          p_name, '.'))[1:2], '.') AS si2,
        CAST(coalesce(list_position(
          string_split('SMALL,MEDIUM,LARGE', ','), p_type), 0) AS INT)
          AS fis,
        (['one', 'two', 'three'])[CAST(1 + p_size % 3 AS INT)] AS e,
        substr(p_name, 1, 2) || 'XY' || substr(p_name, 5) AS ov,
        array_to_string(list_transform(string_split(p_name, ' '),
          x -> upper(substr(x, 1, 1)) || lower(substr(x, 2))), ' ') AS ic,
        base64(CAST(p_name AS BLOB)) AS b64,
        p_name AS b64rt,
        printf('%s#%03d', p_brand, p_size) AS fmt,
        CAST(p_size AS VARCHAR) AS stm,
        CAST(CASE WHEN p_retailprice < 0 THEN 0
                  WHEN p_retailprice >= 2500.0 THEN 26
                  ELSE floor(p_retailprice / (2500.0 / 25)) + 1
             END AS BIGINT) AS wb
      FROM part WHERE p_partkey < 200 ORDER BY p_partkey""",
    "q_fn_date2" -> """
      SELECT o_orderkey,
        round(
          (2002 - year(o_orderdate)) * 12 + (3 - month(o_orderdate)) +
          CASE WHEN day(o_orderdate) = 15 THEN 0.0
               ELSE (15 - day(o_orderdate)) / 31.0 END, 8) AS mb,
        strftime(CAST(o_orderdate AS DATE)
          + CAST((1 - dayofweek(o_orderdate) + 7) % 7 AS INT)
          + CASE WHEN (1 - dayofweek(o_orderdate) + 7) % 7 = 0
                 THEN 7 ELSE 0 END, '%Y-%m-%d') AS next_mon,
        strftime(CAST(o_orderdate AT TIME ZONE 'UTC'
          AT TIME ZONE 'America/Los_Angeles' AS TIMESTAMP),
          '%Y-%m-%d %H:%M:%S') AS la_time,
        strftime(CAST(o_orderdate AT TIME ZONE 'Asia/Tokyo'
          AT TIME ZONE 'UTC' AS TIMESTAMP),
          '%Y-%m-%d %H:%M:%S') AS from_tokyo,
        CAST(dayofyear(o_orderdate) AS INT) AS doy,
        CAST((dayofweek(o_orderdate) + 6) % 7 AS INT) AS wd,
        strftime(make_date(CAST(year(o_orderdate) AS BIGINT),
          CAST(month(o_orderdate) AS BIGINT), 1), '%Y-%m-%d') AS made,
        strftime(date_trunc('year', o_orderdate), '%Y-%m-%d') AS ytrunc
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")
}
