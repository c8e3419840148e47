package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.dec

/** Second wave of the Hive scalar library (SURVEY.md §2.I): the
  * less-common string/date/misc functions, each with an exact DuckDB
  * reconstruction (q_fn_misc's soundex/bround/format_number emulations
  * are empirically validated 0-mismatch on both fixture SFs; the only
  * scalars left without a SQL oracle — crc32 / hash / xxhash64 — are
  * pinned by hard in-test oracles in MiscSurfaceSpec).
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

  /** The long-tail misc scalars, every column DuckDB-oracled (r02 VERDICT
    * shrank the rows-only set to engine-internal hashes only, now covered
    * by hard in-test oracles in MiscSurfaceSpec instead):
    *  - soundex: reverse-engineered rule set (vowels+non-letters reset the
    *    last code, H/W are transparent, adjacent equal codes collapse)
    *    replicated as a recursive CTE, validated 0-mismatch vs Spark on
    *    both fixtures;
    *  - bround on an EXACT decimal operand — half-even ties are exact, so
    *    DuckDB round_even agrees (on noisy doubles it does not, r02);
    *  - format_number via integer-part thousand grouping + exact 1-dp
    *    fraction; hypot == sqrt(n^2+9) exactly for small ints;
    *  - xpath over per-row markup whose answer is the embedded column. */
  val qFnMisc: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 200)
      .select(
        col("p_partkey"),
        soundex(col("p_name")).as("sdx"),
        size(sentences(col("p_name"))).as("n_sentences"),
        bround(dec(col("p_retailprice")) * 5, 1).cast("double").as("br"),
        format_number(col("p_retailprice"), 1).as("fn"),
        conv(col("p_partkey").cast("string"), 10, 16).as("cv"),
        bin(col("p_size")).as("bn"),
        factorial((col("p_size") % 10).cast("int")).as("fact"),
        ascii(col("p_name")).as("asc"),
        expr("char(65 + p_size % 26)").as("ch"),
        expr("hypot(p_size, 3.0)").as("hyp"),
        expr("xpath_string(concat('<a><b>', p_brand, '</b></a>'), 'a/b')")
          .as("xp"))
      .orderBy(col("p_partkey"))
  }

  /** Wave 3: the Spark-4 string/bit additions (contains/startswith/
    * endswith predicates, url_encode/decode, bit_get/bit_count) — all
    * Hive-replaceable surface a migrating user would reach for. The
    * url_encode oracle exploits the fixture charset ([a-z ]): form
    * encoding is exactly space -> '+' there. */
  val qFnString3: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 200)
      .select(
        col("p_partkey"),
        expr("contains(p_name, 'ol')").as("ct"),
        expr("startswith(p_name, 's')").as("sw"),
        expr("endswith(p_name, 't')").as("ew"),
        expr("url_encode(p_name)").as("ue"),
        expr("url_decode(url_encode(p_name))").as("ud"),
        expr("getbit(p_size, 2)").as("bg"),
        bit_count(col("p_size")).as("bc"),
        btrim(concat(lit("  "), col("p_name"), lit("  "))).as("bt"),
        expr("left(p_name, 4)").as("lf"),
        expr("right(p_name, 4)").as("rt"))
      .orderBy(col("p_partkey"))
  }

  /** UNIONTYPE<string,double> analogue [hive: serde/src/java/org/apache/
    * hadoop/hive/serde2/objectinspector/UnionObjectInspector.java],
    * modeled per SURVEY §2 as STRUCT<tag:INT, field0:STRING,
    * field1:DECIMAL>: `create_union` is a tagged struct() build,
    * `extract_union` is field access guarded by tag. The struct stays
    * internal; the query emits only scalar extracts, grouped by tag. */
  val qUnionType: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    Tables(s, dir, "orders")
      .select(
        when(col("o_orderkey") % 2 === 0,
          struct(lit(0).as("tag"),
            col("o_orderpriority").as("field0"),
            lit(null).cast(DecimalType(18, 4)).as("field1")))
        .otherwise(
          struct(lit(1).as("tag"),
            lit(null).cast("string").as("field0"),
            dec(col("o_totalprice")).as("field1")))
        .as("u"))
      .groupBy(col("u.tag").as("tag"))
      .agg(count(lit(1)).as("cnt"),
        max(col("u.field0")).as("max_s"),
        sum(col("u.field1")).cast("double").as("sum_d"))
      .orderBy(col("tag"))
  }

  /** ANSI-safe try_* family (Spark 4 runs ANSI mode by default, so the
    * error-returning forms NEED these escapes — the Hive-behavior
    * analogue of silent-NULL arithmetic, made explicit): divide-by-zero,
    * bigint overflow, bad casts, and out-of-bounds element access all
    * yield NULL instead of failing the job. At 100 TB a single dirty row
    * must never kill a 6-hour pipeline; try_* is the row-level quarantine
    * that replaces job-level retry. */
  val qFnTry: Q = (s, dir) => {
    Tables(s, dir, "part").filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        expr("try_divide(100000L, p_size % 5)").as("td"),
        expr("try_add(9223372036854775807L, p_partkey)").as("ta"),
        expr("try_cast(p_brand AS INT)").as("tc"),
        expr("try_element_at(split(p_name, ' '), 99)").as("te"),
        expr("try_cast(substr(p_brand, 7) AS INT)").as("tn"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q_fn_string2" -> qFnString2,
    "q_fn_date2" -> qFnDate2,
    "q_fn_string3" -> qFnString3,
    "q_union_type" -> qUnionType,
    "q_fn_try" -> qFnTry,
    "q_fn_misc" -> qFnMisc)

  val oracle: Map[String, String] = Map(
    "q_fn_try" -> """
      SELECT p_partkey,
        CASE WHEN p_size % 5 = 0 THEN NULL
             ELSE 100000 / (p_size % 5) END AS td,
        CASE WHEN p_partkey = 0 THEN 9223372036854775807
             ELSE NULL END AS ta,
        TRY_CAST(p_brand AS INT) AS tc,
        string_split(p_name, ' ')[99] AS te,
        TRY_CAST(substr(p_brand, 7) AS INT) AS tn
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",
    "q_union_type" -> """
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS tag,
        count(*) AS cnt,
        max(CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END) AS max_s,
        CAST(sum(CASE WHEN o_orderkey % 2 <> 0
                 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
          AS sum_d
      FROM orders GROUP BY 1 ORDER BY tag""",
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
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""",
    "q_fn_string3" -> """
      SELECT p_partkey,
        contains(p_name, 'ol') AS ct,
        starts_with(p_name, 's') AS sw,
        ends_with(p_name, 't') AS ew,
        replace(p_name, ' ', '+') AS ue,
        p_name AS ud,
        CAST((p_size >> 2) & 1 AS TINYINT) AS bg,
        CAST(bit_count(p_size) AS INT) AS bc,
        trim(p_name) AS bt,
        substr(p_name, 1, 4) AS lf,
        substr(p_name, greatest(len(p_name) - 3, 1)) AS rt
      FROM part WHERE p_partkey < 200 ORDER BY p_partkey""",
    // soundex rules replicated per Spark's mapping string
    // '01230120022455012623010202': vowels/Y and non-letters reset the
    // running code, H/W keep it, adjacent equal codes collapse; first
    // letter verbatim + first 3 emitted digits zero-padded.
    "q_fn_misc" -> """
      WITH RECURSIVE base AS (
        SELECT p_partkey, p_name, p_brand, p_size, p_retailprice,
               upper(p_name) AS nm
        FROM part WHERE p_partkey < 200),
      step AS (
        SELECT p_partkey, nm, 1 AS i, '' AS digits,
          substr(translate(substr(nm, 1, 1),
            'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
            '01230120022455012623010202') || '0', 1, 1) AS last
        FROM base
        UNION ALL
        SELECT p_partkey, nm, i + 1,
          CASE WHEN code BETWEEN '1' AND '6' AND code <> last
               THEN digits || code ELSE digits END,
          CASE WHEN ch IN ('H', 'W') THEN last
               WHEN code BETWEEN '1' AND '6' THEN code
               ELSE '0' END
        FROM (SELECT p_partkey, nm, i, digits, last,
                substr(nm, i + 1, 1) AS ch,
                CASE WHEN substr(nm, i + 1, 1) BETWEEN 'A' AND 'Z'
                     THEN translate(substr(nm, i + 1, 1),
                       'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                       '01230120022455012623010202')
                     ELSE '.' END AS code
              FROM step WHERE i < len(nm)) t),
      sdx AS (
        SELECT p_partkey, substr(nm, 1, 1) || substr(digits || '000', 1, 3)
                 AS sdx
        FROM step
        QUALIFY row_number() OVER (PARTITION BY p_partkey ORDER BY i DESC)
                = 1)
      SELECT b.p_partkey, s.sdx,
        CAST(len(list_filter(regexp_split_to_array(p_name, '[.!?]+'),
          x -> trim(x) <> '')) AS INT) AS n_sentences,
        CAST(round_even(CAST(p_retailprice AS DECIMAL(18,4)) * 5, 1)
          AS DOUBLE) AS br,
        format('{:,}', CAST(floor(round(p_retailprice, 1)) AS BIGINT))
          || '.' ||
          CAST(CAST(round(round(p_retailprice, 1) % 1 * 10, 0) AS INT)
            AS VARCHAR) AS fn,
        upper(to_hex(b.p_partkey)) AS cv,
        bin(p_size) AS bn,
        CAST(factorial(CAST(p_size % 10 AS INT)) AS BIGINT) AS fact,
        CAST(ascii(p_name) AS INT) AS asc,
        chr(65 + p_size % 26) AS ch,
        sqrt(p_size * p_size + 9.0) AS hyp,
        p_brand AS xp
      FROM base b JOIN sdx s ON b.p_partkey = s.p_partkey
      ORDER BY b.p_partkey""")
}
