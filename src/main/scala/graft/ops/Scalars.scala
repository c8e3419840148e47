package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Scalar function library coverage (SURVEY.md §2.I): one oracle-pinned
  * query per function family, so the ~300-function Hive surface
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java]
  * is exercised with semantics checked cross-engine, not just name-mapped.
  *
  * All functions here are Spark builtins (codegen'd Catalyst expressions) —
  * the Hive-gap functions (field, parse_url_tuple) live in
  * graft.functions as custom expressions and are covered by Misc below.
  *
  * Float-stability: transcendental results are rounded (JVM vs C libm can
  * differ in the last ulp); exact string/int functions are compared raw.
  */
object Scalars {

  /** String family: length/case/pad/trim/substr/locate/translate/... */
  val qFnString: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 200)
      .select(
        col("p_partkey"),
        length(col("p_name")).as("len"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 4).as("sub4"),
        substring(col("p_name"), -3, 3).as("subneg"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padkey"),
        rpad(col("p_type"), 10, ".").as("padtype"),
        trim(lit("  x  ")).as("trimmed"),
        reverse(col("p_brand")).as("revb"),
        repeat(col("p_type"), 2).as("rep2"),
        instr(col("p_name"), "e").as("pos_e"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        ascii(col("p_type")).as("asc"),
        levenshtein(col("p_name"), col("p_type")).as("lev"),
        left(col("p_name"), lit(3)).as("l3"),
        right(col("p_name"), lit(3)).as("r3"))
      .orderBy(col("p_partkey"))
  }

  /** Regex family: extract / replace / match / extract_all count. */
  val qFnRegex: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 300)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        col("p_name").rlike("^(red|blue)").as("is_colored"),
        size(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)))
          .as("n_words"))
      .orderBy(col("p_partkey"))
  }

  /** Date/time family over o_orderdate (timestamps, UTC-pinned). */
  val qFnDate: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        (dayofweek(col("o_orderdate")) - 1).as("dow0"),
        weekofyear(col("o_orderdate")).as("woy"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
          .as("plus3m"),
        date_format(date_add(col("o_orderdate").cast("date"), 45),
          "yyyy-MM-dd").as("plus45d"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("mstart"))
      .orderBy(col("o_orderkey"))
  }

  /** Math family (transcendentals rounded to 4–6 places). */
  val qFnMath: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 300)
      .select(
        col("p_partkey"),
        round(col("p_retailprice"), 0).as("rnd0"),
        floor(col("p_retailprice")).as("flr"),
        ceil(col("p_retailprice")).as("cl"),
        abs(col("p_size") - 25).as("ab"),
        pmod(col("p_partkey"), lit(7)).as("pm"),
        (col("p_partkey") % 7).as("m7"),
        round(sqrt(col("p_retailprice")), 4).as("sq"),
        round(pow(col("p_size"), 2), 4).as("p2"),
        round(exp(col("p_size") / lit(25.0)), 6).as("ex"),
        round(log(col("p_retailprice") + 1), 6).as("lg"),
        round(log10(col("p_retailprice") + 1), 6).as("lg10"),
        round(log2(col("p_size") + lit(1.0)), 6).as("lg2"),
        round(cbrt(col("p_retailprice")), 6).as("cb"),
        round(sin(col("p_size") / lit(10.0)), 6).as("sn"),
        round(atan2(col("p_size").cast("double"), lit(2.0)), 6).as("at2"),
        signum(col("p_size") - 25).cast("int").as("sg"),
        greatest(col("p_size"), lit(10)).as("gr"),
        least(col("p_size"), lit(40)).as("ls"),
        factorial(col("p_size") % 10).as("fact"),
        hex(col("p_partkey")).as("hx"),
        bin(col("p_partkey")).as("bn"),
        round(degrees(col("p_size") / lit(10.0)), 6).as("deg"))
      .orderBy(col("p_partkey"))
  }

  /** Conditional family: CASE/if/nvl/nullif/coalesce/isnull. */
  val qFnConditional: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        expr("if(o_orderstatus = 'F', 'final', 'open')").as("st"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending"))
          .as("nn"),
        nullif(col("o_orderstatus"), lit("O")).isNull.as("is_open"),
        nvl(nullif(col("o_orderstatus"), lit("F")), lit("was_f")).as("nv"))
      .orderBy(col("o_orderkey"))
  }

  /** Collection family: arrays + higher-order functions. The HOF results
    * are pinned against DuckDB list lambdas / string identities. */
  val qFnCollection: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    Tables(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        size(toks).as("n_toks"),
        size(array_distinct(toks)).as("n_uniq"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_contains(toks, "spark").as("has_spark"),
        array_join(slice(sort_array(array_distinct(toks)), 2, 3), "-")
          .as("sorted_2_4"),
        array_join(transform(slice(toks, 1, 5), x => upper(x)), " ")
          .as("up5"),
        size(filter(toks, x => length(x) > 5)).as("n_long"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x))
          .as("tot_chars"),
        exists(toks, x => x === "join").as("has_join"),
        array_position(sort_array(array_distinct(toks)), "data")
          .as("pos_data"))
      .orderBy(col("doc_id"))
  }

  /** JSON family: get_json_object / from_json struct access. */
  val qFnJson: Q = (s, dir) => {
    Tables(s, dir, "events")
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_int"))
      .orderBy(col("event_id"))
  }

  /** Hash / checksum family (md5, sha2-256 — bit-identical everywhere). */
  val qFnHash: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        md5(col("text")).as("m"),
        sha2(col("text"), 256).as("s256"),
        length(col("text")).as("n_chars_live"),
        octet_length(col("text")).as("n_bytes"))
      .orderBy(col("doc_id"))
  }

  /** Masking family (Hive GenericUDFMask*): Spark mask() vs an explicit
    * regex pipeline on the oracle side — pins the X/x/n semantics. */
  val qFnMask: Q = (s, dir) => {
    Tables(s, dir, "customer")
      .filter(col("c_custkey") < 100)
      .select(
        col("c_custkey"),
        mask(col("c_name")).as("masked"),
        mask(col("c_name"), lit("U"), lit("l"), lit("#")).as("masked_ulh"))
      .orderBy(col("c_custkey"))
  }

  /** VARIANT (Spark 4 semi-structured type): parse the events.props JSON
    * into variant, extract typed fields, aggregate — the open-schema path
    * a training-data pipeline uses for heterogeneous metadata. Oracle:
    * DuckDB json_extract on the same strings. */
  val qVariantJson: Q = (s, dir) => {
    Tables(s, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Collection wave 2: array set algebra, zip_with, flatten, map
    * construction/inspection. Every array output is sorted on BOTH
    * engines — Spark's array_intersect preserves left-operand order
    * while DuckDB's list_intersect does not, so only the sorted set is
    * hash-stable — and then serialized to a '|'-joined string: the
    * driver's pandas compare sorts rows by every column and cannot sort
    * array-valued cells (unhashable ndarray), so list results must leave
    * the query as scalars. */
  val qFnCollection2: Q = (s, dir) => {
    // array<int/long> -> string needs an element cast before array_join
    def joined(c: Column): Column =
      array_join(transform(c, _.cast("string")), "|")
    Tables(s, dir, "part")
      .filter(col("p_partkey") < 200)
      .withColumn("a", split(col("p_name"), " "))
      .select(
        col("p_partkey"),
        joined(sort_array(array_union(col("a"), array(col("p_brand")))))
          .as("un"),
        joined(sort_array(array_intersect(col("a"), slice(col("a"), 2, 2))))
          .as("inter"),
        joined(sort_array(array_except(col("a"), slice(col("a"), 1, 1))))
          .as("exc"),
        joined(expr("""zip_with(sequence(1, 3),
                array(p_size, p_size + 1, p_size + 2), (x, y) -> x * y)"""))
          .as("zw"),
        joined(flatten(array(slice(col("a"), 1, 1), slice(col("a"), 2, 1))))
          .as("flat"),
        arrays_overlap(col("a"), array(lit("spring"), lit("peru")))
          .as("ovl"),
        joined(sort_array(map_keys(map_from_arrays(
          array(lit("sz"), lit("key")),
          array(col("p_size").cast("long"), col("p_partkey")))))).as("mk"),
        joined(sort_array(map_values(map_from_arrays(
          array(lit("sz"), lit("key")),
          array(col("p_size").cast("long"), col("p_partkey")))))).as("mv"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q_variant_json" -> qVariantJson,
    "q_fn_collection2" -> qFnCollection2,
    "q_fn_string" -> qFnString,
    "q_fn_regex" -> qFnRegex,
    "q_fn_date" -> qFnDate,
    "q_fn_math" -> qFnMath,
    "q_fn_conditional" -> qFnConditional,
    "q_fn_collection" -> qFnCollection,
    "q_fn_json" -> qFnJson,
    "q_fn_hash" -> qFnHash,
    "q_fn_mask" -> qFnMask)

  val oracle: Map[String, String] = Map(
    "q_variant_json" -> """
      SELECT event_type, count(k) AS n,
        CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
      FROM (SELECT event_type,
              CAST(json_extract(props, '$.k') AS INT) AS k
            FROM events)
      GROUP BY event_type ORDER BY event_type""",
    "q_fn_collection2" -> """
      WITH t AS (SELECT p_partkey, p_brand, p_size,
                   string_split(p_name, ' ') AS a
                 FROM part WHERE p_partkey < 200)
      SELECT p_partkey,
        coalesce(array_to_string(
          list_sort(list_distinct(list_concat(a, [p_brand]))), '|'), '')
          AS un,
        coalesce(array_to_string(
          list_sort(list_distinct(list_intersect(a, a[2:3]))), '|'), '')
          AS inter,
        coalesce(array_to_string(
          list_sort(list_distinct(list_filter(a, x -> x <> a[1]))), '|'), '')
          AS exc,
        coalesce(array_to_string(list_transform(list_zip([1, 2, 3],
          [p_size, p_size + 1, p_size + 2]),
          z -> CAST(z[1] * z[2] AS INT)), '|'), '') AS zw,
        coalesce(array_to_string(flatten([a[1:1], a[2:2]]), '|'), '')
          AS flat,
        len(list_intersect(a, ['spring', 'peru'])) > 0 AS ovl,
        coalesce(array_to_string(list_sort(['sz', 'key']), '|'), '') AS mk,
        coalesce(array_to_string(
          list_sort([CAST(p_size AS BIGINT), p_partkey]), '|'), '') AS mv
      FROM t ORDER BY p_partkey""",
    "q_fn_string" -> """
      SELECT p_partkey,
        CAST(length(p_name) AS INT) AS len,
        upper(p_name) AS up,
        lower(p_brand) AS lo,
        substr(p_name, 1, 4) AS sub4,
        substr(p_name, length(p_name) - 2, 3) AS subneg,
        lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padkey,
        rpad(p_type, 10, '.') AS padtype,
        trim('  x  ') AS trimmed,
        reverse(p_brand) AS revb,
        repeat(p_type, 2) AS rep2,
        CAST(strpos(p_name, 'e') AS INT) AS pos_e,
        concat_ws('|', p_brand, p_type) AS cw,
        translate(p_name, 'aeiou', 'AEIOU') AS tr,
        split_part(p_name, ' ', 1) AS first_word,
        CAST(ascii(p_type) AS INT) AS asc,
        CAST(levenshtein(p_name, p_type) AS INT) AS lev,
        left(p_name, 3) AS l3,
        right(p_name, 3) AS r3
      FROM part WHERE p_partkey < 200 ORDER BY p_partkey""",
    "q_fn_regex" -> """
      SELECT p_partkey,
        regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        regexp_matches(p_name, '^(red|blue)') AS is_colored,
        CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_words
      FROM part WHERE p_partkey < 300 ORDER BY p_partkey""",
    "q_fn_date" -> """
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        CAST(dayofweek(o_orderdate) AS INT) AS dow0,
        CAST(weekofyear(o_orderdate) AS INT) AS woy,
        strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom,
        strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus45d,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
          AS INT) AS days_to_2002,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""",
    "q_fn_math" -> """
      SELECT p_partkey,
        round(p_retailprice, 0) AS rnd0,
        CAST(floor(p_retailprice) AS BIGINT) AS flr,
        CAST(ceil(p_retailprice) AS BIGINT) AS cl,
        abs(p_size - 25) AS ab,
        CAST(((p_partkey % 7) + 7) % 7 AS BIGINT) AS pm,
        CAST(p_partkey % 7 AS BIGINT) AS m7,
        round(sqrt(p_retailprice), 4) AS sq,
        round(pow(p_size, 2), 4) AS p2,
        round(exp(p_size / 25.0), 6) AS ex,
        round(ln(p_retailprice + 1), 6) AS lg,
        round(log10(p_retailprice + 1), 6) AS lg10,
        round(log2(p_size + 1.0), 6) AS lg2,
        round(cbrt(p_retailprice), 6) AS cb,
        round(sin(p_size / 10.0), 6) AS sn,
        round(atan2(CAST(p_size AS DOUBLE), 2.0), 6) AS at2,
        CAST(sign(p_size - 25) AS INT) AS sg,
        greatest(p_size, 10) AS gr,
        least(p_size, 40) AS ls,
        CAST(factorial(CAST(p_size % 10 AS INT)) AS BIGINT) AS fact,
        to_hex(p_partkey) AS hx,
        bin(p_partkey) AS bn,
        round(degrees(p_size / 10.0), 6) AS deg
      FROM part WHERE p_partkey < 300 ORDER BY p_partkey""",
    "q_fn_conditional" -> """
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'small' END AS bucket,
        CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END AS st,
        coalesce(nullif(o_orderstatus, 'P'), 'pending') AS nn,
        nullif(o_orderstatus, 'O') IS NULL AS is_open,
        coalesce(nullif(o_orderstatus, 'F'), 'was_f') AS nv
      FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",
    "q_fn_collection" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS t, text
                 FROM documents WHERE doc_id < 100)
      SELECT doc_id,
        CAST(len(t) AS INT) AS n_toks,
        CAST(len(list_distinct(t)) AS INT) AS n_uniq,
        t[1] AS first_tok,
        t[-1] AS last_tok,
        list_contains(t, 'spark') AS has_spark,
        array_to_string(list_sort(list_distinct(t))[2:4], '-') AS sorted_2_4,
        upper(array_to_string(t[1:5], ' ')) AS up5,
        CAST(len(list_filter(t, x -> length(x) > 5)) AS INT) AS n_long,
        CAST(length(replace(text, ' ', '')) AS BIGINT) AS tot_chars,
        list_contains(t, 'join') AS has_join,
        CAST(coalesce(list_position(list_sort(list_distinct(t)), 'data'), 0)
          AS BIGINT) AS pos_data
      FROM d ORDER BY doc_id""",
    "q_fn_json" -> """
      SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_int
      FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "q_fn_hash" -> """
      SELECT doc_id,
        md5(text) AS m,
        sha256(text) AS s256,
        CAST(length(text) AS INT) AS n_chars_live,
        CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes
      FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "q_fn_mask" -> """
      SELECT c_custkey,
        regexp_replace(regexp_replace(regexp_replace(c_name,
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
          AS masked,
        regexp_replace(regexp_replace(regexp_replace(c_name,
          '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g')
          AS masked_ulh
      FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""")
}
