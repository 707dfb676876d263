package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Fns

/** SURVEY.md §2.9 — scalar function families (string / regex / date / math /
  * conditional / conversion), plus the reference's NHL-domain expressions
  * (season derivation, odds math, TOI parsing, date spine) exercised through
  * `graft.functions.Fns`.
  *
  * Everything here is a built-in codegen'd expression — zero UDFs — so these
  * projections fuse into whole-stage codegen with whatever scan/filter they
  * ride on (SURVEY §2.11: the reference's SQL surface is 100% built-ins).
  */
object ScalarQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // String family: UPPER/TRIM/CONCAT/||, SPLIT_PART(-1), LEFT(s,1),
    // LENGTH, contains, REPLACE (dim_team.sql:38-46; crosswalk:27-47).
    "sc_string" -> { (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("label"),
        Fns.lastToken(regexp_replace(col("c_name"), "#", " ")).as("last_part"),
        Fns.firstInitial(col("c_name")).as("initial"),
        length(col("c_name")).as("name_len"),
        col("c_name").contains("9").as("has_9"),
        expr("replace(c_name, 'Customer', 'Cust')").as("short_name"))
    },

    // Regex family: group extract + global replace + the accent-folding
    // chain (crosswalk:29-39; COPY INTO regex, nhl_daily_ingestion_dag.py:161).
    "sc_regex" -> { (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "[aeiou]", "").as("no_vowels"),
        Fns.normalizeName(col("c_name")).as("norm_name"))
    },

    // Date family incl. the 0=Sunday DAYOFWEEK convention (dim_date.sql:45-56;
    // SURVEY §7.4.2) and month/day names.
    "sc_date" -> { (s, dir) =>
      val d = col("o_orderdate").cast("date")
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        d.as("d"),
        year(d).as("y"),
        month(d).as("m"),
        dayofmonth(d).as("dom"),
        dayofyear(d).as("doy"),
        Fns.dayOfWeek0Sun(d).as("dow0"),
        weekofyear(d).as("iso_week"),
        date_format(d, "MMMM").as("month_name"),
        date_format(d, "EEEE").as("day_name"),
        date_add(d, 30).as("d_plus30"),
        add_months(d, 3).as("d_plus3mo"),
        trunc(d, "MM").as("month_start"))
    },

    // Date-spine generation + NHL season/phase domain expressions
    // (dim_date.sql:12-28,62-81): row-generator spine → derived calendar.
    "sc_datespine" -> { (s, dir) =>
      s.range(1).select(explode(sequence(
        to_date(lit("2020-01-01")), to_date(lit("2022-09-26")),
        expr("interval 1 day"))).as("date_day"))
        .select(
          col("date_day"),
          Fns.nhlSeason(col("date_day")).cast("int").as("season"),
          Fns.seasonPhase(col("date_day")).as("season_phase"),
          Fns.dayOfWeek0Sun(col("date_day")).as("dow0"),
          Fns.dayOfWeek0Sun(col("date_day")).isin(0, 6).as("is_weekend"))
    },

    // Math family: ROUND(x,2), ABS, NULLIF-guarded divide, floor/ceil,
    // pct scaling, 5-unit binning (team_shot_metrics.sql:107-119;
    // team_shot_locations.sql:21-22).
    "sc_math" -> { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        // raw IEEE product (identical cross-engine); ROUND's half-tie
        // behavior on binary doubles diverges between engines, so the
        // rounded variant uses qty/7 whose quotient can never hit a .xx5 tie
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"),
        round(col("l_quantity") / 7, 2).as("qty_per_week"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        Fns.safeDiv(col("l_tax"), col("l_discount")).as("tax_per_disc"),
        floor(col("l_extendedprice") / 7).as("price_div7_floor"),
        ceil(col("l_extendedprice") / 7).as("price_div7_ceil"),
        (lit(100.0) * col("l_discount")).as("disc_pct"),
        Fns.binCoord(col("l_quantity") - 25, 5).as("qty_bin5"))
    },

    // Conditional family: CASE/COALESCE/NULLIF/LEAST/GREATEST/bool flags
    // (fact_game_results.sql:60-64; player_shot_metrics.sql:178-203).
    "sc_cond" -> { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "med")
          .otherwise("high").as("price_bucket"),
        (col("o_orderpriority") === "1-URGENT").as("is_urgent"),
        least(col("o_totalprice"), lit(250000.0)).as("capped_price"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floored_price"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), col("o_orderpriority")).as("status_or_pri"))
    },

    // Conversion family: casts + the season-code CONCAT(year,year+1)::INT
    // idiom (dim_player.sql:59-66).
    "sc_conv" -> { (s, dir) =>
      val y = year(col("o_orderdate"))
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_orderkey").cast("string").cast("long").as("key_roundtrip"),
        concat(y.cast("string"), (y + 1).cast("string")).cast("int").as("season_code"),
        floor(col("o_totalprice")).cast("long").as("price_floor_int"),
        (col("o_orderstatus") === "F").as("is_final"))
    },

    // Edit-distance family (the quantitative backbone of fuzzy name
    // matching, stg_player_name_crosswalk.sql's cascade): levenshtein
    // against a perturbed twin of each name.
    "sc_fuzzy" -> { (s, dir) =>
      val perturbed = concat(expr("replace(c_name, '0', 'O')"), lit("x"))
      Tables.customer(s, dir).select(
        col("c_custkey"),
        perturbed.as("perturbed"),
        levenshtein(col("c_name"), perturbed).as("edit_dist"),
        (levenshtein(col("c_name"), perturbed) <= 3).as("is_close"))
    },

    // NHL domain: American-odds implied probability
    // (fact_player_sog_props_v2.sql:245-253) and "MM:SS" TOI parsing
    // (boxscore.yml:316-321), built from the JSON k field.
    "sc_odds_toi" -> { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("int")
      val odds = when(k >= 50, k + 100).otherwise(-(k + 100))
      val toiStr = concat(
        lpad((k % 20 + 1).cast("string"), 2, "0"), lit(":"),
        lpad((k % 60).cast("string"), 2, "0"))
      Tables.events(s, dir).select(
        col("event_id"),
        odds.as("odds_american"),
        Fns.impliedProb(odds).as("implied_prob"),
        toiStr.as("toi"),
        Fns.toiToSeconds(toiStr).as("toi_seconds"))
    },

    // Array higher-order functions (beyond the reference — its only array
    // op is flatten): transform/filter/aggregate/exists over a token
    // array, all evaluated per-row with no explode→regroup round trip.
    // At 100 TB that round trip is a shuffle (explode, groupBy doc_id);
    // the HOF form is a narrow map — same split convention as f1, integer
    // outputs for cross-engine exactness.
    "sc_array_hof" -> { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(filter(col("toks"), t => length(t) >= 6)).cast("long").as("n_long"),
          aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
          array_max(transform(col("toks"), t => length(t))).cast("long").as("max_tok_len"),
          exists(col("toks"), t => t.rlike("[0-9]")).as("has_digit"))
    }
  )

  val oracles: Map[String, String] = Map(
    "sc_string" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        |  c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS label,
        |  split_part(replace(c_name, '#', ' '), ' ', -1) AS last_part,
        |  substring(c_name, 1, 1) AS initial,
        |  length(c_name) AS name_len,
        |  contains(c_name, '9') AS has_9,
        |  replace(c_name, 'Customer', 'Cust') AS short_name
        |FROM customer""".stripMargin,
    "sc_regex" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '[aeiou]', '', 'g') AS no_vowels,
        |  upper(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[.'']', '', 'g'),
        |    '[ÁÀÂÃÄÅáàâãäå]', 'A', 'g'), '[ÉÈÊËéèêë]', 'E', 'g'),
        |    '[ÍÌÎÏíìîï]', 'I', 'g'), '[ÓÒÔÕÖóòôõö]', 'O', 'g'),
        |    '[ÚÙÛÜúùûü]', 'U', 'g'), '[Çç]', 'C', 'g'), '[Ññ]', 'N', 'g'))) AS norm_name
        |FROM customer""".stripMargin,
    "sc_date" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |  CAST(dayofweek(o_orderdate) % 7 AS INTEGER) AS dow0,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        |  monthname(o_orderdate) AS month_name,
        |  dayname(o_orderdate) AS day_name,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS d_plus30,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS d_plus3mo,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders""".stripMargin,
    "sc_datespine" ->
      """SELECT CAST(d AS DATE) AS date_day,
        |  CAST(CASE WHEN month(d) >= 10 THEN year(d)*10000 + year(d) + 1
        |            WHEN month(d) <= 6  THEN (year(d)-1)*10000 + year(d)
        |       END AS INTEGER) AS season,
        |  CASE WHEN month(d) IN (10,11) THEN 'Early Season'
        |       WHEN month(d) IN (12,1,2) THEN 'Mid Season'
        |       WHEN month(d) IN (3,4) THEN 'Late Season'
        |       WHEN month(d) IN (5,6) THEN 'Playoffs'
        |       ELSE 'Off Season' END AS season_phase,
        |  CAST(dayofweek(d) % 7 AS INTEGER) AS dow0,
        |  dayofweek(d) % 7 IN (0, 6) AS is_weekend
        |FROM (SELECT unnest(generate_series(DATE '2020-01-01', DATE '2022-09-26',
        |                                    INTERVAL 1 DAY)) AS d)""".stripMargin,
    "sc_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS disc_price,
        |  round(l_quantity / 7, 2) AS qty_per_week,
        |  abs(l_quantity - 25) AS qty_dev,
        |  l_tax / nullif(l_discount, 0.0) AS tax_per_disc,
        |  CAST(floor(l_extendedprice / 7) AS BIGINT) AS price_div7_floor,
        |  CAST(ceil(l_extendedprice / 7) AS BIGINT) AS price_div7_ceil,
        |  100.0 * l_discount AS disc_pct,
        |  CAST(round(abs(l_quantity - 25)/5, 0) * 5 AS INTEGER) AS qty_bin5
        |FROM lineitem""".stripMargin,
    "sc_cond" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 100000 THEN 'low'
        |       WHEN o_totalprice < 300000 THEN 'med' ELSE 'high' END AS price_bucket,
        |  o_orderpriority = '1-URGENT' AS is_urgent,
        |  least(o_totalprice, 250000.0) AS capped_price,
        |  greatest(o_totalprice, 50000.0) AS floored_price,
        |  coalesce(nullif(o_orderstatus, 'O'), o_orderpriority) AS status_or_pri
        |FROM orders""".stripMargin,
    "sc_conv" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
        |  CAST(CAST(year(o_orderdate) AS VARCHAR) ||
        |       CAST(year(o_orderdate)+1 AS VARCHAR) AS INTEGER) AS season_code,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor_int,
        |  o_orderstatus = 'F' AS is_final
        |FROM orders""".stripMargin,
    "sc_fuzzy" ->
      """SELECT c_custkey,
        |  replace(c_name, '0', 'O') || 'x' AS perturbed,
        |  levenshtein(c_name, replace(c_name, '0', 'O') || 'x') AS edit_dist,
        |  levenshtein(c_name, replace(c_name, '0', 'O') || 'x') <= 3 AS is_close
        |FROM customer""".stripMargin,
    "sc_odds_toi" ->
      """SELECT event_id,
        |  CASE WHEN k >= 50 THEN k + 100 ELSE -(k + 100) END AS odds_american,
        |  CASE WHEN k >= 50 THEN 100.0 / ((k + 100) + 100)
        |       ELSE CAST(k + 100 AS DOUBLE) / ((k + 100) + 100) END AS implied_prob,
        |  lpad(CAST(k % 20 + 1 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST(k % 60 AS VARCHAR), 2, '0') AS toi,
        |  (k % 20 + 1) * 60 + (k % 60) AS toi_seconds
        |FROM (SELECT event_id, CAST(json_extract_string(props,'$.k') AS INTEGER) AS k
        |      FROM events)""".stripMargin,
    "sc_array_hof" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(toks, t -> length(t) >= 6)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_chars,
        |  list_max(list_transform(toks, t -> length(t))) AS max_tok_len,
        |  len(list_filter(toks, t -> regexp_matches(t, '[0-9]'))) > 0 AS has_digit
        |FROM t""".stripMargin
  )
}
