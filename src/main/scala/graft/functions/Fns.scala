package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable scalar `Column` combinators — the engine's function library.
  *
  * These are the Spark-native forms of the scalar expressions the reference
  * uses throughout its SQL layer (SURVEY.md §2.9): NHL season derivation
  * (`dim_date.sql:62-71`), accent folding (`stg_player_name_crosswalk.sql:29-39`),
  * last-token extraction (`stg_player_name_crosswalk.sql:27`), American-odds
  * implied probability (`fact_player_sog_props_v2.sql:245-253`), "MM:SS" TOI
  * parsing (`docs/data_contracts/nhl_api/boxscore.yml:316-321`), and 5-ft
  * coordinate binning (`team_shot_locations.sql:21-22`).
  *
  * All are compositions of built-in codegen'd functions — no UDFs — so they
  * stay inside whole-stage codegen and remain pushdown/prune friendly.
  */
object Fns {

  /** NHL season code for a date: Oct–Dec → year*10000 + (year+1);
    * Jan–Jun → (year-1)*10000 + year; Jul–Sep (off-season) → null.
    * Mirrors `dim_date.sql:62-71`.
    */
  def nhlSeason(d: Column): Column = {
    val y = year(d)
    when(month(d).between(10, 12), y * 10000 + (y + 1))
      .when(month(d).between(1, 6), (y - 1) * 10000 + y)
      .otherwise(lit(null))
  }

  /** Season phase buckets (`dim_date.sql:74-81`). */
  def seasonPhase(d: Column): Column =
    when(month(d).isin(10, 11), "Early Season")
      .when(month(d).isin(12, 1, 2), "Mid Season")
      .when(month(d).isin(3, 4), "Late Season")
      .when(month(d).isin(5, 6), "Playoffs")
      .otherwise("Off Season")

  /** Day-of-week with the reference's 0=Sunday convention
    * (`dim_date.sql:48`; Spark's `dayofweek` is 1=Sunday — SURVEY §7.4.2).
    */
  def dayOfWeek0Sun(d: Column): Column = dayofweek(d) - 1

  /** Fold Latin accented characters to ASCII — same character classes as the
    * 5-nested-REGEXP_REPLACE chain in `stg_player_name_crosswalk.sql:29-39`,
    * extended to lower-case forms so it works pre- or post-UPPER.
    */
  def foldAccents(c: Column): Column = {
    val subs = Seq(
      "[ÁÀÂÃÄÅáàâãäå]" -> "A",
      "[ÉÈÊËéèêë]" -> "E",
      "[ÍÌÎÏíìîï]" -> "I",
      "[ÓÒÔÕÖóòôõö]" -> "O",
      "[ÚÙÛÜúùûü]" -> "U",
      "[Çç]" -> "C",
      "[Ññ]" -> "N"
    )
    subs.foldLeft(c) { case (acc, (re, to)) => regexp_replace(acc, re, to) }
  }

  /** Normalized match key: upper, trim, accents folded, periods stripped
    * (`fact_player_sog_props_v2.sql:103-104` strips "." and "'").
    */
  def normalizeName(c: Column): Column =
    upper(trim(foldAccents(regexp_replace(c, "[.']", ""))))

  /** Last whitespace token — Snowflake `SPLIT_PART(s, ' ', -1)`
    * (`stg_player_name_crosswalk.sql:27`). `element_at(split, -1)` has the
    * required negative-index semantics on Spark.
    */
  def lastToken(c: Column): Column = element_at(split(c, " "), -1)

  /** First character — Snowflake `LEFT(s, 1)`. */
  def firstInitial(c: Column): Column = substring(c, 1, 1)

  /** Implied probability of American odds (`fact_player_sog_props_v2.sql:245-253`):
    * positive odds → 100/(odds+100); negative → |odds|/(|odds|+100).
    */
  def impliedProb(odds: Column): Column = {
    val o = odds.cast("double")
    when(o > 0, lit(100.0) / (o + 100.0))
      .when(o < 0, -o / (-o + 100.0))
      .otherwise(lit(null))
  }

  /** "MM:SS" time-on-ice string → total seconds
    * (`boxscore.yml:316-321` silver TODO; implemented as split+cast).
    */
  def toiToSeconds(c: Column): Column =
    split(c, ":").getItem(0).cast("int") * 60 + split(c, ":").getItem(1).cast("int")

  /** 5-ft absolute coordinate bin: `ROUND(ABS(x)/w)*w`
    * (`team_shot_locations.sql:21-22`).
    */
  def binCoord(c: Column, width: Int = 5): Column =
    (round(abs(c) / width, 0) * width).cast("int")

  /** Null-safe ratio: x / NULLIF(y, 0) (`team_shots_against_by_position.sql:61-62`). */
  def safeDiv(x: Column, y: Column): Column =
    x.cast("double") / nullif(y.cast("double"), lit(0.0))

  /** `ROUND(num/den, 2)` computed on the EXACT rational with
    * half-away-from-zero ties — Snowflake's ROUND-on-DECIMAL semantics
    * (the reference's `ROUND(AVG(sog), 2)` etc. run on exact NUMBER
    * averages, `team_shot_metrics.sql:24-36`). Evaluating `round` on an
    * IEEE double instead silently diverges on values like 2.675 (stored as
    * 2.67499…), and diverges BETWEEN engines (Spark rounds the shortest
    * decimal rendering, DuckDB rounds via `x*100`): this integer form —
    * `sign(n) * floor((200|n| + d) / (2d)) / 100` — is both the faithful
    * semantics and bit-exact cross-engine. Returns null when `den` is
    * null/0 (the models' `NULLIF(den, 0)` idiom). Inputs must be integer
    * columns; floor-of-double is exact here because the quotient sits at
    * least `1/(2·den)` from any integer, far above double error at these
    * magnitudes.
    */
  def roundDiv2(num: Column, den: Column): Column = {
    val n = num.cast("long")
    val d = den.cast("long")
    // sign and magnitude handled separately so a NEGATIVE denominator
    // still rounds half-away-from-zero (the old +d tie shift and
    // signum(n) result sign were correct only for d > 0; every in-repo
    // caller passes counts, but the utility is public)
    when(d.isNull || d === 0 || n.isNull, lit(null).cast("double"))
      .otherwise(signum(n) * signum(d) *
        floor((lit(200L) * abs(n) + abs(d)) / (lit(2L) * abs(d))) / 100.0)
  }
}
