package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's cleaning surface (SURVEY.md §2c) as pure native
  * expressions — no UDFs, so every transform stays inside whole-stage
  * codegen and the scan's column pruning is unaffected.
  *
  * The canonicalization tables (street_mapping :192-216, city_mapping
  * :253-259) become map literals; lookup is `element_at` on a literal map
  * — constant-folded by Catalyst into a codegen'd hash probe.
  */
object Cleaning {

  /** Mapping-table analog of street_mapping (openstreet_kolkata.py:192-216)
    * over the synthetic vocabulary. */
  val suffixMapping: Map[String, String] = Map(
    "agg"    -> "aggregate",
    "fn"     -> "function",
    "col"    -> "column",
    "tbl"    -> "table",
    "qry"    -> "query",
    "window" -> "windowed",
    "join"   -> "joined",
    "scan"   -> "scanned")

  /** city_mapping analog (:253-259): canonicalize a code via first-word
    * lookup with identity fallback. */
  val langMapping: Map[String, String] = Map(
    "en" -> "english", "fr" -> "french", "de" -> "german",
    "es" -> "spanish", "zh" -> "chinese")

  private def mapLit(m: Map[String, String]): Column =
    map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** C1 fix_street_name (:217-237): two-output scalar transform.
    * (1) canonicalize the trailing token via the mapping table, matching
    * case-insensitively after stripping a trailing '.' — implemented as
    * regexp_extract + element_at(mapLiteral) + coalesce + regexp_replace;
    * (2) split a leading house-number-like digit run off the front and
    * return it as a separate column. The reference's slice bug (:225,
    * "Foo Rd." → "Foo RRoad") is NOT replicated — SURVEY §7 decision:
    * implement intended semantics.
    */
  def c1FixSuffix(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val lastTok  = regexp_extract(col("text"), """(\S+)\s*$""", 1)
    val stripped = regexp_replace(lower(lastTok), """\.$""", "")
    val canon    = element_at(mapLit(suffixMapping), stripped)
    val fixedTail = coalesce(canon, lastTok)
    val fixedText = concat(
      regexp_replace(col("text"), """\S+\s*$""", ""), fixedTail)
    val leadingNum = regexp_extract(col("text"), """^\s*(\d+)""", 1)
    val deNumbered = regexp_replace(fixedText, """^\s*\d+[^a-zA-Z]*""", "")
    d.select(
      col("doc_id"),
      lastTok.as("last_token"),
      fixedTail.as("fixed_token"),
      when(leadingNum =!= "", leadingNum).as("housenum"),
      substring(deNumbered, 1, 60).as("cleaned_head"))
  }

  /** C2 fix_city_name (:261-268): first-word lookup in a small mapping
    * with identity fallback, then a group-count to show the cleaned
    * distribution. */
  def c2FixLang(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val first = element_at(split(lower(col("lang")), " "), 1)
    val fixed = coalesce(element_at(mapLit(langMapping), first), col("lang"))
    d.select(fixed.as("lang_fixed"))
      .groupBy(col("lang_fixed")).agg(count(lit(1)).as("n"))
  }

  /** R1 shape_element (:463-537) proxy on the synthetic tables: the same
    * nested-projection shape — closed attributes into a `created` struct,
    * coordinates into a numeric array, the open keyspace into a map —
    * then flattened back for the oracle. Catalyst collapses the
    * build/flatten pair into a single Project over the scan; the nested
    * intermediate is exercised in OsmShapeSpec against real XML.
    */
  def r1Reshape(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val shaped = d.select(
      col("doc_id"),
      struct(
        col("source").as("user"),
        col("lang").as("type"),
        col("n_chars").as("len"))
        .as("created"),
      array(col("n_chars").cast("double"), col("doc_id").cast("double"))
        .as("pos"),
      map(lit("lang"), col("lang"), lit("source"), col("source"))
        .as("tags"))
    shaped.select(
      col("doc_id"),
      col("created.user").as("created_user"),
      col("created.type").as("created_type"),
      col("created.len").as("created_len"),
      element_at(col("pos"), 1).as("pos_0"),
      element_at(col("tags"), "lang").as("tag_lang"))
  }
}
