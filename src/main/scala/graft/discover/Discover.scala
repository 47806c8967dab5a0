package graft.discover


import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source discovery + config-driven selection (SURVEY.md §2.1 S1/S2,
  * §2.2 F1–F3).
  *
  * The reference walks `base_dir/ALIAS/YYYY/MM/DD[/edition]`
  * (importers/detect.py:127-217) on the driver and filters by a config of
  * title include/exclude lists and date ranges (:12-124). Here the walk
  * stays a cheap driver-side listing producing a small descriptor
  * DataFrame; every filter is a Column predicate so Catalyst folds them
  * into one pass, and the incremental skip is a left-anti join
  * (generic_importer.py:240-249).
  */
object Discover {

  case class IssueRef(alias: String, date: java.sql.Date, edition: String,
      path: String)

  /** Walk `base/ALIAS/YYYY/MM/DD[/ed]` into issue descriptors. Detect is
    * IO-bound listing, not parsing — driver-side like the reference, but
    * emitting a DataFrame so selection composes with everything else.
    * The walk goes through Hadoop's FileSystem ([[graft.util.FsWalk]]),
    * so the same code lists a local mount or an object store. */
  def detectIssues(spark: SparkSession, baseDir: String): DataFrame = {
    import graft.util.FsWalk.subdirs
    val refs = for {
      alias <- subdirs(baseDir)
      year <- subdirs(alias.path) if year.name.matches("\\d{4}")
      month <- subdirs(year.path) if month.name.matches("\\d{2}")
      day <- subdirs(month.path) if day.name.matches("\\d{2}")
      (edition, path) <- {
        val eds = subdirs(day.path)
        if (eds.isEmpty) Seq("a" -> day.path)
        else eds.map(e => e.name -> e.path)
      }
    } yield IssueRef(alias.name,
      java.sql.Date.valueOf(s"${year.name}-${month.name}-${day.name}"),
      edition, path)
    import spark.implicits._
    refs.toDF()
  }

  /** Selection config (detect.py:69-124): include/exclude aliases and an
    * optional date spec per included alias — either `"1900/01/01-1910/12/31"`
    * ranges or year lists when `yearOnly`. */
  case class SelectConfig(
      titles: Map[String, Option[String]] = Map.empty,
      excludeTitles: Set[String] = Set.empty,
      yearOnly: Boolean = false)

  /** Apply a selection config as Column predicates (F1/F2). */
  def select(issues: DataFrame, config: SelectConfig): DataFrame = {
    val excluded = if (config.excludeTitles.isEmpty) lit(true)
      else !col("alias").isin(config.excludeTitles.toSeq: _*)
    val included = if (config.titles.isEmpty) lit(true)
      else config.titles.map { case (alias, spec) =>
        val aliasMatch = col("alias") === alias
        spec match {
          case None => aliasMatch
          case Some(s) if config.yearOnly =>
            val years = s.split("\\|").map(_.trim.toInt)
            aliasMatch && year(col("date")).isin(years.toSeq: _*)
          case Some(s) =>
            val ranges = s.split("\\|").map(_.trim.split("-"))
            val rangePred = ranges.map { r =>
              col("date").between(
                lit(r(0).replace('/', '-')).cast("date"),
                lit(r(1).replace('/', '-')).cast("date"))
            }.reduce(_ || _)
            aliasMatch && rangePred
        }
      }.reduce(_ || _)
    issues.filter(excluded && included)
  }

  /** Incremental skip (F3/J9): drop work units whose (alias, date,
    * edition) already exist in `done`. Left-anti join — at scale `done`
    * is a key listing, usually broadcastable. */
  def incremental(issues: DataFrame, done: DataFrame): DataFrame =
    issues.join(done.select("alias", "date", "edition"),
      Seq("alias", "date", "edition"), "left_anti")

  /** Parse the reference's `--config_file` JSON into a [[SelectConfig]]
    * (docs/importers.rst:64-105). Both key spellings are accepted —
    * the docs say `aliases`/`exclude_aliases`, the shipped production
    * configs (text_preparation/config/importer_config) use
    * `titles`/`exclude_titles`. An empty string or array as an alias's
    * date spec means "everything". */
  def parseConfig(json: String): SelectConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    def field(names: String*): Option[com.fasterxml.jackson.databind.JsonNode] =
      names.flatMap(n => Option(root.get(n))).headOption
    val titles = field("titles", "aliases").map { t =>
      t.properties().iterator().asScala.map { e =>
        val spec = e.getValue
        val s =
          if (spec == null || spec.isNull) None
          else if (spec.isTextual && spec.asText.nonEmpty) Some(spec.asText)
          else if (spec.isArray && spec.size > 0)
            // year lists: [1950, 1960] → "1950|1960"
            Some((0 until spec.size).map(spec.get(_).asText).mkString("|"))
          else None
        e.getKey -> s
      }.toMap
    }.getOrElse(Map.empty[String, Option[String]])
    val exclude = field("exclude_titles", "exclude_aliases").map { x =>
      (0 until x.size).map(x.get(_).asText).toSet
    }.getOrElse(Set.empty[String])
    val yearOnly = field("year_only").exists(_.asBoolean(false))
    SelectConfig(titles, exclude, yearOnly)
  }
}
