package graft.cli

import graft.parse._

/** Uniform handle over every importer's (detect, parse) pair — the
  * registry behind [[ImporterCli]], playing the role of the
  * reference's per-format CLI scripts that all funnel into
  * `generic_importer.main(issue_class, detect_func, select_func)`
  * (generic_importer.py:162-200; script list in setup.py).
  *
  * A handle closes over its format-typed ref and exposes the canonical
  * (alias, date, edition) triple for config selection plus a
  * `(cdt, ts) => parsed` thunk; handles are broadcast to executors by
  * [[graft.jobs.ImportJob.run]], so the closures must stay serializable
  * (they capture only the ref case classes and importer objects).
  */
object Formats {

  final case class IssueHandle(
      alias: String, date: String, edition: String,
      parse: (String, String) => (String, String, Seq[(String, String)])) {
    def issueId: String = s"$alias-$date-$edition"
  }

  /** Formats whose inputs are a plain directory walk. */
  val names: Seq[String] = Seq("lux", "olive", "rero", "swa", "bnf",
    "bnf_en", "bcul", "bl", "tetml", "fedgaz", "ina", "swissinfo",
    "onb", "kb")

  /** Detect all issues of `format` under `inputDir`.
    *
    * @param opts format-specific extras: `ark-file` (bnf_en) points to a
    *             two-column TSV `issueId<TAB>ark` replacing the
    *             reference's live Gallica API lookup (SURVEY §7.4).
    */
  def detect(format: String, inputDir: String,
      opts: Map[String, String] = Map.empty): Seq[IssueHandle] =
    format match {
      case "lux" => LuxImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = LuxImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "olive" => OliveImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = OliveImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "rero" => ReroImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = ReroImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "swa" => SwaImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = SwaImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "bnf" => BnfImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = BnfImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "bnf_en" =>
        val arks = opts.get("ark-file").map { f =>
          new String(graft.util.FsWalk.readBytes(f), "utf-8")
            .split("\r?\n").iterator
            .map(_.split("\t")).collect { case Array(k, v) => k -> v }.toMap
        }.getOrElse(Map.empty[String, String])
        BnfEnImporter.detectIssues(inputDir, arks).map { r =>
          IssueHandle(r.alias, r.date, r.edition, (c, t) => {
            val p = BnfEnImporter.parseIssue(r, c, t)
            (p.issueId, p.issueJson, p.pageJsons) })
        }
      case "bcul" => BculImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = BculImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "bl" => BlImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = BlImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "tetml" => TetmlImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = TetmlImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "fedgaz" => FedgazImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = FedgazImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "ina" => InaImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (_, t) => {
          val p = InaImporter.parseIssue(r, t)
          (p.issueId, p.issueJson, p.recordJsons) })
      }
      case "swissinfo" => SwissInfoImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (_, t) => {
          val p = SwissInfoImporter.parseIssue(r, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "onb" => OnbImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = OnbImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case "kb" => KbImporter.detectIssues(inputDir).map { r =>
        IssueHandle(r.alias, r.date, r.edition, (c, t) => {
          val p = KbImporter.parseIssue(r, c, t)
          (p.issueId, p.issueJson, p.pageJsons) })
      }
      case other => throw new IllegalArgumentException(
        s"unknown format '$other' (expected one of ${names.mkString(", ")})")
    }
}
