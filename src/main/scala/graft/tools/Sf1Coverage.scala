package graft.tools

/** The round-6 recurring failure mode: an operator lands after the sf1
  * sweep and ships with no 10x measurement at all. This closes the loop
  * structurally — every registered query must either be in the
  * `tools/sf1_gate.sh` replay list or carry a documented exclusion line in
  * `tools/sf1_exclusions.txt` (name + reason, the oracle-cost/ground-truth
  * -twin cases). EntrySmoke and Sf1CoverageSpec both assert it, so a query
  * cannot register without declaring its 10x story.
  */
object Sf1Coverage {
  private val nameRe = "[qrsx][0-9]+_[a-z0-9_]+".r

  /** Repo root resolved structurally, not from the cwd: SPARK_GRAFT_REPO if
    * set, else walk up from user.dir to the first directory holding
    * `tools/sf1_gate.sh` — so EntrySmoke and the specs work from any
    * working directory inside the repo. */
  def defaultRoot(): String =
    sys.env.get("SPARK_GRAFT_REPO").getOrElse {
      var d = new java.io.File(System.getProperty("user.dir")).getAbsoluteFile
      while (d != null && !new java.io.File(d, "tools/sf1_gate.sh").isFile)
        d = d.getParentFile
      require(d != null, "repo root not found (set SPARK_GRAFT_REPO)")
      d.getPath
    }

  /** Query names in the sf1 gate's ONLY list. Parsed from INSIDE the
    * `ONLY=$(printf ...)` argument block only — text before it (the
    * header's prose exclusion notes) and after its closing paren (the
    * check.py invocation, future trailing comments) can never be
    * miscounted as entries. */
  def gateNames(root: String = defaultRoot()): Set[String] = {
    val txt = scala.io.Source.fromFile(s"$root/tools/sf1_gate.sh", "UTF-8").mkString
    val after = txt.split("ONLY=\\$\\(printf", 2)
    require(after.length == 2, "sf1_gate.sh lost its ONLY=$(printf ...) list")
    val block = after(1).split("\\)", 2)
    require(block.length == 2, "sf1_gate.sh ONLY printf block is unterminated")
    nameRe.findAllIn(block(0)).toSet
  }

  /** Documented exclusions: `name  reason` lines, '#' comments allowed. */
  def excludedNames(root: String = defaultRoot()): Map[String, String] = {
    scala.io.Source.fromFile(s"$root/tools/sf1_exclusions.txt", "UTF-8")
      .getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split("\\s+", 2)
        require(parts.length == 2 && parts(1).trim.nonEmpty,
          s"sf1_exclusions.txt line needs 'name reason': '$l'")
        parts(0) -> parts(1).trim
      }
      .toMap
  }

  /** Registered queries with neither a gate entry nor a documented
    * exclusion — must be empty. */
  def uncovered(queryNames: Set[String], root: String = defaultRoot()): Set[String] =
    queryNames -- gateNames(root) -- excludedNames(root).keySet

  /** Stale rows: gate/exclusion entries for queries that no longer exist,
    * and names listed BOTH ways (an exclusion for a query the gate runs). */
  def stale(queryNames: Set[String], root: String = defaultRoot()): Set[String] =
    (gateNames(root) -- queryNames) ++ (excludedNames(root).keySet -- queryNames) ++
      (gateNames(root) intersect excludedNames(root).keySet)
}
