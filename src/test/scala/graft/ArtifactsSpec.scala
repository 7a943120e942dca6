package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registration ⇒ regenerate-artifacts, enforced (round-10 verdict #1: two
  * consecutive rounds ended with a final-commit query green in the gate but
  * absent from the committed bench trio / sf0.1 artifact — an omission only
  * a judge could catch). This spec makes the omission a test failure: every
  * name in [[SparkEntry.queries]] must appear in the LATEST committed bench
  * trio (all three runs) and the latest committed sf0.1 gate artifact, and
  * nothing stale may linger there. `sbt test` therefore goes red the moment
  * a query is registered until the artifacts are regenerated
  * (`SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"` ×3
  * and `tools/sf01_gate.py`).
  *
  * Parsing is deliberately primitive (regex over the committed JSON text,
  * no schema assumptions beyond the `"name":<number>` pairs Bench prints
  * and the top-level keys the gate script writes) so the spec never needs
  * a JSON library the artifacts could outgrow.
  */
class ArtifactsSpec extends AnyFunSuite {

  private def read(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  /** Latest round number among committed files matching `prefix<digits>suffix`. */
  private def latestRound(dir: java.io.File, re: scala.util.matching.Regex): Option[Int] =
    dir.listFiles().flatMap(f => re.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .sorted.lastOption

  private val repo = new java.io.File(".")
  private val registered: Set[String] = SparkEntry.queries.keySet

  private def queryNames(json: String): Set[String] = {
    // names are the keys of the "queries" object — scope the scan to that
    // object's span (flat name->number map, so it ends at the first '}')
    // instead of excluding an ever-growing list of scalar artifact fields
    val span = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json)
      .getOrElse(fail("artifact has no \"queries\":{...} object")).group(1)
    """"([A-Za-z0-9_.]+)"\s*:""".r.findAllMatchIn(span).map(_.group(1)).toSet
  }

  test("every registered query is in the latest committed bench trio") {
    val re = """^BENCH_local_r(\d+)_run1\.json$""".r
    val round = latestRound(repo, re).getOrElse(fail("no committed bench trio found"))
    (1 to 3).foreach { run =>
      val f = new java.io.File(repo, s"BENCH_local_r${round}_run$run.json")
      assert(f.exists(), s"trio round $round is missing run $run")
      val names = queryNames(read(f))
      val missing = registered -- names
      assert(missing.isEmpty,
        s"queries registered but absent from ${f.getName} — regenerate the trio: $missing")
      val stale = names -- registered
      assert(stale.isEmpty, s"stale queries in ${f.getName}: $stale")
    }
  }

  private def checkGateArtifact(sfTag: String): Unit = {
    val re = ("""^CORRECTNESS_""" + java.util.regex.Pattern.quote(sfTag) +
      """_r(\d+)\.json$""").r
    val round = latestRound(repo, re).getOrElse(fail(s"no committed $sfTag gate artifact"))
    val f = new java.io.File(repo, s"CORRECTNESS_${sfTag}_r$round.json")
    // gate artifact: {"counts": ..., "protocol": ..., "queries": {name: {...}}}
    // — query names are exactly the object-valued keys minus the two
    // structural wrappers
    val keys = """"([A-Za-z0-9_.]+)"\s*:\s*\{""".r
      .findAllMatchIn(read(f)).map(_.group(1)).toSet -- Set("counts", "queries")
    val missing = registered -- keys
    assert(missing.isEmpty,
      s"queries registered but absent from ${f.getName} — rerun tools/sf01_gate.py: $missing")
    val stale = keys -- registered
    assert(stale.isEmpty, s"stale queries in ${f.getName}: $stale")
  }

  test("every registered query is in the latest committed sf0.1 gate artifact") {
    checkGateArtifact("sf0.1")
  }

  test("test-report directory carries no report for a deleted spec") {
    // sbt never deletes a TEST-*.xml when its spec is removed from
    // src/test, so a deleted suite can leave green-looking residue that
    // inflates report counts (round-11 verdict #3: HybridNullReviewSpec)
    val reports = new java.io.File(repo, "target/test-reports")
    if (reports.isDirectory) {
      val live = new java.io.File(repo, "src/test/scala/graft")
        .listFiles().map(_.getName.stripSuffix(".scala")).toSet
      val orphans = reports.listFiles().map(_.getName)
        .collect { case n if n.startsWith("TEST-graft.") && n.endsWith(".xml") =>
          n.stripPrefix("TEST-graft.").stripSuffix(".xml") }
        .filterNot(live)
      assert(orphans.isEmpty,
        s"stale test reports for deleted specs — rm them: ${orphans.toSeq}")
    }
  }
}
