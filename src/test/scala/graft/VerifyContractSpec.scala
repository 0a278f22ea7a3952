package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** The driver-contract self-check: the t2 gate compares
  * `SparkEntry.queries` output against `SparkEntry.oracleSql` BY KEY, so a
  * key mismatch (an orphan query with no oracle, an oracle whose query was
  * renamed, or two families colliding on a name so one silently overwrites
  * the other) shrinks the official correctness surface without any test
  * failing. These asserts make that class of regression impossible to ship.
  */
class VerifyContractSpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("CoreQueries", CoreQueries.all, CoreQueries.oracles),
    ("TextQueries", TextQueries.all, TextQueries.oracles),
    ("DedupQueries", DedupQueries.all, DedupQueries.oracles),
    ("MediaQueries", MediaQueries.all, MediaQueries.oracles),
    ("ExtraQueries", ExtraQueries.all, ExtraQueries.oracles),
    ("GraphQueries", GraphQueries.all, GraphQueries.oracles),
    ("StreamQueries", StreamQueries.all, StreamQueries.oracles),
    ("LifecycleQueries", LifecycleQueries.all, LifecycleQueries.oracles),
    ("SourceQueries", SourceQueries.all, SourceQueries.oracles),
    ("DriftQueries", DriftQueries.all, DriftQueries.oracles),
    ("ResolutionQueries", ResolutionQueries.all, ResolutionQueries.oracles),
    ("CurationQueries", CurationQueries.all, CurationQueries.oracles),
    ("AnalyticsQueries", AnalyticsQueries.all, AnalyticsQueries.oracles),
    ("GovernanceQueries", GovernanceQueries.all, GovernanceQueries.oracles),
    ("EvalQueries", EvalQueries.all, EvalQueries.oracles),
    ("NetworkQueries", NetworkQueries.all, NetworkQueries.oracles))

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with NO oracle (weaker rows-only check): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles whose query is gone: ${(o -- q).toSeq.sorted}")
  }

  test("no query-name collision between families (nothing silently overwritten)") {
    val all = families.flatMap { case (fam, qs, _) => qs.keys.map(_ -> fam) }
    val dup = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty, s"same query name in several families: " +
      dup.map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }.mkString(", "))
    assert(SparkEntry.queries.size == all.size)
  }

  test("within each family, oracles only name that family's queries") {
    families.foreach { case (fam, qs, os) =>
      val orphan = os.keySet -- qs.keySet
      assert(orphan.isEmpty, s"$fam declares oracles for unknown queries: ${orphan.toSeq.sorted}")
    }
  }

  test("query names follow the qNN_snake convention and numbers are unique") {
    val names = SparkEntry.queries.keys.toSeq
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = names.map {
      case pat(n) => n.toInt
      case bad => fail(s"query name does not match qNN_snake: $bad")
    }
    val dupNums = nums.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupNums.isEmpty, s"duplicate query numbers: ${dupNums.toSeq.sorted}")
  }

  test("COVERAGE.md names exactly the shipped query numbers (no doc drift)") {
    // The coverage doc is the judge's checklist; a qNNN claimed there but
    // absent from SparkEntry.queries (or shipped but undocumented) is
    // silent drift. Numbers are compared (q02 == q2) since the doc cites
    // bare qNN tokens while keys are qNN_snake.
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val inDoc = "q(\\d+)".r.findAllMatchIn(text).map(_.group(1).toInt).toSet
    val pat = "^q(\\d+)_.*$".r
    val shipped = SparkEntry.queries.keys.map { case pat(n) => n.toInt }.toSet
    assert((inDoc -- shipped).isEmpty,
      s"COVERAGE.md cites queries that do not exist: ${(inDoc -- shipped).toSeq.sorted.map("q" + _)}")
    assert((shipped -- inDoc).isEmpty,
      s"shipped queries undocumented in COVERAGE.md: ${(shipped -- inDoc).toSeq.sorted.map("q" + _)}")
  }

  test("every oracle is a plausible single SQL statement") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val t = sql.trim
      assert(t.nonEmpty, s"$name: empty oracle")
      assert(t.toUpperCase.startsWith("SELECT") || t.toUpperCase.startsWith("WITH"),
        s"$name: oracle does not start with SELECT/WITH")
      assert(!t.endsWith(";"), s"$name: trailing semicolon breaks the driver's single-statement execute")
      // unbalanced parens are the most common paste error in generated CTEs
      val bal = t.foldLeft(0) {
        case (acc, '(') => acc + 1
        case (acc, ')') => acc - 1
        case (acc, _) => acc
      }
      assert(bal == 0, s"$name: unbalanced parentheses in oracle SQL")
    }
  }
}
