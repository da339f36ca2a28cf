package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract lints over the registered surface — pure map checks,
  * no Spark session. */
class OracleContractSpec extends AnyFunSuite {

  /** The DOCUMENTED rows-only set — since round 7 exactly ONE query:
    * q52 exercises Spark's built-in approx_count_distinct, whose value IS
    * the engine-private HLL++ sketch (xxhash64 over internal row bytes +
    * Spark's bias tables); no DuckDB SQL can reproduce it, and re-keying
    * would stop testing the built-in (the portable re-keyed cardinality
    * sketch is q141/q225, both oracle-exact). See SURVEY.md §2.3.1.
    * Anything else losing its oracle is a regression, not a judgment
    * call — and an allowlisted query GAINING an oracle must leave here. */
  private val rowsOnlyByNature = Set("q52_approx_distinct")

  test("every registered query has an oracle, or is rows-only BY NATURE") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q -- o -- rowsOnlyByNature
    assert(missing.isEmpty,
      s"queries without an oracle and not in the documented rows-only set: " +
        s"${missing.toSeq.sorted.mkString(", ")}")
    // and the allowlist itself never silently gains an oracle unnoticed
    val healed = rowsOnlyByNature.intersect(o)
    assert(healed.isEmpty,
      s"rows-only queries that now HAVE oracles — move them out of the " +
        s"allowlist: ${healed.toSeq.sorted.mkString(", ")}")
  }

  test("no orphan oracles (keys without a registered query)") {
    // streaming twins legitimately alias batch oracles; q83 is registered
    // under its own key
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle entries with no matching query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("oracle SQL never uses the engine-divergent \\s shorthand") {
    // Java's \s includes \x0B, RE2's does not — the one latent tokenizer
    // divergence this repo has shipped. Every whitespace regex must spell
    // the pinned class [ \t\n\x0B\f\r] instead.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("\\s") => name
    }
    assert(offenders.isEmpty,
      s"oracles using \\s (pin the explicit class instead): " +
        s"${offenders.toSeq.sorted.mkString(", ")}")
  }
}
