package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract lints over the registered surface — pure map checks,
  * no Spark session. */
class OracleContractSpec extends AnyFunSuite {

  /** Queries whose operator hinges on a hash family DuckDB lacks
    * (xxhash64 minhash/simhash) or on approximate-by-nature sketches —
    * the DOCUMENTED rows-only set. Anything else losing its oracle is a
    * regression, not a judgment call. */
  private val rowsOnlyByNature = Set(
    "q36_minhash_pairs", "q37_simhash_pairs", "q42_ann_lsh",
    "q52_approx_distinct", "q56_ann_ivf", "q61_embedding_neardup")

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
