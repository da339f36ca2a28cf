package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection main: prints the formatted physical plan of selected
  * queries so scan pruning / pushdown / join strategy / codegen coverage can
  * be audited (args: [sfDir] [queryName...]; default: a representative set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q02_filter_project", "q11_join_star", "q15_topk",
      "q01_pricing_summary", "q40_cosine_topk", "q25_asof_join",
      "q54_topk_group_native", "q59_min_cost_supplier", "q36_minhash_pairs",
      "q38_ngram_jaccard", "q66_dedup_components", "q37_simhash_pairs",
      "q113_containment_dedup", "q105_pagerank", "q118_skyline")
    val spark = Graft.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      Transients.drop(spark) // construction-time cuts (graph rounds etc.)
    }
    spark.stop()
  }
}
