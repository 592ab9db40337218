package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints physical plans for headline queries so scan pruning,
  * pushdown, join strategies, and codegen spans can be audited. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q2_filter_project", "q3_join_broadcast",
        "ref_interval_join", "s1_ann_bruteforce", "t1_tumble")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
