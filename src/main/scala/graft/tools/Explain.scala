package graft.tools

import graft.{EngineSession, SparkEntry}

/** Plan-audit tool: print the formatted physical plan of one or more
  * registered queries without executing them — the iterate-on-the-plan
  * loop (`.explain("formatted")`) as a one-liner.
  *
  * Usage: runMain graft.tools.Explain <sfDir> <nameRegex>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val re = args.lift(1).getOrElse("^q01_").r
    val spark = EngineSession.create("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => re.findFirstIn(n).isDefined }
      .foreach { case (name, q) =>
        println(s"\n===== $name =====")
        q(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
