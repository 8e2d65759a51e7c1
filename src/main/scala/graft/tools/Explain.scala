package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan-inspection aid: prints the formatted physical plan of the named
  * graded queries (all when no args). Build tool, not part of the API.
  * Usage: runMain graft.tools.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
