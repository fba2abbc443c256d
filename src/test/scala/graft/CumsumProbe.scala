package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off diagnostic: two-phase vs naive global cumsum on the sf0.1
  * documents frame (the q145 shape that mismatched its oracle). */
object CumsumProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val naive = t.withColumn("c",
        coalesce(sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("c").as("c_naive"))
    val two = graft.analytics.GlobalCumsum
      .cumsumBefore(t, Seq(col("doc_id")), col("n_tokens"), "c")
      .select(col("doc_id"), col("c").as("c_two"))
    val diff = naive.join(two, "doc_id")
      .where(col("c_naive") =!= col("c_two"))
    println(s"[probe] differing rows: ${diff.count()}")
    diff.orderBy("doc_id").show(10, false)
    // run the two-phase twice — is it even self-consistent?
    val two2 = graft.analytics.GlobalCumsum
      .cumsumBefore(t, Seq(col("doc_id")), col("n_tokens"), "c")
      .select(col("doc_id"), col("c").as("c_two2"))
    val selfdiff = two.join(two2, "doc_id").where(col("c_two") =!= col("c_two2"))
    println(s"[probe] self-inconsistent rows across two runs: ${selfdiff.count()}")
    s.stop()
  }
}
