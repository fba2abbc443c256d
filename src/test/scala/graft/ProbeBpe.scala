package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profile of the BPE merge loop phases (not CI). */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = spark.range(500_000)
      .select(col("id").as("doc_id"),
        md5(col("id").cast("string")).substr(1, 12).as("text"),
        (col("id") % 1000 + 1).as("w"))
      .select(col("doc_id"),
        array_join(array_repeat(col("text"), (col("w") % 7 + 1).cast("int")), " ").as("text"))
      .localCheckpoint()

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    var dict = t("wordDict build+persist") {
      val d = Bpe.wordDict(vocab, "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    for (step <- 1 to 16) {
      val best = t(s"step $step pairCounts+argmax") {
        Bpe.pairCounts(dict)
          .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      }
      val (l, r) = (best(0).getString(0), best(0).getString(1))
      val next = t(s"step $step merge+persist+count") {
        val n = dict.withColumn("sym", replace(col("sym"),
          lit(s"|$l||$r|"), lit(s"|${l + r}|")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        n.count(); n
      }
      dict.unpersist(false)
      dict = next
    }
    spark.stop()
  }
}
