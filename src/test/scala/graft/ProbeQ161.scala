package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for q161 (not part of any suite). */
object ProbeQ161 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(s"$dir/documents.parquet")
    val idCol = "doc_id"; val textCol = "text"
    val blockCols = Seq("lang"); val minJaccard = 0.12

    for (round <- 1 to 3) {
      println(s"=== round $round ===")
      // collapse harness
      val keyCols = blockCols :+ textCol
      val keysNonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
      val classes = df.where(keysNonNull)
        .groupBy(keyCols.map(col): _*)
        .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("classes.count")(classes.count())
      val reps = classes.select((col("__rep").as(idCol) +: keyCols.map(col)): _*)

      // v2 pipeline over reps
      val exploded = reps
        .withColumn("__words", split(col(textCol), " "))
        .select(
          (col(idCol).as("__id") +: blockCols.map(col)) :+
            explode(graft.ext.Dedup.shingles(col(textCol), col("__words"))).as("__s0"): _*)
      val nonNull = (blockCols.map(col(_).isNotNull) :+ col("__s0").isNotNull).reduce(_ && _)
      val posts = exploded.where(nonNull)
        .select((col("__id") +: blockCols.map(col)) :+ xxhash64(col("__s0")).as("__s"): _*)
        .distinct()
      val dfreq = posts
        .groupBy((blockCols.map(col) :+ col("__s")): _*)
        .agg(count(lit(1)).as("__df"))
      val docs = time("docs localCheckpoint") {
        posts
          .join(dfreq, blockCols :+ "__s")
          .groupBy((col("__id") +: blockCols.map(col)): _*)
          .agg(sort_array(collect_list(struct(col("__df"), col("__s")))).as("__ord"),
            count(lit(1)).as("__n"))
          .localCheckpoint(true)
      }
      val prefLen = (col("__n") - ceil(lit(minJaccard) * col("__n") - lit(1e-9)) + 1)
        .cast("int")
      val prefix = docs.select(
        (blockCols.map(col) :+ col("__id") :+ col("__n") :+
          explode(transform(slice(col("__ord"), lit(1), prefLen), x => x("__s")))
            .as("__s")): _*)
      val pa = prefix.select((blockCols.map(col) :+ col("__s") :+
        col("__id").as("id_a") :+ col("__n").as("na")): _*)
      val pb = prefix.select((blockCols.map(col) :+ col("__s") :+
        col("__id").as("id_b") :+ col("__n").as("nb")): _*)
      val cands = pa.join(pb, blockCols :+ "__s")
        .where(col("id_a") < col("id_b") &&
          col("na") >= col("nb") * lit(minJaccard) - lit(1e-9) &&
          col("nb") >= col("na") * lit(minJaccard) - lit(1e-9))
        .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
          col("na") :+ col("nb")): _*)
        .distinct()
      val docSets = docs.select(
        (blockCols.map(col) :+ col("__id") :+
          transform(col("__ord"), x => x("__s")).as("__set")): _*)
      val verified = cands
        .join(docSets.select((blockCols.map(col) :+ col("__id").as("id_a") :+
          col("__set").as("__sa")): _*), blockCols :+ "id_a")
        .join(docSets.select((blockCols.map(col) :+ col("__id").as("id_b") :+
          col("__set").as("__sb")): _*), blockCols :+ "id_b")
        .select(
          col("id_a"), col("id_b"), col("na"), col("nb"),
          size(array_intersect(col("__sa"), col("__sb"))).cast("long").as("inter"))
        .select(
          col("id_a"), col("id_b"),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
        .where(col("jaccard") >= minJaccard)
      val candsMat = time("cands distinct") {
        val m = cands.localCheckpoint(true); println(s"  cands rows: ${m.count()}"); m
      }
      val verified2 = candsMat
        .join(docSets.select((blockCols.map(col) :+ col("__id").as("id_a") :+
          col("__set").as("__sa")): _*), blockCols :+ "id_a")
        .join(docSets.select((blockCols.map(col) :+ col("__id").as("id_b") :+
          col("__set").as("__sb")): _*), blockCols :+ "id_b")
        .select(
          col("id_a"), col("id_b"), col("na"), col("nb"),
          size(array_intersect(col("__sa"), col("__sb"))).cast("long").as("inter"))
        .where(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= minJaccard)
      time("verify only (from cands mat)")(
        verified2.write.format("noop").mode("overwrite").save())
      time("pairs (no collapse harness)")(
        verified.write.format("noop").mode("overwrite").save())

      time("library pairFn over reps (no collapse)") {
        graft.ext.Dedup.prefixFilteredJaccardPairs(
            reps, idCol, textCol, blockCols, minJaccard)
          .write.format("noop").mode("overwrite").save()
      }
      // full library call for comparison
      time("full q161 (library)") {
        graft.ext.Dedup.prefixFilteredJaccardPairsCollapsed(
            df, idCol, textCol, blockCols, minJaccard)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      classes.unpersist(true)
      graft.util.Caches.releaseAll()
    }
    spark.stop()
  }
}
