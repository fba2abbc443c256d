package graft.core.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension enrichment (reference S7/P7 → Spark J0, SURVEY.md §2.5).
  *
  * The reference backfills blank player names with per-row JPA point lookups
  * on the DRIVER inside foreachBatch (SparkStreamingService.java:264-268) —
  * a driver bottleneck that cannot scale. Spark-native form: a broadcast
  * stream-static left equi-join — the dimension (10s..1000s of rows) ships
  * once per executor, the fact stream never leaves its partitions, zero
  * extra shuffles.
  */
object Enrich {

  /** Replace blank `nameCol` in `facts` with the dimension's name, matching on
    * `keyCol`. `dim` must have columns (`keyCol`, `dimNameCol`). */
  def backfillName(
      facts: DataFrame,
      dim: DataFrame,
      keyCol: String = "steamId",
      nameCol: String = "playerName",
      dimNameCol: String = "name"): DataFrame = {
    val d = dim.select(col(keyCol), col(dimNameCol).as("__dim_name"))
    facts
      .join(broadcast(d), Seq(keyCol), "left")
      .withColumn(
        nameCol,
        // trim is the BLANK TEST ONLY (fold's exact charset,
        // PlayerState.BlankChars = Java-trim semantics, so tab-only names
        // backfill like the reference's isBlank); non-blank names pass
        // through RAW — the stats twins and the oracle both keep the
        // original string, never a trimmed copy
        when(trim(col(nameCol), graft.core.PlayerState.BlankChars) =!= "", col(nameCol))
          .otherwise(coalesce(col("__dim_name"), col(nameCol))))
      .drop("__dim_name")
  }
}
