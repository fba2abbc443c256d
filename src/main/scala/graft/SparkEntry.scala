package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.core.Event
import graft.core.parse.GameLogParser
import graft.core.stats.PlayerStatsEngine
import graft.core.enrich.Enrich
import graft.analytics.{AsofJoin, GlobalCumsum, Intervals, RangeJoin, Scoreboard, Sessionize}
import graft.ext.{Dedup, Diff, Multimodal, Prefilter, Sampling, Similarity, Skew, TextAnalysis}

/** Driver contract: the operator catalog (SURVEY.md §2) as named queries over
  * the driver's parquet testdata, each paired with ANSI SQL the driver runs in
  * DuckDB as a correctness oracle.
  *
  * Determinism rules used throughout (so Spark and DuckDB hash-match):
  *  - money/metric sums go through DECIMAL(12,2) (exact in both engines) and
  *    are cast to DOUBLE only at the end;
  *  - floating folds over arrays are strict left-to-right double adds in both
  *    engines (verified bit-exact);
  *  - every result has a total ORDER BY on a unique key;
  *  - shared 48-bit hash = first 12 hex digits of md5 (conv ↔ '0x'-cast).
  */
object SparkEntry {


  import graft.catalog._

  private lazy val catalog: Seq[(String, CatalogShared.Q, Option[String])] = {
    val all =
      ReferenceCatalog.entries ++ RelationalCatalog.entries ++
      AnalyticsCatalog.entries ++ DedupCatalog.entries ++
      AnnCatalog.entries ++ TextCatalog.entries ++
      TokenizerCatalog.entries ++ SamplingCatalog.entries ++
      MultimodalCatalog.entries ++ StreamingCatalog.entries
    require(all.map(_._1).distinct.size == all.size,
      "duplicate catalog query name across family files")
    all
  }


  // ------------------------------------------------------- driver contract

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (n, q, _) => n -> q }.toMap

  def oracleSql: Map[String, String] =
    catalog.collect { case (n, _, Some(sql)) => n -> sql.trim }.toMap
}
