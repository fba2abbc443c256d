package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Fixture-vintage normalizer for the driver testdata's `events.ts` column.
  *
  * The driver has shipped `events.parquet` in two vintages:
  *   - int64 nanosecond epochs (rounds 1-5), which Spark reads as a raw
  *     `long` under `spark.sql.legacy.parquet.nanosAsLong=true`;
  *   - `timestamp[us]` (round 6+), which Spark reads as TIMESTAMP_NTZ.
  *
  * The whole catalog (and its DuckDB-independent long arithmetic, e.g.
  * `ts div 1000`) is written against the long-nanos shape, so this seam
  * rewrites a timestamp-typed `ts` back to long nanoseconds and leaves a
  * long-typed `ts` untouched. Callers' sessions must run with
  * `spark.sql.session.timeZone=UTC` (all entry points do) so the NTZ →
  * instant interpretation matches DuckDB's naive-as-UTC read of the same
  * file.
  */
object EventTime {

  /** If `df` has a timestamp-typed `ts` column, replace it in place with the
    * equivalent epoch nanoseconds as `long`; otherwise return `df` as-is. */
  def tsToLongNanos(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
}
