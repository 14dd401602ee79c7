package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder: collapse an
  * ordered change feed into versioned validity intervals per key — the
  * standard warehouse shape for "what was this entity's attribute at
  * time T" (an extension beyond the reference's surface; the reference
  * is stateless batch, SURVEY §2).
  *
  * Scale design: both window passes partition by the dimension key and
  * share one sort order, so the whole build is ONE shuffle on the key
  * followed by two per-partition scans (Catalyst reuses the sort). No
  * global windows, no driver state; interval assembly is lead() within
  * the key partition.
  */
object Scd2 {

  /** Build the SCD2 history of `attrCol` per `keyCol` from a change feed
    * ordered by (`tsCol`, `tieCol`). Consecutive rows with an unchanged
    * attribute collapse into one version (change detection via lag);
    * each surviving version gets `valid_from` = its own timestamp,
    * `valid_to` = the NEXT version's timestamp (null = still current,
    * surfaced as `is_current`), and a per-key `version` number.
    *
    * Timestamps are emitted as epoch seconds (long) — engine-neutral and
    * exactly comparable.
    *
    * Contract: `attrCol` must be non-null — a null attribute makes the
    * change predicate (`attr =!= prev`) null and the row would silently
    * drop; feed `coalesce(attr, sentinel)` if nulls are meaningful.
    */
  def buildHistory(
      feed: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String
  ): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val changes = feed
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col(attrCol) =!= col("prev_attr"))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", unix_timestamp(col(tsCol)))
      .withColumn("valid_to", unix_timestamp(lead(col(tsCol), 1).over(w)))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
