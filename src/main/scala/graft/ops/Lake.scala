package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake-maintenance operators: the MERGE/upsert shape that keeps slowly
  * changing reference tables current without a transaction log.
  */
object Lake {

  /** MERGE-style upsert of a change batch into a base table, keyed on
    * `keyCol`: rows only in `changes` are inserts, rows in both take the
    * change row's non-null fields (per-field `coalesce` — the same partial-
    * update semantics as the reference's record Copy driver and
    * `RecordStore.update`), rows only in `base` pass through. The result
    * carries an `action` column (`insert`/`update`/`keep`) for audit.
    *
    * Plan shape: one full-outer hash join keyed on `keyCol` — each side is
    * shuffled once on the merge key, which is exactly the physical shape of
    * a Delta/Iceberg MERGE's join phase. No driver-side state; AQE splits
    * skewed keys. Copy-on-write of unmatched data comes free because the
    * result IS the new table.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val cols = base.columns.filterNot(_ == keyCol)
    val joined = base.as("b").join(changes.as("c"),
      col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
    joined.select(
      coalesce(col(s"c.$keyCol"), col(s"b.$keyCol")).as(keyCol) +:
        cols.map(n => coalesce(col(s"c.$n"), col(s"b.$n")).as(n)) :+
        when(col(s"b.$keyCol").isNull, lit("insert"))
          .when(col(s"c.$keyCol").isNull, lit("keep"))
          .otherwise(lit("update")).as("action"): _*)
  }
}
