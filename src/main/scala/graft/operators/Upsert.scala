package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics over immutable parquet snapshots (the CDC
  * upsert a lakehouse table format provides; reference ecosystem:
  * Hive/Iceberg per `README.md:61-88`). Spark on raw parquet has no
  * in-place MERGE, so the operator produces the next snapshot:
  * matched keys take the update row, unmatched target rows survive,
  * unmatched update rows insert.
  *
  * Formulated as anti-join + union — NOT a full outer join with a
  * per-column coalesce: the anti join shuffles both sides once on the
  * key (same cost a join-based MERGE pays) but needs no wide coalesce
  * projection, and at 100 TB both sides being bucketed by the key
  * makes it shuffle-free. Precondition: `updates` has at most one row
  * per key (standard MERGE cardinality rule; duplicate update keys
  * make MERGE ambiguous everywhere).
  */
object Upsert {
  def merge(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** MERGE with automatic schema evolution (Delta's
    * `mergeSchema`/`autoMerge` analog): `updates` may carry columns
    * the target lacks — surviving target rows surface NULL for them —
    * and vice versa. Same anti-join + union shape and cost as
    * [[merge]]; only the union fills missing columns by name.
    */
  def mergeEvolve(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates, allowMissingColumns = true)
}
