package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-mutation kernel: the Spark-native re-expression of the
  * reference's point-write SQL (SURVEY.md §2.2).
  *
  * The reference mutates single Postgres rows (`INSERT … ON CONFLICT
  * DO UPDATE` at `internal/db/activities.go:100-185`, keyed `UPDATE`s,
  * `DELETE`s). An immutable-file engine expresses the same semantics
  * as pure `DataFrame => DataFrame` transforms: build the post-image
  * relation, then atomically swap/overwrite storage (or `MERGE INTO`
  * under a table format — Delta/Iceberg — on a real deployment).
  *
  * Scale notes (100 TB):
  *  - [[upsert]] costs exactly one hash-partition shuffle on the key —
  *    the minimum possible for a keyed merge. With AQE on, skewed keys
  *    are split automatically.
  *  - `updates` is typically tiny vs `current` (a sync batch of ≤100
  *    rows in the reference, `internal/strava/strava.go:54-58`); under
  *    a table format that becomes a broadcast-probe merge that only
  *    rewrites touched files. The relational semantics here are the
  *    contract either way.
  */
object Merge {

  private val RN = "__graft_rn"

  /** Last-writer-wins upsert: `updates` wins over `current` on key
    * collision; non-colliding rows from both sides survive.
    * Re-expresses `INSERT … ON CONFLICT (id) DO UPDATE SET …`
    * (reference `internal/db/activities.go:100-185` A1,
    * `internal/strava/strava.go:156-193` U2,
    * `internal/db/user_api_keys.go:111-133` K2).
    *
    * Contract: `updates` is key-unique (one post-image per key — the
    * reference upserts single rows; a multi-version batch goes through
    * [[latestPerKey]] first, as the streaming ingest does).
    *
    * Plan shape: anti-join + union, NOT a row_number window — for the
    * common case (small update batch vs huge store) the anti-join is
    * a broadcast hash join, so the big side is never shuffled or
    * sorted; a window LWW would shuffle the entire store on every
    * merge. Equivalent output, orders of magnitude less data motion
    * at 100 TB.
    */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = current.columns.toSeq
    val survivors = current.join(updates.select(keys.map(col): _*), keys, "left_anti")
    updates.select(cols.map(col): _*).unionByName(survivors)
  }

  /** Reduce a multi-version batch to its latest row per key by the
    * `version` ordering column (window LWW — the shape [[upsert]]
    * deliberately avoids for store-sized inputs, correct here because
    * it runs on the small batch only).
    */
  def latestPerKey(batch: DataFrame, keys: Seq[String], version: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(version).desc_nulls_last)
    batch.withColumn(RN, row_number().over(w))
      .filter(col(RN) === 1)
      .drop(RN)
  }

  /** Keyed full-row update: like [[upsert]] but rows of `updates`
    * whose key is absent from `current` are dropped (UPDATE affects
    * only existing rows — reference `internal/db/activities.go:216-245`
    * A2, intended semantics per SURVEY §0.1 D8).
    */
  def update(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    upsert(current, updates.join(current.select(keys.map(col): _*), keys, "left_semi"), keys)

  /** Partial (column-subset) update: `updates` carries the keys plus a
    * subset of columns; unspecified columns keep their current value
    * (`coalesce(new, old)`). Reference `internal/db/user.go:110-123` U3.
    */
  def partialUpdate(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val updCols = updates.columns.toSeq.filterNot(keys.contains)
    val aliased = updates.select(
      (keys.map(col) ++ updCols.map(c => col(c).as(s"__upd_$c"))): _*)
    val joined = current.join(aliased, keys, "left")
    val projected = current.columns.toSeq.map { c =>
      if (updCols.contains(c)) coalesce(col(s"__upd_$c"), col(c)).as(c) else col(c)
    }
    joined.select(projected: _*)
  }

  /** Keyed delete. Reference `internal/db/activities.go:247-256` A3,
    * `internal/db/user.go:125-137` U4, `user_api_keys.go:135-154` K3.
    * (The K3 rows-affected check is `current.count - result.count`
    * app-side.)
    */
  def delete(current: DataFrame, predicate: Column): DataFrame =
    current.filter(!predicate)

  /** Append (INSERT of new rows). Reference `internal/db/user.go:34-54`
    * U1, `internal/db/user_api_keys.go:63-92` K1. Missing columns in
    * `rows` become NULL (server-side defaults are the caller's job).
    */
  def append(current: DataFrame, rows: DataFrame): DataFrame =
    current.unionByName(rows, allowMissingColumns = true)

  /** Single-column conditional set: `SET colName = value WHERE pred`.
    * Reference `internal/db/user_api_keys.go:161-172` K4
    * (`UPDATE api_keys SET user_id=$1 WHERE key=$2`).
    */
  def setWhere(current: DataFrame, predicate: Column, colName: String, value: Column): DataFrame =
    current.withColumn(colName, when(predicate, value).otherwise(col(colName)))

  /** Append with BIGSERIAL-style dense id assignment: each new row
    * gets `max(current.idCol) + rank`, ranked by `orderCols` (which
    * must be unique per new row for determinism). Re-expresses the
    * Postgres `BIGSERIAL` column the reference relies on
    * (`internal/db/user_api_keys.go:11` — the K1 append gets its id
    * from the sequence, a semantic the plain [[append]] cannot give).
    *
    * Plan shape: the store-side max is a full-agg (partial agg per
    * partition, one row out) joined back by literal-true broadcast —
    * NO driver action, the id base resolves inside the same job. The
    * dense rank over the new batch is the same TWO-LEVEL formulation
    * as `Packing.packBins` (range shuffle on the order key, local
    * row_number + per-partition count offsets over a cluster-width
    * relation), so a bulk backfill no longer funnels through one
    * partition the way the r1-r4 single global window did.
    */
  def appendWithSerial(current: DataFrame, rows: DataFrame, idCol: String,
                       orderCols: Seq[String], partitions: Int = 32): DataFrame = {
    val base = current.agg(coalesce(max(col(idCol)), lit(0L)).as("__graft_base"))
    val ordered = rows
      .repartitionByRange(partitions, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = ordered.groupBy(col("__pid")).agg(count(lit(1)).as("__pn"))
      .withColumn("__poff",
        coalesce(sum(col("__pn")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pn")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    val withIds = ordered
      .join(broadcast(offsets), "__pid")
      .crossJoin(broadcast(base))
      .withColumn(idCol,
        (col("__graft_base") + col("__poff") + row_number().over(wLocal)).cast("long"))
      .drop("__poff", "__pid", "__graft_base")
    current.unionByName(withIds, allowMissingColumns = true)
  }

  /** Apply a CDC changelog (op ∈ I/U/D with a per-key sequence) to a
    * store: each key's LATEST change wins — upserts (I/U) replace the
    * stored row, a trailing D removes it. The window LWW runs on the
    * (small) changelog only; the store-side work is the same
    * broadcast anti-join + union as [[upsert]] plus one anti-join for
    * the deletes — the store never shuffles. This is the generalized
    * merge every CDC sink (Debezium-style) needs.
    */
  def applyChangelog(store: DataFrame, log: DataFrame, keys: Seq[String],
                     seqCol: String, opCol: String): DataFrame = {
    val latest = latestPerKey(log, keys, seqCol)
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(store.columns.map(col): _*)
    val deletes = latest.filter(col(opCol) === "D")
      .select(keys.map(col): _*)
    upsert(store, upserts, keys)
      .join(broadcast(deletes), keys, "left_anti")
  }

  /** SCD Type 2 merge: apply one batch of dimension updates, closing
    * each updated key's OPEN version (`valid_to` = the update's
    * `valid_from`) and appending the update as the new open version.
    * History rows (valid_to already set) and untouched keys pass
    * through unchanged; keys new to the dimension simply insert.
    *
    * Contract: `updates` carries the dimension's columns minus
    * `valid_to`, with `valid_from` as the effective time, at most one
    * row per key (run [[latestPerKey]] first for multi-version
    * batches; cross-batch ordering is the caller's ingest discipline).
    *
    * Plan shape: ONE scan of the store + a broadcast left join against
    * the (small by nature) update batch + the union of the batch —
    * the same no-store-shuffle discipline as [[upsert]]; a windowed
    * versions-per-key formulation would range-shuffle the whole
    * dimension on every merge.
    */
  def scd2(dim: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val eff = updates.select(
      (keys.map(col) :+ col("valid_from").as("__eff")): _*)
    val closedOrSame = dim.join(broadcast(eff), keys, "left")
      .withColumn("valid_to",
        when(col("__eff").isNotNull && col("valid_to").isNull, col("__eff"))
          .otherwise(col("valid_to")))
      .drop("__eff")
    val inserts = updates
      .withColumn("valid_to", lit(null).cast(dim.schema("valid_to").dataType))
    closedOrSame.unionByName(inserts.select(dim.columns.map(col): _*))
  }
}
