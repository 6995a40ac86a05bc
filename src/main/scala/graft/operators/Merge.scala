package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship composite: upsert a live price into stored daily
  * bars (`update_live_price.py:200-297`). Semantics (SURVEY §2.4 A6):
  *
  *   - an incoming trade whose calendar key matches a stored row overwrites
  *     ONLY the close column, preserving every other column of that row
  *     (`update_live_price.py:256-257`);
  *   - an incoming trade for a new key appends a row that is null everywhere
  *     except the close column (`update_live_price.py:260-273`, NaN-padded in
  *     pandas → null here per SURVEY §7.3.2);
  *   - within a batch, last-write-wins by trade timestamp
  *     (`update_live_price.py:164` keyed state is last-write).
  *
  * Spark-first shape: one shuffle-free pre-aggregate of the incoming batch
  * (map-side combinable `max_by`) followed by a single full-outer equi-join on
  * the keys with column-level coalesce — no window, no whole-file rewrite
  * (the reference rewrites the entire per-symbol file per trade,
  * `update_live_price.py:289-292`; this merges partitions in one pass and
  * scales to 100 TB: both sides shuffle-partition on the same keys and the
  * join is co-located).
  */
object Merge {

  /** @param stored    existing bar table, one row per key tuple
    * @param incoming  trade rows carrying `keys`, `tsCol` and `priceCol`
    *                  (may hold many trades per key — reduced last-write-wins)
    * @param keys      merge key columns (e.g. symbol/user + calendar day)
    * @param priceCol  incoming price column
    * @param tsCol     incoming event-time column ordering last-write-wins
    * @param closeCol  stored column the update overwrites (`adj_close`)
    */
  def upsertDailyClose(
      stored: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      priceCol: String,
      tsCol: String,
      closeCol: String): DataFrame = {
    // Tie-break equal-ts trades on the price itself so the reduction is
    // deterministic (two trades at the same instant → the greater price
    // wins on every engine), keeping the a6 oracle hash and the merge
    // idempotence property stable on tie-bearing batches.
    val latest = incoming
      .groupBy(keys.map(col): _*)
      .agg(max_by(col(priceCol), struct(col(tsCol), col(priceCol)))
        .as("_incoming_price"))

    val otherCols = stored.columns.filterNot(c => keys.contains(c) || c == closeCol)
    val merged = stored.join(latest, keys, "full_outer")
    merged.select(
      keys.map(col) ++
        otherCols.map(col) :+
        coalesce(col("_incoming_price"), col(closeCol)).as(closeCol): _*)
  }
}
