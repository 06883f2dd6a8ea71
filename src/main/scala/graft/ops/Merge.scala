package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-merge operators — the "MERGE INTO"-shaped maintenance an
  * incremental lake pipeline runs on every load. The reference's weekly
  * re-ingest jobs rebuild their outputs from scratch (e.g.
  * get_dbgap_data_dicts.py re-downloads per study); at 100 TB the same
  * lifecycle must instead MERGE a small change batch into a large
  * versioned table, which is this operator. */
object Merge {

  /** SCD2 (slowly-changing-dimension type 2) merge: apply a batch of
    * `updates` — (key, attrs, `effCol` effective date) — to a versioned
    * `history` — (key, attrs, `validFrom`, `validTo`; open rows carry
    * NULL `validTo`). Per key:
    *
    *  - update with CHANGED attrs → the open row closes
    *    (`validTo` = eff) and a new open row appends (`validFrom` = eff);
    *  - update with identical attrs → no-op (idempotent re-loads);
    *  - key with no open row → the update inserts as a new open row;
    *  - open row with no update → passes through;
    *  - closed rows always pass through untouched.
    *
    * PRECONDITIONS (the contract that makes 0–2-rows-per-key emission
    * well-defined):
    *  - updates are UNIQUE per key — pre-aggregate a multi-day batch to
    *    the latest change per key first ([[graft.ops.Windows]] top-1);
    *  - history has AT MOST ONE open row per key;
    *  - eff dates are MONOTONE: an update's eff must be >= the open row's
    *    `validFrom` (a late-arriving eff would close the open row with an
    *    inverted interval and chain a new open row into the past).
    * With `validate = true` all three are enforced inside the plan
    * (`assert_true`, fails the job naming the offending key) at ~zero
    * cost: the two count-windows hash-partition each side on the same
    * key the full-outer join needs, so no extra exchange is introduced.
    * With `validate = false` (default) violations are UNDETECTED and
    * corrupt SCD2 state — turn validation on for untrusted batches.
    *
    * Scale shape: ONE shuffle — the open rows full-outer-join the batch
    * on key (Spark broadcasts the update side when it is small, the
    * common case); each joined row then emits its 0–2 output rows from an
    * inline array+explode, so there is no second pass over the open set
    * and no union re-scan. Closed rows ride a disjoint filter of the same
    * history scan. On real storage, partition history by a key bucket and
    * rewrite only buckets containing updated keys (partition pruning does
    * this statically when the batch's buckets are a literal filter;
    * bucketed tables written via [[graft.ops.Scale.writeBucketed]] join
    * exchange-free — pinned in PlanSpec). */
  def scd2Merge(history: DataFrame, updates: DataFrame, key: String,
                attrs: Seq[String], validFrom: String = "valid_from",
                validTo: String = "valid_to",
                effCol: String = "eff",
                validate: Boolean = false): DataFrame = {
    val internal = Set("_m_key", "_m_attrs", "_m_from", "_m_ukey", "_m_uattrs",
      "_m_eff", "_m_rows", "_m_row", "_m_ocnt", "_m_ucnt")
    val clashes = (history.columns ++ updates.columns).filter(internal)
    require(clashes.isEmpty,
      s"scd2Merge reserves internal column names ${internal.mkString(", ")}; " +
        s"rename input columns: ${clashes.distinct.mkString(", ")}")

    val open = history.filter(col(validTo).isNull)
    val closed = history.filter(col(validTo).isNotNull)
      .select(col(key) +: attrs.map(col) :+ col(validFrom) :+ col(validTo): _*)

    // one-per-key assertion that rides the join's own partitioning: the
    // count-window clusters the side on exactly the key the full-outer
    // join clusters on, so validation adds no exchange of its own
    def assertUnique(df: DataFrame, k: String, cnt: String, what: String) =
      df.withColumn(cnt, count(lit(1)).over(Window.partitionBy(col(k))))
        .filter(assert_true(col(cnt) === 1,
          concat(lit(s"scd2Merge: $what for key "), col(k).cast("string"))).isNull)
        .drop(cnt)

    val o0 = open.select(col(key).as("_m_key"),
      struct(attrs.map(col): _*).as("_m_attrs"), col(validFrom).as("_m_from"))
    val u0 = updates.select(col(key).as("_m_ukey"),
      struct(attrs.map(col): _*).as("_m_uattrs"), col(effCol).as("_m_eff"))
    val o = if (validate) assertUnique(o0, "_m_key", "_m_ocnt",
      "multiple open history rows") else o0
    val u = if (validate) assertUnique(u0, "_m_ukey", "_m_ucnt",
      "duplicate update rows") else u0

    val j0 = o.join(u, col("_m_key") === col("_m_ukey"), "full_outer")
    val hasOpen = col("_m_key").isNotNull
    val hasUpd = col("_m_ukey").isNotNull
    val j = if (!validate) j0 else j0.filter(assert_true(
      !(hasOpen && hasUpd) || col("_m_eff") >= col("_m_from"),
      concat(lit("scd2Merge: out-of-order eff (before valid_from) for key "),
        col("_m_key").cast("string"))).isNull)
    val changed = hasOpen && hasUpd && !(col("_m_attrs") <=> col("_m_uattrs"))
    val openRow = (a: Column, from: Column) =>
      struct(coalesce(col("_m_key"), col("_m_ukey")).as("k"), a.as("a"),
        from.as("f"), lit(null).cast(history.schema(validTo).dataType).as("t"))
    val rows = when(changed,
        array(struct(col("_m_key").as("k"), col("_m_attrs").as("a"),
          col("_m_from").as("f"), col("_m_eff").as("t")),
          openRow(col("_m_uattrs"), col("_m_eff"))))
      .when(hasOpen, array(openRow(col("_m_attrs"), col("_m_from"))))
      .otherwise(array(openRow(col("_m_uattrs"), col("_m_eff"))))
    j.select(explode(rows).as("_m_row"))
      .select(col("_m_row.k").as(key) +:
        attrs.map(a => col(s"_m_row.a.$a").as(a)) :+
        col("_m_row.f").as(validFrom) :+ col("_m_row.t").as(validTo): _*)
      .unionByName(closed)
  }

  /** Snapshot CDC: diff two full snapshots of a keyed table into change
    * rows — `op` ∈ insert / update / delete — the batch that feeds
    * [[scd2Merge]] (or any downstream consumer) when the source system
    * only exposes full dumps, which is exactly the reference's situation
    * (weekly full re-downloads; diffing makes the re-ingest incremental).
    * Attribute equality is null-safe (`<=>` per attr via struct compare).
    * Emitted attrs are the NEW values for insert/update and the OLD
    * values for delete. ONE shuffle: a single full-outer join on the key;
    * unchanged rows drop before anything else flows downstream. */
  def snapshotDiff(old: DataFrame, current: DataFrame, key: String,
                   attrs: Seq[String], opCol: String = "op"): DataFrame = {
    val internal = Set("_m_okey", "_m_oattrs", "_m_ckey", "_m_cattrs")
    val clashes = (old.columns ++ current.columns).filter(internal)
    require(clashes.isEmpty,
      s"snapshotDiff reserves internal column names ${internal.mkString(", ")}; " +
        s"rename input columns: ${clashes.distinct.mkString(", ")}")
    val o = old.select(col(key).as("_m_okey"),
      struct(attrs.map(col): _*).as("_m_oattrs"))
    val c = current.select(col(key).as("_m_ckey"),
      struct(attrs.map(col): _*).as("_m_cattrs"))
    val j = o.join(c, col("_m_okey") === col("_m_ckey"), "full_outer")
    val hasOld = col("_m_okey").isNotNull
    val hasCur = col("_m_ckey").isNotNull
    j.withColumn(opCol,
        when(hasOld && !hasCur, "delete")
          .when(!hasOld && hasCur, "insert")
          .when(!(col("_m_oattrs") <=> col("_m_cattrs")), "update"))
      .filter(col(opCol).isNotNull) // unchanged rows drop here
      // new values for insert/update, old values for delete — branch on
      // side presence, NOT per-attr coalesce (an update to NULL must stay
      // NULL, not resurrect the old value)
      .select(coalesce(col("_m_ckey"), col("_m_okey")).as(key) +:
        attrs.map(a => when(hasCur, col(s"_m_cattrs.$a"))
          .otherwise(col(s"_m_oattrs.$a")).as(a)) :+
        col(opCol): _*)
  }
}
