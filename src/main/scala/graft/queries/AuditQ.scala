package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Batch-audit operators (r15): the two jobs a warehouse runs around
  * every snapshot publish.
  *
  *   - `etl_snapshot_diff` is the batch CDC diff: given yesterday's and
  *     today's full snapshots of a keyed table, classify every key as
  *     added / removed / changed / unchanged and emit per-status counts
  *     plus checksums. ONE full-outer sort-merge join on the key — the
  *     canonical 100 TB snapshot-reconciliation shape (both sides
  *     shuffle-partition on the same key; AQE handles skew). The
  *     "second snapshot" is derived deterministically from `orders` by
  *     rules both engines spell identically (delete keys %97, bump
  *     price on %13, insert shifted keys on %89), so the diff has all
  *     four statuses without needing a second fixture file.
  *   - `etl_reconcile_totals` is the cross-table invariant audit:
  *     recompute each order's total from its lineitems
  *     (Σ extprice·(1−disc)·(1+tax), exact decimal accumulation) and
  *     bucket orders by whether the header total agrees within 1 cent.
  *     The complement of `profile_expectations`' single-table checks:
  *     this one verifies a RELATIONSHIP. One partial-agg groupBy on the
  *     fact's join key, then a key-colocated left join to the header —
  *     no second shuffle of the fact table. Diffs are quantized to
  *     integer micro-units BEFORE comparison and summation (Det.uN
  *     discipline), so both engines bucket and checksum bit-for-bit.
  *
  * Reference precedent: samsa's changelog topics exist precisely so a
  * consumer can rebuild and reconcile a table snapshot
  * (samsa/kafka/storage.py:129-149); these are the engine-side batch
  * twins of that reconciliation loop.
  */
object AuditQ {

  val all: Seq[QueryDef] = Seq(

    // Full-snapshot CDC diff. key_chk is a MODULAR checksum of the
    // surviving key set per status — sum of (k mod p) accumulated on the
    // DECIMAL(38,0) grid then reduced mod p, so it is exact and
    // overflow-free at ANY row count (the r15 1000x fixture, 150M keys
    // of magnitude ~1e12, overflowed a raw BIGINT SUM(k) loudly under
    // ANSI — this is the fix, not a silent wrap). price_sum is the
    // exact decimal sum of the post-image price (pre-image for
    // removals). At 1000x the only heavy op is the single full-outer
    // SMJ on o_orderkey: measured 4.9 s at 100x, the shuffle scales
    // with the snapshot pair.
    QueryDef(
      "etl_snapshot_diff",
      """WITH a AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey AS k,
        |         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.5
        |              ELSE o_totalprice END AS price,
        |         o_orderstatus AS st
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey AS k, o_totalprice AS price,
        |         o_orderstatus AS st
        |  FROM orders WHERE o_orderkey % 89 = 0),
        |d AS (
        |  SELECT CASE WHEN a.k IS NULL THEN 'added'
        |              WHEN b.k IS NULL THEN 'removed'
        |              WHEN a.price <> b.price OR a.st <> b.st THEN 'changed'
        |              ELSE 'unchanged' END AS status,
        |         COALESCE(b.k, a.k) AS k,
        |         COALESCE(b.price, a.price) AS price
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(CAST(SUM(CAST(k % 1000000007 AS DECIMAL(38,0)))
        |                 AS DECIMAL(38,0)) % 1000000007 AS BIGINT) AS key_chk,
        |       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val a = o.select(col("o_orderkey").as("k"),
        col("o_totalprice").as("price"), col("o_orderstatus").as("st"))
      val b = o.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.5)
            .otherwise(col("o_totalprice")).as("price"),
          col("o_orderstatus").as("st"))
        // Synthetic 'added' keys are NEGATED originals — disjoint from any
        // positive key space by construction. (A +1e9 shift collided with
        // ScaleStress's 1e9 replica stride at factor >= 2: shifted keys
        // matched replica-1 reals, fanning out the full-outer join and
        // silently absorbing the 'added' class on both engine sides.)
        .unionAll(o.filter(col("o_orderkey") % 89 === 0)
          .select((-col("o_orderkey")).as("k"),
            col("o_totalprice").as("price"), col("o_orderstatus").as("st")))
      a.as("a").join(b.as("b"), col("a.k") === col("b.k"), "full_outer")
        .select(
          when(col("a.k").isNull, "added")
            .when(col("b.k").isNull, "removed")
            .when(col("a.price") =!= col("b.price")
              || col("a.st") =!= col("b.st"), "changed")
            .otherwise("unchanged").as("status"),
          coalesce(col("b.k"), col("a.k")).as("k"),
          coalesce(col("b.price"), col("a.price")).as("price"))
        .groupBy("status")
        .agg(count(lit(1)).cast("long").as("n"),
          (sum((col("k") % 1000000007L)
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            % 1000000007L).cast("long").as("key_chk"),
          graft.Det.dsum2(col("price")).as("price_sum"))
        .orderBy("status")
    },

    // Header-vs-detail reconciliation. diff_u lives on the micro-unit
    // integer grid for BUCKETING; the reported per-bucket mass
    // accumulates on the DECIMAL(38,0) grid and emits as DOUBLE (the
    // Det.dsum discipline) — a raw BIGINT SUM(ABS(diff_u)) overflowed
    // loudly at the r15 1000x fixture (150M mismatched orders x ~1e10
    // micro each), and 38-digit decimal is overflow-free at any
    // conceivable mass while both engines cast the exact sum to the
    // same double.
    QueryDef(
      "etl_reconcile_totals",
      """WITH r AS (
        |  SELECT l_orderkey AS k,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |                       AS DECIMAL(24,6))) AS DOUBLE) AS recomputed
        |  FROM lineitem GROUP BY l_orderkey),
        |j AS (
        |  SELECT o.o_orderkey, r.recomputed,
        |         CAST(FLOOR((o.o_totalprice - COALESCE(r.recomputed, 0)) * 1e6
        |                    + 0.5) AS BIGINT) AS diff_u
        |  FROM orders o LEFT JOIN r ON o.o_orderkey = r.k)
        |SELECT CASE WHEN recomputed IS NULL THEN 'no_lines'
        |            WHEN ABS(diff_u) <= 10000 THEN 'reconciled_1c'
        |            ELSE 'mismatch' END AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(ABS(diff_u) AS DECIMAL(38,0))) AS DOUBLE)
        |         AS abs_diff_micro_sum
        |FROM j GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val r = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("k"))
        .agg(graft.Det.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("recomputed"))
      Tables.orders(s, d).join(r, col("o_orderkey") === col("k"), "left")
        .select(col("recomputed"),
          graft.Det.u6(col("o_totalprice") - coalesce(col("recomputed"), lit(0)))
            .as("diff_u"))
        .groupBy(
          when(col("recomputed").isNull, "no_lines")
            .when(abs(col("diff_u")) <= 10000, "reconciled_1c")
            .otherwise("mismatch").as("bucket"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(abs(col("diff_u"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double").as("abs_diff_micro_sum"))
        .orderBy("bucket")
    }
  )
}
