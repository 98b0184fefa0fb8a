package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized ordered funnels over an event table (r10, VERDICT r9
  * item 8: lifts the hard-coded 3-step evt_funnel/evt_funnel_windowed
  * cascade to a step-list-driven builder, symmetric with the streaming
  * [[graft.streaming.FunnelTracker]]'s step sequence — both sides now
  * take the same `Seq[String]`).
  *
  * Semantics (identical to the r9 queries): a user counts at step k
  * only with a step-k event STRICTLY after their earliest step-(k-1)
  * completion; with a conversion window, additionally within `window`
  * of it (the form product analytics ships — unbounded funnels
  * overcount). Reference precedent: samsa's README pitches per-user
  * stateful consumption over an event stream
  * (/root/reference/README.md:27-52); this is the batch analytics that
  * stream feeds.
  *
  * Scale shape: per step, filter to that step's events -> join the
  * step-(k-1) user frame (node-sized: users who reached k-1, always
  * <= distinct users, shrinking monotonically down the funnel) ->
  * min-aggregate. Every shuffle is user_id-keyed; per-user state is
  * one timestamp per step; no windows over the full stream, no driver
  * state. At 100 TB user count grows with the data, so the user_id
  * shuffle stays balanced and step k's join input only ever shrinks.
  */
object Funnels {

  /** Per-user completion times, one frame per step: (user_id, t). */
  def stepFrames(events: DataFrame, steps: Seq[String],
      window: Option[Column] = None): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select("user_id", "event_type", "ts")
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    steps.tail.scanLeft(first) { (prev, step) =>
      val after = window match {
        case Some(w) => col("ts") > col("pt") && col("ts") <= col("pt") + w
        case None    => col("ts") > col("pt")
      }
      e.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
        .filter(after)
        .groupBy("user_id").agg(min("ts").as("t"))
    }
  }

  /** The (step, event_type, n_users) report, one row per step. */
  def report(events: DataFrame, steps: Seq[String],
      window: Option[Column] = None): DataFrame =
    stepFrames(events, steps, window).zip(steps).zipWithIndex.map {
      case ((df, name), i) =>
        df.agg(count(lit(1)).cast("long").as("n_users"))
          .select(lit(i + 1).cast("int").as("step"),
            lit(name).as("event_type"), col("n_users"))
    }.reduce(_ unionAll _)

  /** DuckDB oracle for [[report]], generated from the SAME step list so
    * the Spark plan and the oracle SQL can never drift (the r9 queries
    * spelled both by hand). Step names are single-quote-escaped. */
  def oracleSql(steps: Seq[String], windowHours: Option[Int] = None): String = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def q(s: String) = s.replace("'", "''")
    val ctes = steps.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"""u1 AS (
           |  SELECT user_id, MIN(ts) AS t1 FROM events
           |  WHERE event_type = '${q(s)}' GROUP BY user_id)""".stripMargin
      else {
        val w = windowHours
          .map(h => s" AND e.ts <= u$i.t$i + INTERVAL $h HOUR").getOrElse("")
        s"""u${i + 1} AS (
           |  SELECT e.user_id, MIN(e.ts) AS t${i + 1}
           |  FROM events e JOIN u$i ON e.user_id = u$i.user_id AND e.ts > u$i.t$i$w
           |  WHERE e.event_type = '${q(s)}' GROUP BY e.user_id)""".stripMargin
      }
    }
    val selects = steps.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"""SELECT CAST(1 AS INT) AS step, '${q(s)}' AS event_type,
           |       CAST(COUNT(*) AS BIGINT) AS n_users FROM u1""".stripMargin
      else
        s"SELECT CAST(${i + 1} AS INT), '${q(s)}', CAST(COUNT(*) AS BIGINT) FROM u${i + 1}"
    }
    "WITH " + ctes.mkString(",\n") + "\n" + selects.mkString("\nUNION ALL\n")
  }
}
