package graft

import org.apache.spark.sql.DataFrame
import graft.runtime._

/** models/spark/support/support_mart_agent_actions.sql (520 LoC, support
  * family) executed VERBATIM: deleted-entry exclusion, agent-note
  * dedup-by-grouping, a LAG conduct chain classifying 12 action types over
  * the merged entry/resolution stream, and the queue-escalation detector
  * over ticketChangeJoom state transitions. One planted ticket timeline
  * yields exactly five classified actions, asserted as a set. */
class SupportActionsRealSpec extends SparkSpec {
  import spark.implicits._

  private def payload(ticket: String = "T1", entry: String = null,
                      author: String = null, atype: String = null,
                      etype: String = null, text: String = null,
                      owner: String = null, agent: String = null,
                      queue: String = null, changedBy: String = null): String =
    s"""named_struct(
       |  'ticketid', ${lit(ticket)}, 'entryid', ${lit(entry)},
       |  'authorid', ${lit(author)}, 'authortype', ${lit(atype)},
       |  'entrytype', ${lit(etype)}, 'text', ${lit(text)},
       |  'remindercancelled', false, 'preresolved', false,
       |  'stateowner', ${lit(owner)}, 'stateagentid', ${lit(agent)},
       |  'statequeueid', ${lit(queue)}, 'changedbytype', ${lit(changedBy)})""".stripMargin
  private def lit(s: String): String =
    if (s == null) "CAST(NULL AS STRING)" else s"'$s'"

  private def babyloneEvents: DataFrame = {
    def entry(ts: String, entry: String, author: String, atype: String,
              etype: String, text: String): String =
      s"SELECT DATE'2024-03-10' AS partition_date, TIMESTAMP'$ts' AS event_ts_msk, " +
        s"'ticketEntryAddJoom' AS type, ${payload(entry = entry, author = author,
          atype = atype, etype = etype, text = text)} AS payload"
    def change(ts: String, owner: String, agent: String, queue: String): String =
      s"SELECT DATE'2024-03-10', TIMESTAMP'$ts', 'ticketChangeJoom', " +
        payload(owner = owner, agent = agent, queue = queue, changedBy = "agent")
    val deleted =
      s"SELECT DATE'2024-03-10', TIMESTAMP'2024-03-10 10:16:00', 'ticketEntryDeleted', " +
        payload(entry = "E5")
    spark.sql(Seq(
      entry("2024-03-10 10:00:00", "E1", "cust1", "customer", "message", "hi"),
      entry("2024-03-10 10:05:00", "E2", "a1", "agent", "message", "hello"),
      entry("2024-03-10 10:15:00", "E5", "a1", "agent", "privateNote", "secret"), // deleted below
      entry("2024-03-10 10:20:00", "E3", "a2", "agent", "privateNote", "internal"),
      change("2024-03-10 10:30:00", "Resolved", "a1", null),
      change("2024-03-10 11:00:00", "Agent", "a1", "q1"),
      change("2024-03-10 11:05:00", "Queue", "a1", "q2"),
      deleted).mkString("\nUNION ALL\n"))
  }

  test("REAL support_mart_agent_actions.sql (520 LoC) classifies a planted timeline") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/support/support_mart_agent_actions.sql"))
    val ctx = freshCtx()
    ctx.sources.register("mart", "babylone_events")(_ => babyloneEvents)
    ctx.sources.register("mongo", "babylone_joom_agents_daily_snapshot")(s => {
      import s.implicits._
      Seq(("a1", "a1@joom.com"), ("a2", "a2@joom.com")).toDF("_id", "email")
    })
    val model = SqlTemplater.sqlModelAuto("support_mart_agent_actions", sql)
    assert(model.materialization == Materialization.Table())
    assert(model.meta("team") == "analytics")

    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      for ((n, st) <- new DagRunner(Seq(model)).run(ctx))
        assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)

    val got = ctx.ref("support_mart_agent_actions")
      .select($"author_id", $"action_type", $"email")
      .as[(String, String, Option[String])].collect().toSet
    assert(got == Set(
      // the customer's opening message lands in the conduct chain too
      // (previous is NULL): the model's own first arm classifies it
      ("cust1", "reply to customer", None),
      ("a1", "reply to customer", Some("a1@joom.com")),
      ("a2", "note after other agent", Some("a2@joom.com")),
      ("a1", "resolution after other agent", Some("a1@joom.com")),
      // Agent->Queue transition with a queue change = escalation; the
      // deleted E5 note influenced nothing
      ("a1", "escalation to queue", Some("a1@joom.com"))), got.toString)
  }
}
