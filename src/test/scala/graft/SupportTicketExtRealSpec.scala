package graft

import graft.runtime._

/** models/spark/support/support_mart_ticket_id_ext.sql (438 LoC) executed
  * VERBATIM: the ticket-lifecycle mart over a single polymorphic event
  * stream (babylone_events read 18 times under different type filters) —
  * create/entry/change/widget events, unbounded FIRST/LAST_VALUE queue
  * attribution through two RAW mongo.* dictionary joins, alternating
  * customer/support response counting via a self-join on rank-1 offsets,
  * UNIX_SECONDS time-to-first-reply, CSAT extraction with array indexing
  * under the non-ANSI dialect, and COLLECT_LIST(DISTINCT) roll-ups of
  * tags/parcels/orders/agents. One full ticket lifecycle hand-tallied.
  */
class SupportTicketExtRealSpec extends SparkSpec {
  import spark.implicits._

  private def s(v: String): String = if (v == null) "CAST(NULL AS STRING)" else s"'$v'"
  private def arr(v: Seq[String]): String =
    if (v == null) "CAST(NULL AS ARRAY<STRING>)"
    else v.map(x => s"'$x'").mkString("array(", ", ", ")")

  /** One babylone event with the full payload surface the model touches. */
  private def bev(typ: String, time: String, author: String = null,
                  authorType: String = null, entryId: String = null,
                  entryType: String = null, queueId: String = null,
                  agentId: String = null, stateOwner: String = null,
                  widgetType: String = null, selected: Seq[String] = null,
                  buttonPlace: String = null, tagIds: Seq[String] = null,
                  parcelIds: Seq[String] = null, orderIds: Seq[String] = null): String =
    s"""SELECT '$typ' AS `type`, TIMESTAMP'2024-06-01 $time' AS event_ts_msk,
       |  DATE'2024-06-01' AS partition_date,
       |  named_struct(
       |    'ticketId', 'T1', 'authorType', ${s(authorType)}, 'authorId', ${s(author)},
       |    'deviceId', 'DV1', 'customerExternalId', 'U1', 'lang', 'en',
       |    'country', 'DE', 'messageSource', 'ios', 'isHidden', false,
       |    'entryId', ${s(entryId)}, 'entryType', ${s(entryType)},
       |    'isAnnouncement', false,
       |    'stateQueueId', ${s(queueId)}, 'stateAgentId', ${s(agentId)},
       |    'stateOwner', ${s(stateOwner)},
       |    'tagIds', ${arr(tagIds)}, 'parcelIds', ${arr(parcelIds)},
       |    'orderIds', ${arr(orderIds)},
       |    'widgetType', ${s(widgetType)}, 'selectedOptionsIds', ${arr(selected)},
       |    'buttonPlace', ${s(buttonPlace)}) AS payload""".stripMargin

  test("REAL support_mart_ticket_id_ext.sql (438 LoC): full ticket lifecycle hand-tallied") {
    val ctx = freshCtx()

    ctx.sources.register("mart", "babylone_events")(sp => sp.sql(Seq(
      bev("ticketCreateJoom", "10:00:00", author = "CU1", authorType = "customer",
        tagIds = Seq("TG1"), parcelIds = Seq("PL1"), orderIds = Seq("OR1")),
      // customer opens with a message (button placed), agent replies 1h later
      bev("ticketEntryAddJoom", "10:00:30", author = "CU1", authorType = "customer",
        entryId = "E1", entryType = "message", buttonPlace = "order_page"),
      bev("ticketEntryAddJoom", "11:00:30", author = "AG1", authorType = "agent",
        entryId = "E2", entryType = "message"),
      // queue assignment, agent assignment, resolution
      bev("ticketChangeJoom", "10:30:00", queueId = "Q1"),
      bev("ticketChangeJoom", "11:30:00", agentId = "AG1"),
      bev("ticketChangeJoom", "12:00:00", stateOwner = "Resolved"),
      // agent id also arrives via the non-Joom entry stream
      bev("ticketEntryAdd", "11:00:31", author = "AG1", authorType = "agent",
        entryId = "E2", entryType = "message"),
      // CSAT widget: first shown unanswered, then answered 'good'
      bev("babyloneWidgetAction", "12:30:00", widgetType = "did_we_help"),
      bev("babyloneWidgetAction", "13:00:00", widgetType = "did_we_help",
        selected = Seq("good"))
    ).mkString("\nUNION ALL\n")))

    ctx.sources.register("mart", "fact_order_2020")(sp => sp.sql(
      "SELECT 'U1' AS user_id, TIMESTAMP'2024-06-01 09:00:00' AS created_time_utc"))
    ctx.sources.register("mongo", "babylone_joom_agents_daily_snapshot")(sp => sp.sql(
      "SELECT 'AG1' AS _id, 'agent@x.io' AS email"))

    val dbLoc = TempDirs.create("graft_babylonedb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS mongo LOCATION '$dbLoc'")
    try {
      spark.sql("SELECT 'Q1' AS _id, 'General' AS name")
        .write.mode("overwrite").option("path", s"$dbLoc/babylone_joom_queues_daily_snapshot")
        .saveAsTable("mongo.babylone_joom_queues_daily_snapshot")
      spark.sql("SELECT 'TG1' AS _id, 'VIP' AS name")
        .write.mode("overwrite").option("path", s"$dbLoc/babylone_joom_tags_daily_snapshot")
        .saveAsTable("mongo.babylone_joom_tags_daily_snapshot")

      val model = SqlTemplater.sqlModelAuto("support_mart_ticket_id_ext",
        java.nio.file.Files.readString(java.nio.file.Paths.get(
          "/root/reference/models/spark/support/support_mart_ticket_id_ext.sql")))
      new DagRunner(Seq(model)).run(ctx, selectors = Seq("support_mart_ticket_id_ext"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val out = ctx.ref("support_mart_ticket_id_ext")
      assert(out.count() == 1)
      val r = out.selectExpr(
        "ticket_id", "CAST(creation_ticket_ts_msk AS STRING)", "author_of_ticket",
        "author_email", "device_id", "user_id", "country", "is_hidden",
        "button_place", "os", "has_success_payments",
        "CAST(resolution_ticket_ts_msk AS STRING)", "language",
        "CAST(ttfr AS DOUBLE)", "ttfr_author_type", "is_closed",
        "current_queue", "queues", "first_queue", "first_queue_not_limbo",
        "tags", "parcelIds", "orderIds", "agentIds", "last_agent",
        "responses_to_support", "responses_to_customer", "csat_was_triggered",
        "csat").collect().head

      // hand-tally: agent reply exactly 1h after create -> ttfr 1.0 (the
      // reply entry, not the create, anchors first_replied); alternating
      // message ranks -> 1 response each way; both dictionary joins resolve;
      // CSAT latest answer wins with the unanswered widget flagging trigger
      val expected = Seq[Any]("T1", "2024-06-01 10:00:00", "customer",
        null, "DV1", "U1", "DE", false,
        "order_page", "ios", "yes",
        "2024-06-01 12:00:00", "en",
        null, "agent", "yes",
        "General", Seq("General"), "General", "General",
        Seq("VIP"), Seq("PL1"), Seq("OR1"), Seq("AG1"), "AG1",
        1L, 1L, "yes", "good")
      for (i <- expected.indices) {
        val got = r.get(i)
        val want = expected(i)
        val ok = (got, want) match {
          case (g: Seq[_], w: Seq[_]) => g == w
          case _ => got == want
        }
        if (i == 13) () // ttfr asserted separately below
        else assert(ok, s"col $i: got $got, want $want")
      }
      // ttfr = (11:00:30 - 10:00:00) in hours
      assert(math.abs(r.getDouble(13) - 3630.0 / 3600.0) < 1e-9, r.getDouble(13).toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS mongo CASCADE")
    }
  }
}
