package graft.streaming

import org.apache.spark.sql.types._

/** The reference's 9-table event data model, re-declared as StructTypes.
  *
  * Source of truth: /root/reference/migrations/002..011_*.up.sql (DDL) and
  * /root/reference/build/format_schemas/dto.proto (wire schema). All nine
  * tables share a 16-column envelope (migrations lines 2-17, proto fields
  * 1-16); extras per table are listed in SURVEY.md §1.4.
  *
  * Wire types follow the proto: `timestamp` is int64 epoch SECONDS
  * (dto.proto:12) and is converted to TimestampType at ingest — the one
  * real ingestion-time coercion in the reference (SURVEY §1.3). proto3
  * defaults mean absent fields arrive as ""/0/false, never NULL; the DDL
  * columns are non-Nullable to match.
  */
object EventSchemas {

  private def s(n: String)    = StructField(n, StringType, nullable = true)
  private def i(n: String)    = StructField(n, IntegerType, nullable = true)
  private def b(n: String)    = StructField(n, BooleanType, nullable = true)
  private def arr(n: String)  = StructField(n, ArrayType(StringType, containsNull = false), nullable = true)

  /** Shared 16-field envelope — migrations lines 2-17, dto.proto fields 1-16. */
  val envelope: Seq[StructField] = Seq(
    s("event_id"), s("event_name"), s("user_id"), s("session_id"),
    s("anonymous_id"),
    StructField("timestamp", LongType, nullable = true), // epoch seconds on the wire
    s("service_origin"), s("platform"), s("platform_version"),
    s("os_name"), s("os_version"), s("browser_name"), s("browser_version"),
    s("device_type"), s("screen_resolution"), s("user_agent"))

  private def wire(extras: StructField*): StructType = StructType(envelope ++ extras)

  /** Wire (decode) schema per table — canonical table names follow the
    * migrations, NOT the reference's routing table, which misspells the
    * two shahre_farang tables (src/handler.rs:42,46 vs migrations/009:1,
    * 010:1 — a latent insert-failure bug we do not replicate). */
  val tables: Map[String, StructType] = Map(
    // migrations/002 — envelope only
    "login_events" -> wire(),
    // migrations/004:18-19
    "sabte_ahval_events" -> wire(s("profile_id"), b("is_new_user")),
    // migrations/005:18-19
    "angulak_like_events" -> wire(s("play_info_id"), s("action")),
    // migrations/006:18-33
    "angulak_watch_events" -> wire(
      s("state"), s("item_type"), s("item_id"), s("play_info_id"),
      i("season_number"), i("episode_number"),
      s("subtitle_language"), s("audio_language"),
      i("video_position"), i("video_duration"),
      s("player_version"), s("internet_connection_type"), s("region"),
      s("ad_id"), s("ad_type"), s("event_details")),
    // migrations/007:18
    "session_events" -> wire(b("is_ended")),
    // migrations/008:18
    "angulak_comment_events" -> wire(s("play_info_id")),
    // migrations/009:18-28
    "shahre_farang_item_events" -> wire(
      s("item_id"), s("play_info_id"), i("age_rating"),
      b("is_dubbed"), b("is_exclusive"), b("has_subtitle"),
      arr("genres"), arr("labels"), arr("languages"), arr("categories"),
      s("reach_method")),
    // migrations/010:18-25
    "shahre_farang_play_info_events" -> wire(
      i("duration"), s("item_id"),
      arr("genres"), arr("categories"), arr("labels"),
      b("has_subtitle"), b("is_dubbed"), s("reach_method")),
    // migrations/011:18-19
    "angulak_bookmark_events" -> wire(s("play_info_id"), s("action")))

  /** Subject → table routing, mirroring src/handler.rs:15-55 (with the
    * canonical table names — see above). Unroutable subjects are
    * dead-lettered (reference: terminal drop, src/main.rs:68-72). */
  val routes: Map[String, String] = Map(
    "events.login"                  -> "login_events",
    "events.sabte_ahval"            -> "sabte_ahval_events",
    "events.angulak.like"           -> "angulak_like_events",
    "events.angulak.watch"          -> "angulak_watch_events",
    "events.session"                -> "session_events",
    "events.angulak.comment"        -> "angulak_comment_events",
    "events.shahrefarang.item"      -> "shahre_farang_item_events",
    "events.shahrefarang.play_info" -> "shahre_farang_play_info_events",
    "events.angulak.bookmark"       -> "angulak_bookmark_events")
}
