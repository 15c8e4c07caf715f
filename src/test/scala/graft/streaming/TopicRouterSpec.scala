package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Dynamic routing parity with the reference scaler (TopicScaler.java:97-183
  * + TopicAssignmentManager.java:115-147): assignments follow the LIVE
  * camera set — new cameras re-route the fleet mid-stream without restart,
  * disappeared cameras re-pack the remainder.
  */
class TopicRouterSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("assignment math matches the reference: sorted cams, ceil-packed topics") {
    val r = new TopicRouter(maxPerTopic = 2, minTopics = 1)
    r.observe(Seq("cam1", "cam0"))
    assert(r.assignments == Map("cam0" -> "video-events-0", "cam1" -> "video-events-0"))
    r.observe(Seq("cam2"))
    // 3 cams / 2 per topic → 2 topics; sorted index 2 → topic 1
    assert(r.assignments == Map(
      "cam0" -> "video-events-0", "cam1" -> "video-events-0", "cam2" -> "video-events-1"))
  }

  test("a removed camera re-packs the remainder into fewer topics") {
    val r = new TopicRouter(maxPerTopic = 2, minTopics = 1)
    r.observe(Seq("cam0", "cam1", "cam2", "cam3"))
    assert(r.assignments("cam3") == "video-events-1")
    r.remove(Seq("cam0", "cam1"))
    // 2 live cams → 1 topic; cam2/cam3 move DOWN to topic 0 (reconcile)
    assert(r.assignments == Map("cam2" -> "video-events-0", "cam3" -> "video-events-0"))
  }

  test("expire drops cameras by last-seen age, like a ZK ephemeral timeout") {
    val r = new TopicRouter(maxPerTopic = 2)
    r.observe(Seq("cam0"), atMillis = 1000L)
    r.observe(Seq("cam1"), atMillis = 9000L)
    assert(r.expire(maxIdleMillis = 5000L, nowMillis = 10000L) == Seq("cam0"))
    assert(r.liveCameras == Seq("cam1"))
  }

  test("minTopics floor holds with no cameras and tiny fleets") {
    val r = new TopicRouter(maxPerTopic = 2, minTopics = 3)
    assert(r.assignments.isEmpty)
    r.observe(Seq("cam0"))
    assert(r.assignments("cam0") == "video-events-0") // idx 0 regardless of floor
  }

  test("a camera appearing mid-stream re-routes the fleet without restart") {
    val source = MemoryStream[(String, String)](spark)
    val router = new TopicRouter(maxPerTopic = 2, minTopics = 1)
    val out = graft.ScratchDir.dir("router-out")
    val ckpt = graft.ScratchDir.dir("router-ckpt")
    val wire = source.toDF().toDF("key", "value")

    val q = TopicRouter.routeStream(wire, router, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // batch 1: two cameras → both on topic 0
      source.addData(("cam0", "f0"), ("cam1", "f1"))
      q.processAllAvailable()
      // batch 2: two NEW cameras appear mid-stream → fleet spans 2 topics
      source.addData(("cam0", "f2"), ("cam2", "f3"), ("cam3", "f4"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(out)
      .select("key", "value", "topic").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("cam0", "f0", "video-events-0"),
      ("cam1", "f1", "video-events-0"),
      // batch 2 routed with the LIVE set {cam0..cam3}: 4/2 → 2 topics
      ("cam0", "f2", "video-events-0"),
      ("cam2", "f3", "video-events-1"),
      ("cam3", "f4", "video-events-1")))
    assert(router.liveCameras == Seq("cam0", "cam1", "cam2", "cam3"))
  }

  test("routeStream with maxIdle expires silent cameras before routing each batch") {
    val source = MemoryStream[(String, String)](spark)
    val router = new TopicRouter(maxPerTopic = 1, minTopics = 1)
    // pre-register a long-idle camera that sorts BEFORE cam0 ('-' < '0'):
    // if it survived the reconcile, cam0 would sit at sorted index 1 and
    // route to video-events-1 — so the topic assertion below actually
    // discriminates expire-before-route from no/late expiry
    router.observe(Seq("cam-idle"), atMillis = 1L)
    val noExpiry = new TopicRouter(maxPerTopic = 1, minTopics = 1)
    noExpiry.observe(Seq("cam-idle", "cam0"))
    assert(noExpiry.assignments("cam0") == "video-events-1") // without-expiry baseline
    val out = graft.ScratchDir.dir("router-exp-out")
    val ckpt = graft.ScratchDir.dir("router-exp-ckpt")
    val q = TopicRouter.routeStream(source.toDF().toDF("key", "value"), router, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      maxIdleMillis = 60_000L)
    try {
      source.addData(("cam0", "f0"))
      q.processAllAvailable()
    } finally q.stop()
    // cam-idle expired BEFORE routing, so cam0 packed into topic 0
    assert(router.liveCameras == Seq("cam0"))
    val topics = spark.read.parquet(out).select("topic").collect().map(_.getString(0)).toSet
    assert(topics == Set("video-events-0"))
  }

  test("routeStream restarted from checkpoint with a fresh router re-learns the fleet") {
    // driver restart: the in-memory registry dies with the process (like the
    // reference's scaler, which rebuilds from ZK); a new router must re-learn
    // the fleet from the first post-restart batch and route consistently
    val source = MemoryStream[(String, String)](spark)
    val out = graft.ScratchDir.dir("router-rs-out")
    val ckpt = graft.ScratchDir.dir("router-rs-ckpt")
    val wire = source.toDF().toDF("key", "value")

    val q1 = TopicRouter.routeStream(wire, new TopicRouter(maxPerTopic = 2), out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      source.addData(("cam0", "f0"), ("cam1", "f1"), ("cam2", "f2"))
      q1.processAllAvailable()
    } finally q1.stop()

    val fresh = new TopicRouter(maxPerTopic = 2)
    val q2 = TopicRouter.routeStream(wire, fresh, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      source.addData(("cam0", "f3"), ("cam2", "f4"), ("cam3", "f5"))
      q2.processAllAvailable()
    } finally q2.stop()

    // post-restart batch routed from the re-learned live set {cam0,cam2,cam3}
    val rows = spark.read.parquet(out).select("key", "value", "topic").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.filter(r => Set("f3", "f4", "f5")(r._2)) == Set(
      ("cam0", "f3", "video-events-0"),
      ("cam2", "f4", "video-events-0"),
      ("cam3", "f5", "video-events-1")))
    assert(fresh.liveCameras == Seq("cam0", "cam2", "cam3")) // cam1 not re-learned
  }

  test("a null key routes to the fallback topic instead of NPE-ing the batch") {
    val r = new TopicRouter(maxPerTopic = 2)
    val df = Seq((null.asInstanceOf[String], "x"), ("cam0", "y")).toDF("key", "value")
    val routed = r.route(df).collect()
      .map(x => Option(x.getString(0)).getOrElse("<null>") -> x.getString(2)).toMap
    assert(routed == Map("<null>" -> "video-events-0", "cam0" -> "video-events-0"))
    assert(r.liveCameras == Seq("cam0")) // the null never registered
  }

  test("a key unseen by the assignment snapshot falls back instead of throwing (ANSI)") {
    // the scenario: a non-deterministic unpersisted frame surfaces a key the
    // distinct-keys collect never observed. Under ANSI (Spark 4 default)
    // element_at on a map would fail the batch with MAP_KEY_DOES_NOT_EXIST;
    // the router must route the stranger to the documented topic-0 fallback.
    val r = new TopicRouter(maxPerTopic = 2)
    val df = Seq(("ghost", "x"), ("cam0", "y")).toDF("key", "value")
    val routed = df.withColumn("topic",
        r.topicColumn(Map("cam0" -> "video-events-1"), "key"))
      .collect().map(x => x.getString(0) -> x.getString(2)).toMap
    assert(routed == Map("ghost" -> "video-events-0", "cam0" -> "video-events-1"))
  }

}
