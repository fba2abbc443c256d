package graft

import graft.util.Caches

/** The cache-release seam: every layout-pinning `persist` inside a catalog
  * query registers with [[graft.util.Caches]], and the long-lived runners
  * (Verify, Bench) call `releaseAll()` after each query materializes — so a
  * full-catalog session never accumulates cached blocks. This spec drives
  * the six persisting queries end-to-end the way a runner would and
  * asserts the session ends cache-clean. */
class CacheReleaseSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q25/q127/q145/q153/q161/q179/q193/q194/q200/q206/q207/q209/q210/q218/q219/q222 leave no persistent RDDs after releaseAll") {
    // start clean so a leak from another suite can't mask or fail this one
    Caches.releaseAll()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    var released = 0
    for (q <- Seq("q25_ngram_jaccard", "q127_key_gaps", "q145_sequence_pack",
                  "q153_star_components", "q161_prefix_jaccard",
                  "q179_pack_manifest", "q193_bloom_decontaminate",
                  "q194_bigram_lm", "q200_training_snapshot",
                  "q206_count_min", "q207_pps_sample", "q209_training_order",
                  "q210_perplexity_buckets", "q218_dsir_selection",
                  "q219_semdedup", "q222_sparse_tfidf_topk")) {
      SparkEntry.queries(q)(spark, dir).write
        .format("noop").mode("overwrite").save() // materialize like a runner
      released += Caches.releaseAll()
    }
    released should be >= 16 // each query pinned at least one frame
    // localCheckpoint blocks (q153's CC iterations) are weakly referenced
    // and ContextCleaner-reclaimed after GC — the leak class this seam
    // closes is the STRONGLY-held df.persist blocks, so assert none of
    // those survive
    spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed) shouldBe empty
  }

  test("Caches.pin: default mode persists + registers; checkpoint mode cuts lineage") {
    import spark.implicits._
    Caches.releaseAll()
    // default (persist) mode: eager, registered for release
    val p = Caches.pin(Seq(1, 2, 3).toDS())
    p.collect().sorted shouldBe Array(1, 2, 3)
    p.storageLevel.useMemory shouldBe true // already materialized by pin
    Caches.releaseAll() shouldBe 1
    // checkpoint mode (the production flag, on an ISOLATED child session so
    // no other suite sees the conf): same rows, lineage truncated to an RDD
    // scan, and the handle IS registered — releaseAll frees the
    // executor-local blocks a localCheckpoint pin would otherwise
    // accumulate for the life of a long session
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.pin.mode", "checkpoint")
    val ds = { import s2.implicits._; Seq(4, 5).toDS() }
    val c = Caches.pin(ds.map(_ + 1))
    c.collect().sorted shouldBe Array(5, 6)
    c.queryExecution.optimizedPlan.getClass.getSimpleName shouldBe "LogicalRDD"
    Caches.releaseAll() shouldBe 1
    // unknown mode fails loudly instead of silently not pinning
    s2.conf.set("spark.graft.pin.mode", "nope")
    an[IllegalArgumentException] should be thrownBy Caches.pin(ds)
  }

  test("Caches.pin checkpoint mode goes RELIABLE once a checkpoint dir exists") {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_pin_ckpt_")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.pin.mode", "checkpoint")
    val ds = { import s2.implicits._; Seq(7, 8).toDS() }
    val c = Caches.pin(
      ds.map(_ * 2)(org.apache.spark.sql.Encoders.scalaInt))
    c.collect().sorted shouldBe Array(14, 16)
    c.queryExecution.optimizedPlan.getClass.getSimpleName shouldBe "LogicalRDD"
    // the pinned frame landed on the (cluster-FS-shaped) checkpoint dir,
    // not in executor-local blocks — the 100 TB durability story
    import scala.jdk.CollectionConverters._
    val entries = java.nio.file.Files.walk(ckptDir).iterator().asScala.toSeq
    entries.count(java.nio.file.Files.isRegularFile(_)) should be > 0
  }

  test("releaseAll is idempotent and empty-safe") {
    Caches.releaseAll()
    Caches.releaseAll() shouldBe 0
  }

  test("register from a second thread while handles are live fails loudly") {
    import spark.implicits._
    Caches.releaseAll()
    val pinned = Caches.register(Seq(1, 2, 3).toDS().persist())
    try {
      // same thread: re-register is fine (one query pins several frames)
      Caches.register(Seq(4).toDS().persist())
      // second thread while live: the single-runner contract violation
      @volatile var caught: Option[Throwable] = None
      val t = new Thread(() => {
        val ds = Seq(5).toDS().persist()
        try Caches.register(ds)
        catch { case e: Throwable => caught = Some(e) }
        finally ds.unpersist(true) // rejected handle must not leak a cache
      }, "cache-contract-intruder")
      t.start(); t.join()
      caught.map(_.getClass) shouldBe Some(classOf[IllegalStateException])
      caught.get.getMessage should include("ONE in-flight query")
    } finally {
      Caches.releaseAll()
      pinned.unpersist(true)
    }
    // after release, a different thread may own the registry again
    val t2 = new Thread(() => Caches.register(Seq(6).toDS().persist()), "next-runner")
    t2.start(); t2.join()
    Caches.releaseAll() shouldBe 1
  }
}
