package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkTestBase

/** Every crash state of the generation-pointer publish protocol,
  * manufactured by hand — with the property the layout exists for checked
  * at EVERY state: a reader ([[GenStore.current]]) always resolves a
  * complete generation, before, during and after both the wreck and its
  * [[GenStore.recover]] repair. */
class GenStoreSpec extends SparkTestBase {

  private def fs: FileSystem =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshRoot(): String = {
    val base = java.nio.file.Files.createTempDirectory("graft_gen").toString
    s"$base/store"
  }

  /** Tag a generation dir's content so completeness/identity is checkable. */
  private def fill(p: Path, tag: String): Unit = {
    fs.mkdirs(p)
    fs.create(new Path(p, tag), true).close()
  }
  private def tagOf(p: Path): String =
    fs.listStatus(p).map(_.getPath.getName).filterNot(_.startsWith("_")).head

  /** The reader invariant: a resolvable pointer whose dir exists and holds
    * the expected content. */
  private def readerSees(root: String, gen: Long, tag: String): Unit = {
    GenStore.current(fs, root) shouldBe Some(gen)
    val p = GenStore.currentPath(fs, root).get
    fs.exists(p) shouldBe true
    tagOf(p) shouldBe tag
  }

  private def publishGen(root: String, gen: Long, tag: String,
      retain: Int = 1): Unit = {
    val staging = GenStore.stage(fs, root, gen)
    fill(staging, tag)
    GenStore.publish(fs, root, gen, retain)
  }

  test("bootstrap, publish chain, retention of grace dirs") {
    val root = freshRoot()
    GenStore.current(fs, root) shouldBe None
    publishGen(root, 0, "G0")
    readerSees(root, 0, "G0")
    publishGen(root, 1, "G1")
    readerSees(root, 1, "G1")
    // retain=1: gen 0 dir survives THIS publish as reader grace
    fs.exists(GenStore.generationPath(root, 0)) shouldBe true
    publishGen(root, 2, "G2")
    readerSees(root, 2, "G2")
    // ... and is reclaimed one publish later; gen 1 is the new grace dir
    fs.exists(GenStore.generationPath(root, 0)) shouldBe false
    fs.exists(GenStore.generationPath(root, 1)) shouldBe true
    // exactly one marker at rest
    fs.listStatus(new Path(root)).map(_.getPath.getName)
      .count(_.startsWith("_GEN_")) shouldBe 1
    GenStore.recover(fs, root) shouldBe false
  }

  test("publish refuses a non-monotonic generation and an unstaged one") {
    val root = freshRoot()
    publishGen(root, 3, "G3")
    an[IllegalArgumentException] should be thrownBy GenStore.stage(fs, root, 3)
    an[IllegalArgumentException] should be thrownBy GenStore.publish(fs, root, 9)
  }

  test("crash mid-staging-write: garbage staging reclaimed, reader unaffected") {
    val root = freshRoot()
    publishGen(root, 0, "G0")
    fill(new Path(root, "gen=1.staging"), "HALF")
    readerSees(root, 0, "G0") // invariant holds in the wreck state itself
    GenStore.recover(fs, root) shouldBe true
    fs.exists(new Path(root, "gen=1.staging")) shouldBe false
    readerSees(root, 0, "G0")
  }

  test("crash between install and flip (steps 2-3): complete dir, no marker — recover finishes the flip") {
    val root = freshRoot()
    publishGen(root, 0, "G0")
    // manufacture: gen=1 installed (complete by the rename-only
    // construction) but _GEN_1 never created
    fill(GenStore.generationPath(root, 1), "G1")
    readerSees(root, 0, "G0") // reader still on gen 0 — never broken
    GenStore.recover(fs, root) shouldBe true
    readerSees(root, 1, "G1")
    fs.exists(GenStore.generationPath(root, 0)) shouldBe true // grace dir
  }

  test("crash between flip and marker cleanup (steps 3-4): two markers — max wins before AND after repair") {
    val root = freshRoot()
    publishGen(root, 0, "G0")
    fill(GenStore.generationPath(root, 1), "G1")
    fs.create(new Path(root, "_GEN_1"), true).close()
    // wreck state: markers {0, 1} — the reader already resolves 1
    readerSees(root, 1, "G1")
    GenStore.recover(fs, root) shouldBe true
    readerSees(root, 1, "G1")
    fs.exists(new Path(root, "_GEN_0")) shouldBe false
  }

  test("crash during dir reclamation (step 5): stale dirs reclaimed on the next cycle") {
    val root = freshRoot()
    publishGen(root, 0, "G0")
    publishGen(root, 1, "G1")
    publishGen(root, 2, "G2")
    // manufacture a missed reclamation: resurrect gen=0 as a stale dir
    fill(GenStore.generationPath(root, 0), "G0")
    readerSees(root, 2, "G2")
    GenStore.recover(fs, root) // healthy markers; cycle-level repair
    // a stale dir is harmless to readers (max marker still wins) and the
    // next PUBLISH reclaims it
    publishGen(root, 3, "G3")
    readerSees(root, 3, "G3")
    fs.exists(GenStore.generationPath(root, 0)) shouldBe false
    fs.exists(GenStore.generationPath(root, 1)) shouldBe false
  }

  test("cycle: no-op below the policy, stage+flip above it, repair first") {
    val root = freshRoot()
    publishGen(root, 0, "G0")
    // wreck the root first: recover must run before the policy
    fill(new Path(root, "gen=9.staging"), "HALF")
    GenStore.cycle(fs, root, gen = 1) { false } { _ => fail("must not fire") } shouldBe false
    fs.exists(new Path(root, "gen=9.staging")) shouldBe false // repaired
    readerSees(root, 0, "G0")
    GenStore.cycle(fs, root, gen = 1) { true } { p => fill(p, "G1") } shouldBe true
    readerSees(root, 1, "G1")
  }

  test("live race: a reader loop never observes a missing or inconsistent root while a writer publishes") {
    // The wreck-matrix tests above check STATES; this checks the LIVE
    // interleaving the layout exists for — a reader resolving the pointer
    // at arbitrary instants while publishes flip it. Each generation dir
    // carries its own id as content, so every read validates identity:
    // resolve → read inside the resolved dir → the content names the
    // resolved generation. retain=4 is the grace window covering reader
    // latency (the documented contract: retain must outlast a reader's
    // resolve-to-read span; 4 publishes of headroom ≫ one file read).
    val root = freshRoot()
    val gens = 30
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      // each reader iteration uses its OWN FileSystem-independent calls;
      // the loop runs until the writer finishes, then once more
      var go = true
      while (go) {
        go = !done.get()
        try GenStore.current(fs, root).foreach { g =>
          val p = GenStore.generationPath(root, g)
          val tag = fs.listStatus(p).map(_.getPath.getName)
            .filterNot(_.startsWith("_")).headOption.getOrElse("EMPTY")
          if (tag != s"G$g") failures.add(s"gen $g resolved but read $tag")
          reads.incrementAndGet()
        } catch {
          case e: Exception => failures.add(s"reader threw: $e")
        }
      }
    })
    reader.start()
    (0 until gens).foreach { g =>
      publishGen(root, g.toLong, s"G$g", retain = 4)
    }
    done.set(true)
    reader.join(30000)
    assert(!reader.isAlive, "reader thread wedged")
    assert(failures.isEmpty, s"reader invariant violated: ${failures.peek()}")
    assert(reads.get() > 0, "the race never exercised a read")
    GenStore.current(fs, root) shouldBe Some((gens - 1).toLong)
  }
}
