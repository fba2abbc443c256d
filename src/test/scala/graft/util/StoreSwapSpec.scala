package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkTestBase

/** Every crash state of the store-swap protocol, manufactured by hand and
  * repaired by [[StoreSwap.recover]] — the guarantee the maintenance
  * cycles ([[graft.ext.Similarity.maintainIndexStore]] /
  * [[graft.ext.TextAnalysis.maintainHybridStore]]) lean on. */
class StoreSwapSpec extends SparkTestBase {

  private def fs: FileSystem =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A fake store dir whose content is identified by a tag file. */
  private def mkStore(p: String, tag: String): Unit = {
    fs.mkdirs(new Path(p, "delta=0"))
    fs.create(new Path(p, s"delta=0/$tag"), true).close()
  }
  private def tagOf(p: String): String =
    fs.listStatus(new Path(p, "delta=0")).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).head

  private def freshRoot(): String = {
    val base = java.nio.file.Files.createTempDirectory("graft_swap").toString
    s"$base/store"
  }

  test("begin/commit performs a full swap; recover on a healthy store is a no-op") {
    val root = freshRoot()
    mkStore(root, "OLD")
    StoreSwap.recover(fs, root) shouldBe false
    val staging = StoreSwap.begin(fs, root)
    mkStore(staging.toString, "NEW")
    StoreSwap.commit(fs, root)
    tagOf(root) shouldBe "NEW"
    fs.exists(StoreSwap.stagingPath(root)) shouldBe false
    fs.exists(StoreSwap.oldPath(root)) shouldBe false
    fs.exists(new Path(root, "_SWAP_READY")) shouldBe false
    StoreSwap.recover(fs, root) shouldBe false
  }

  test("crash before step 2 (staging present, root intact): staging discarded, store kept") {
    // both an incomplete staging (write job died mid-flight) ...
    val r1 = freshRoot()
    mkStore(r1, "OLD")
    mkStore(StoreSwap.stagingPath(r1).toString, "HALF")
    StoreSwap.recover(fs, r1) shouldBe true
    tagOf(r1) shouldBe "OLD"
    fs.exists(StoreSwap.stagingPath(r1)) shouldBe false
    // ... and a COMPLETE one (marker written, rename never started): the
    // root is consistent either way — discard and let the policy re-fire
    val r2 = freshRoot()
    mkStore(r2, "OLD")
    mkStore(StoreSwap.stagingPath(r2).toString, "NEW")
    fs.create(new Path(StoreSwap.stagingPath(r2), "_SWAP_READY"), true).close()
    StoreSwap.recover(fs, r2) shouldBe true
    tagOf(r2) shouldBe "OLD"
    fs.exists(StoreSwap.stagingPath(r2)) shouldBe false
  }

  test("crash between steps 2 and 3 (no root, complete staging): staging installed") {
    val root = freshRoot()
    mkStore(StoreSwap.oldPath(root).toString, "OLD")
    mkStore(StoreSwap.stagingPath(root).toString, "NEW")
    fs.create(new Path(StoreSwap.stagingPath(root), "_SWAP_READY"), true).close()
    StoreSwap.recover(fs, root) shouldBe true
    tagOf(root) shouldBe "NEW"
    fs.exists(StoreSwap.oldPath(root)) shouldBe false
    fs.exists(new Path(root, "_SWAP_READY")) shouldBe false
  }

  test("crash in step 2 with an INCOMPLETE staging (no root): old store rolled back") {
    val root = freshRoot()
    mkStore(StoreSwap.oldPath(root).toString, "OLD")
    mkStore(StoreSwap.stagingPath(root).toString, "HALF") // no marker
    StoreSwap.recover(fs, root) shouldBe true
    tagOf(root) shouldBe "OLD"
    fs.exists(StoreSwap.stagingPath(root)) shouldBe false
  }

  test("crash between steps 3 and 4 (root installed, stale .old): leftovers reclaimed") {
    val root = freshRoot()
    mkStore(root, "NEW")
    fs.create(new Path(root, "_SWAP_READY"), true).close() // marker not yet dropped
    mkStore(StoreSwap.oldPath(root).toString, "OLD")
    StoreSwap.recover(fs, root) shouldBe true
    tagOf(root) shouldBe "NEW"
    fs.exists(StoreSwap.oldPath(root)) shouldBe false
    fs.exists(new Path(root, "_SWAP_READY")) shouldBe false
  }

  test("maintenance end to end survives a manufactured mid-swap crash state") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ext = graft.ext.Similarity
    val corpus = (1 to 40).map(i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 13 + j * 7) % 11 - 5).toFloat))).toDF("id", "v")
    val cents = Seq((0L, Array(2.0f, 2.0f, 2.0f, 2.0f)),
      (1L, Array(-2.0f, -2.0f, -2.0f, -2.0f))).toDF("cid", "v")
    val cb = ext.pqCodebookByStride(
      ext.residuals(corpus, cents, "id", "cid", "v"),
      "id", "res", m = 2, subDim = 2, stride = 5)
    val root = freshRoot()
    val sink = ext.idempotentIndexSink(root)
    sink(ext.residualIndex(corpus.where(col("id") <= 20), cents, cb,
      "id", "cid", "v", m = 2, subDim = 2), 0L)
    sink(ext.residualIndex(corpus.where(col("id") > 20), cents, cb,
      "id", "cid", "v", m = 2, subDim = 2), 1L)
    val expected = ext.readIndexStore(spark, root).collect().toSet
    // manufacture the worst state: the previous cycle crashed between its
    // renames — no root, complete staging
    fs.rename(new Path(root), StoreSwap.oldPath(root))
    mkStore(StoreSwap.stagingPath(root).toString, "GARBAGE_INCOMPLETE")
    // the next maintenance cycle must first roll back to the old store,
    // then compact it normally
    ext.maintainIndexStore(spark, root, maxDeltas = 1, cap = 8L) shouldBe true
    ext.indexStoreDeltas(spark, root) shouldBe Seq(1L)
    ext.readIndexStore(spark, root).collect().toSet shouldBe expected
  }
}
