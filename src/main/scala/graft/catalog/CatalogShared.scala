package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.core.Event
import graft.core.parse.GameLogParser
import graft.core.stats.PlayerStatsEngine
import graft.core.enrich.Enrich
import graft.analytics.{AsofJoin, GlobalCumsum, Intervals, RangeJoin, Scoreboard, Sessionize}
import graft.ext.{Dedup, Diff, Multimodal, Prefilter, Sampling, Similarity, Skew, TextAnalysis}

/** Shared plumbing for the per-family catalog files: the parquet reader with
  * the ts-vintage/UTC pins (`T`), the exact-decimal cast (`dec`), per-query
  * session isolation, the per-JVM BPE model memo, and the multi-query oracle
  * CTE builders. Split out of SparkEntry so each family file stays readable;
  * behavior is identical.
  */
private[graft] object CatalogShared {

  def T(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet ts vintages: int64 nanos (needs nanosAsLong to read) or
    // timestamp[us]; either way the catalog sees long epoch nanos — see
    // graft.util.EventTime.
    try {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // EventTime's NTZ→instant rewrite and the epoch-µs arithmetic across
      // the catalog assume UTC; pin it here so a caller session that never
      // set it (e.g. the driver's smoke check) still reads correctly
      s.conf.set("spark.sql.session.timeZone", "UTC")
    } catch {
      // only possible failure: the conf is non-modifiable in this deployment,
      // in which case the session builder must have set it already
      case _: org.apache.spark.sql.AnalysisException => ()
    }
    graft.util.EventTime.tsToLongNanos(s.read.parquet(s"$dir/$name.parquet"))
  }

  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Catalog-query conf isolation: a CHILD session (shared SparkContext,
    * isolated SQLConf + temp-view catalog) with the parent's modifiable
    * runtime conf copied over and `overrides` applied on top. Queries that
    * need a non-default shuffle-partition count or state-store provider pin
    * it HERE instead of mutating the caller's session — no try/finally
    * restore, and no window where a concurrent reader could observe the
    * pin. (newSession() alone only inherits builder-time options, hence
    * the explicit runtime-conf copy.) */
  def isolated(s: SparkSession, overrides: (String, String)*): SparkSession = {
    val s2 = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      if (s2.conf.isModifiable(k)) s2.conf.set(k, v) }
    overrides.foreach { case (k, v) => s2.conf.set(k, v) }
    s2
  }

  /** Per-run scratch dir at a FIXED path per label WITHIN ONE JVM:
    * deleted and recreated on every call, so repeated bench/verify passes
    * reuse ONE disk footprint per gate instead of accumulating abandoned
    * temp stores (the store-lifecycle gates otherwise leave a full
    * index/postings copy + checkpoint in /tmp per pass). The base dir
    * carries a per-process nonce so two concurrent graft JVMs (or two
    * users sharing a machine) can never delete each other's live stores
    * and checkpoints mid-gate, and a shutdown hook reclaims the whole
    * nonce dir — one footprint per gate per process, zero residue after
    * exit. Single-threaded use within one JVM — the catalog runs queries
    * sequentially. */
  private lazy val scratchBase: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_scratch_pid${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.util.Fs.deleteRecursively(p)))
    p
  }
  def scratch(label: String): String = {
    val p = scratchBase.resolve(label)
    graft.util.Fs.deleteRecursively(p)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** The residual-IVFADC ingest fixture shared by q276/q277/q282/q290/
    * q292/q294/q297: frozen model artifacts (stride-picked centroids,
    * stride-50 residual codebooks) + the corpus split across 3 files so
    * AvailableNow + maxFilesPerTrigger=1 yields 3 REAL micro-batches.
    * Staged once per JVM per sfDir; every gate MUST go through this one
    * definition so the artifact content can never depend on catalog
    * execution order. */
  def ivfIngestStaging(s: SparkSession, dir: String): String =
    graft.util.Staging.dir("q276_ingest", dir) { p =>
      val emb = T(s, dir, "embeddings")
      val cent = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("cid"), col("embedding"))
      val cbRes = Similarity.pqCodebookByStride(
        Similarity.residuals(emb, cent, "vec_id", "cid", "embedding"),
        "vec_id", "res", m = 4, subDim = 16, stride = 50)
      cent.write.mode("overwrite").parquet(s"$p/centroids")
      cbRes.write.mode("overwrite").parquet(s"$p/codebooks")
      emb.select(col("vec_id"), col("embedding"))
        .repartition(3).write.mode("overwrite").parquet(s"$p/vectors")
    }

  /** The store-lifecycle gates' serve session + their shared
    * (q_id, text, embedding) query frame: 4 pinned shuffle partitions and
    * AQE off — the q270/q296 serve-session discipline (in-gate frames are
    * |batch|-bounded deltas or store-sized postings/model frames, so
    * 32-task stages pay launch overhead, not parallelism, and AQE's
    * per-stage re-planning was measured at ~30-35% of per-batch wall on
    * these shapes). Every frame a gate builds must live on the returned
    * session — one plan never mixes sessions. */
  def hybridGateSession(s: SparkSession, dir: String):
      (SparkSession, DataFrame) = {
    val s2 = isolated(s, "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.enabled" -> "false")
    val docs2 = graft.util.EventTime.tsToLongNanos(
      s2.read.parquet(s"$dir/documents.parquet"))
    val emb2 = graft.util.EventTime.tsToLongNanos(
      s2.read.parquet(s"$dir/embeddings.parquet"))
    (s2, docs2.where(col("doc_id") < 6)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(emb2.select(col("vec_id").as("q_id"), col("embedding")),
        Seq("q_id")))
  }

  /** [[hybridGateSession]]'s vector-store twin: the 4-partition AQE-off
    * gate session plus the frames every IVF-store gate consumes on it —
    * the corpus embeddings and the staged frozen model (centroids,
    * codebooks), all read on the gate session so no plan mixes
    * sessions. */
  def ivfGateSession(s: SparkSession, dir: String):
      (SparkSession, DataFrame, DataFrame, DataFrame) = {
    val tmp = ivfIngestStaging(s, dir)
    val s2 = isolated(s, "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.enabled" -> "false")
    (s2,
      graft.util.EventTime.tsToLongNanos(
        s2.read.parquet(s"$dir/embeddings.parquet")),
      s2.read.parquet(s"$tmp/centroids"),
      s2.read.parquet(s"$tmp/codebooks"))
  }

  /** Per-JVM staged FULL-CORPUS residual-IVFADC index under the q276
    * frozen model (m = 4, subDim = 16) — the generation-CONTENT artifact
    * of the generation-layout gates (q299/q300): a deterministic pure
    * function of (corpus, frozen model), identical on every pass, so
    * re-encoding it per arm per pass times the encode, not the
    * pointer/refresh protocol those gates test (the q252/q293 artifact
    * discipline). Gates install it into a generation dir by FILE COPY
    * ([[graft.util.Fs.copyRecursively]]) — the publish protocol itself
    * (stage → rename → marker flip) stays live per pass. */
  def frozenFullIndexStaging(s: SparkSession, dir: String): String = {
    // the model staging runs BEFORE the closure: Staging.dir must never
    // nest inside another staging closure (computeIfAbsent on one map)
    val tmp = ivfIngestStaging(s, dir)
    graft.util.Staging.dir("q299_full_index", dir) { p =>
      Similarity.residualIndex(T(s, dir, "embeddings"),
          s.read.parquet(s"$tmp/centroids"), s.read.parquet(s"$tmp/codebooks"),
          "vec_id", "cid", "embedding", m = 4, subDim = 16)
        .write.mode("overwrite").parquet(s"$p/index")
    } + "/index"
  }

  /** The streamed-corpus fixture shared by q278/q284/q291/q293/q295/q298:
    * (doc, vector) rows FULL OUTER joined — the fixture tables are NOT
    * 1:1 at every scale (sf0.1 ships 5000 docs but 2000 embeddings; an
    * inner join would silently drop text-only docs from the postings
    * store) — split across 3 files for 3 real micro-batches. One
    * definition for the same execution-order reason as
    * [[ivfIngestStaging]]. */
  def corpusStreamStaging(s: SparkSession, dir: String): String =
    graft.util.Staging.dir("q278_corpus_stream", dir) { p =>
      val docs = T(s, dir, "documents")
      val emb = T(s, dir, "embeddings")
      docs.select(col("doc_id"), col("text"))
        .join(emb.select(col("vec_id"), col("embedding")),
          col("doc_id") === col("vec_id"), "full_outer")
        .repartition(3).write.mode("overwrite").parquet(s"$p/corpus")
    }

  /** Per-JVM staged INGESTED postings store — q278's streamed 3-delta
    * store as an ARTIFACT, for gates whose subject is DOWNSTREAM of
    * ingest (compaction q284, tombstone compaction q295): re-running the
    * live 3-micro-batch ingest per bench pass in those gates times setup,
    * not the operator under test (the q252/q293-control artifact
    * discipline). The live ingest path itself stays gated where it IS the
    * subject — q278 (ingest), q291 (crash replay), q293 (policy in the
    * loop), q298 (crash × policy), q303 (retention), q304 (gen-pointer
    * serve). Consumers must NOT mutate the store (compaction writes to a
    * fresh out dir). */
  def ingestedPostingsStore(s: SparkSession, dir: String): String =
    graft.util.Staging.dir("q284_ingested_store", dir) { p =>
      val tmp = corpusStreamStaging(s, dir)
      val q = TextAnalysis.ingestPostingsStream(
          s.readStream
            .schema("doc_id LONG, text STRING, vec_id LONG, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1).parquet(s"$tmp/corpus"),
          "doc_id", "text", "vec_id", "embedding", s"$p/store")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } + "/store"

  /** Stage `slices` as SINGLE parquet files `00.parquet, 01.parquet, …`
    * with ascending (fixed, deterministic) modification times inside
    * `<staging>/stream`, so a `maxFilesPerTrigger=1` file source
    * processes slice i as micro-batch i. This is what makes a per-batch
    * oracle STATABLE IN SQL: the gates that serve mid-ingest
    * (q300/q301/q302) need each micro-batch's row membership to be an
    * id predicate, not an accident of `repartition` hashing. The file
    * source picks files oldest-first; every consuming gate additionally
    * REQUIREs the realized per-batch membership, so an ordering
    * deviation fails loudly instead of silently corrupting an oracle. */
  def orderedSliceStaging(s: SparkSession, dir: String, label: String)(
      slices: => Seq[DataFrame]): String =
    graft.util.Staging.dir(label, dir) { p =>
      import scala.jdk.CollectionConverters._
      val streamDir = java.nio.file.Paths.get(p, "stream")
      java.nio.file.Files.createDirectories(streamDir)
      slices.zipWithIndex.foreach { case (df, i) =>
        val tmp = java.nio.file.Paths.get(p, s"__slice$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = {
          val ls = java.nio.file.Files.list(tmp)
          try ls.iterator().asScala.map(_.getFileName.toString)
            .find(n => n.startsWith("part-") && n.endsWith(".parquet"))
            .getOrElse(sys.error(s"no part file in $tmp"))
          finally ls.close()
        }
        val dest = streamDir.resolve(f"$i%02d.parquet")
        java.nio.file.Files.move(tmp.resolve(part), dest)
        // fixed epoch base: ordering is relative and must not depend on
        // when the staging happened to run
        dest.toFile.setLastModified(1700000000000L + i * 60000L)
        graft.util.Fs.deleteRecursively(tmp)
      }
    } + "/stream"

  /** Kill-and-resume harness for the crash-injection gates (q290/q291/
    * q297/q298): the first run must die on the injected crash (a gate
    * whose injection never fired is asserting nothing — fail loudly),
    * the second run restarts from the same checkpoint so the interrupted
    * batch REPLAYS. */
  def runWithInjectedCrash(
      mk: () => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    try { mk().awaitTermination(); sys.error("injected crash did not fire") }
    catch {
      case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
    }
    mk().awaitTermination()
  }

  /** Per-JVM memo of the 8-merge tokenizer MODEL per sfDir — the Staging
    * discipline applied to model artifacts: a dozen catalog queries
    * downstream of training (tokenize, ids, packing, streaming serve,
    * detokenize) consume the merge table + vocabulary as INPUTS, exactly
    * as a production pipeline ships them, so the bench times the
    * consumers rather than a re-train per query per pass. The training
    * loop itself stays live-gated (q223 sequential, q236 batched, and
    * every consumer's oracle still replays the learn from scratch). */
  val bpeModelMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(String, String)], Seq[(Int, String, Long)])]()
  def bpeModel8(s: SparkSession, dir: String) =
    bpeModelMemo.computeIfAbsent(dir, _ => {
      val docs = T(s, dir, "documents")
      val merges = ext.Bpe.learnMerges(docs, "text", 8).orderBy(col("step"))
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val vocabRows = ext.Bpe.vocab(docs, "text", merges)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      (merges, vocabRows)
    })
  def merges8(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeModel8(s, dir)._1
  def vocab8Df(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeModel8(s, dir)._2.toDF("token_id", "token", "cnt")
  }
  def vocab8Map(s: SparkSession, dir: String): Map[String, Int] =
    bpeModel8(s, dir)._2.map(t => t._2 -> t._1).toMap

  /** Deterministic synthetic PII salt (email + IP + spaced card number
    * derived from the doc id) appended so the redaction regexes do real
    * work on the PII-free fixtures — the SINGLE source both q182 and
    * q189's pipeline stage (and their oracles' mirrored CTEs) salt with. */
  def piiSalt(text: Column, id: Column): Column =
    concat(text,
      lit(" contact user"), id.cast("string"),
      lit("@mail.example.org from "),
      (id % 256).cast("string"), lit(".16.32."),
      ((id * 7) % 256).cast("string"),
      lit(" card 4111 2222 3333 "),
      lpad((id % 10000).cast("string"), 4, "0"))

  /** Game-event derivation shared by the parse/stream queries: maps the
    * `events` table onto the reference's kill/damage event model with pure
    * integer/string arithmetic (no floats ⇒ bit-exact oracle). */
  def gameEvents(ev: DataFrame): DataFrame =
    ev.select(
      when(col("event_type") === "purchase",
        concat(lit("P"), col("user_id").cast("string"))).otherwise(lit("")).as("player"),
      concat(lit("S"), col("user_id").cast("string")).as("steamId"),
      when(col("event_type") === "purchase", "kill")
        .when(col("event_type") === "error", "death")
        .when(col("event_type") === "signup", "assist")
        .otherwise("damage").as("eventType"),
      col("event_id").as("second"),
      (col("event_id") % 97).as("amount"),
      (lit(1) + col("user_id") % 19).cast("long").as("round"))

  type Q = (SparkSession, String) => DataFrame

  /** Unrolled DuckDB replay of `k` BPE merge iterations over the documents
    * word dict (the [[ext.Bpe]] semantics verbatim): w0 is the delimited
    * initial encoding, each step counts adjacent symbol pairs, picks the
    * deterministic argmax, and applies the plain-string merge — generated
    * programmatically because the oracle must replay a data-dependent
    * LOOP, which SQL can only express unrolled. Returns the WITH body;
    * callers append their final SELECT over m1..mk / w{k}. */
  def bpeOracleCtes(k: Int,
      wordSrc: String = """SELECT unnest(string_split(text, ' ')) AS word
              FROM documents WHERE text IS NOT NULL"""): String = {
    // every chained CTE is MATERIALIZED: DuckDB inlines plain CTEs, and a
    // w(i) that references w(i-1) twice (pair counts + merge) would expand
    // 2^k subtrees of the base scan
    val w0 = s"""w0 AS MATERIALIZED (
        SELECT word, count(*)::BIGINT AS cnt,
          regexp_replace(word, '(.)', '|\\1|', 'g') || '|>|' AS sym
        FROM ($wordSrc)
        WHERE word <> '' GROUP BY word)"""
    val steps = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (
        SELECT p.l AS l, p.r AS r, sum(cnt)::BIGINT AS c FROM (
          SELECT cnt, unnest(list_transform(generate_series(1, len(s) - 1),
            j -> {'l': s[j], 'r': s[j + 1]})) AS p
          FROM (SELECT cnt, string_split(substr(sym, 2, length(sym) - 2), '||') AS s
                FROM w${i - 1})
          WHERE len(s) >= 2)
        GROUP BY 1, 2),
      m$i AS MATERIALIZED (
        SELECT $i AS step, l AS "left", r AS "right", l || r AS merged,
          c AS pair_count
        FROM p$i ORDER BY c DESC, l, r LIMIT 1),
      w$i AS MATERIALIZED (
        SELECT word, cnt, replace(sym,
          '|' || (SELECT "left" FROM m$i) || '||' || (SELECT "right" FROM m$i) || '|',
          '|' || (SELECT merged FROM m$i) || '|') AS sym
        FROM w${i - 1})"""
    }
    (w0 +: steps).mkString(",\n      ")
  }

  /** Unrolled DuckDB replay of `rounds` BATCHED BPE rounds at batch=2
    * ([[ext.Bpe.learnMergesBatched]] semantics): each round counts pairs,
    * ranks the top 2 (count desc, l, r), always accepts rank 1, accepts
    * rank 2 only if symbol-disjoint from rank 1's symbols AND its merged
    * output (the deferral rule), and applies the acceptances as chained
    * replaces in rank order. Scalar subqueries COALESCE to a chr(1)
    * identity replace when a round accepts only one pair (or the dict
    * runs out). The caller trims the unioned acceptances to the first k
    * steps — generating a fixed round count is the price of expressing a
    * data-dependent loop in SQL, and extra rounds trim away exactly
    * because acceptance order equals rank order. */
  def bpeBatchedOracleCtes(rounds: Int): String = {
    val b0 = """b0 AS MATERIALIZED (
        SELECT word, count(*)::BIGINT AS cnt,
          regexp_replace(word, '(.)', '|\1|', 'g') || '|>|' AS sym
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents WHERE text IS NOT NULL)
        WHERE word <> '' GROUP BY word)"""
    val steps = (1 to rounds).map { i =>
      s"""bp$i AS MATERIALIZED (
        SELECT p.l AS l, p.r AS r, sum(cnt)::BIGINT AS c FROM (
          SELECT cnt, unnest(list_transform(generate_series(1, len(s) - 1),
            j -> {'l': s[j], 'r': s[j + 1]})) AS p
          FROM (SELECT cnt, string_split(substr(sym, 2, length(sym) - 2), '||') AS s
                FROM b${i - 1})
          WHERE len(s) >= 2)
        GROUP BY 1, 2),
      bt$i AS MATERIALIZED (
        SELECT l, r, c, rk FROM (
          SELECT *, CAST(row_number() OVER (ORDER BY c DESC, l, r) AS INT) AS rk
          FROM bp$i) WHERE rk <= 2),
      ba$i AS MATERIALIZED (
        SELECT l, r, c, rk FROM bt$i WHERE rk = 1
        UNION ALL
        SELECT t.l, t.r, t.c, t.rk FROM bt$i t JOIN bt$i o ON o.rk = 1
        WHERE t.rk = 2
          AND t.l <> o.l AND t.l <> o.r AND t.l <> o.l || o.r
          AND t.r <> o.l AND t.r <> o.r AND t.r <> o.l || o.r),
      b$i AS MATERIALIZED (
        SELECT word, cnt, replace(
          replace(sym,
            coalesce('|' || (SELECT l FROM ba$i WHERE rk = 1) || '||' ||
              (SELECT r FROM ba$i WHERE rk = 1) || '|', chr(1)),
            coalesce('|' || (SELECT l || r FROM ba$i WHERE rk = 1) || '|', chr(1))),
          coalesce('|' || (SELECT l FROM ba$i WHERE rk = 2) || '||' ||
            (SELECT r FROM ba$i WHERE rk = 2) || '|', chr(1)),
          coalesce('|' || (SELECT l || r FROM ba$i WHERE rk = 2) || '|', chr(1))) AS sym
        FROM b${i - 1})"""
    }
    (b0 +: steps).mkString(",\n      ")
  }

  /** The token-ID derivation CTEs shared by the q234/q235 oracles,
    * appended after [[bpeOracleCtes]] (they read w8): per-word token
    * lists, the frequency-ranked vocabulary ([[ext.Bpe.vocab]] semantics:
    * count desc, token asc, 0-based dense ids), and the per-doc
    * (word position, token position, token) stream. */
  val bpeTokenIdCtes: String = """
      toks AS MATERIALIZED (
        SELECT word, cnt, string_split(substr(sym, 2, length(sym) - 2), '||') AS ts
        FROM w8),
      vc AS (
        SELECT ts[u.i] AS token, sum(cnt)::BIGINT AS c
        FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) u
        GROUP BY 1),
      vocab AS MATERIALIZED (
        SELECT token, CAST(row_number() OVER (ORDER BY c DESC, token) - 1 AS INT) AS token_id
        FROM vc),
      dw AS (
        SELECT doc_id, u.i AS wpos, ws[u.i] AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents WHERE text IS NOT NULL)
        CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u
        WHERE ws[u.i] <> ''),
      dt AS MATERIALIZED (
        SELECT d.doc_id, d.wpos, u.i AS tpos, t.ts[u.i] AS token
        FROM dw d JOIN toks t USING (word)
        CROSS JOIN LATERAL (SELECT unnest(range(1, len(t.ts) + 1)) AS i) u)"""

  /** DuckDB expression applying the k learned merges (m1..mk from
    * [[bpeOracleCtes]]) to an arbitrary `word` column: the initial
    * delimited encoding folded through k nested scalar-subquery replaces —
    * how the oracle tokenizes words OUTSIDE the training dict (q245/q246's
    * salted stream words). */
  def bpeApplyOracleExpr(k: Int): String =
    (1 to k).foldLeft("""regexp_replace(word, '(.)', '|\1|', 'g') || '|>|'""") {
      (acc, i) =>
        s"""replace($acc,
          '|' || (SELECT "left" FROM m$i) || '||' || (SELECT "right" FROM m$i) || '|',
          '|' || (SELECT merged FROM m$i) || '|')"""
    }

  /** One residual-IVFADC model + serving chain for the q249 lifecycle
    * oracle (the q237 chain, parameterized): centroids stride-picked from
    * `centSrc` (a CTE over (vec_id, vec)), the WHOLE current corpus `cur`
    * assigned/encoded against them, residual codebooks stride-trained on
    * the rows matching `cbPred`, queries vec_id < 8 probed at `nprobe`
    * lists (default 4, the q249 setting), ADC-scored, top-`k` ranked
    * (default 10). Emits CTEs prefixed `tag`; `subs` and `cur` are shared
    * and defined by the caller. */
  def residualServeCtes(tag: String, centSrc: String, cbPred: String,
      stride: Int = 5, nprobe: Int = 4, k: Int = 10,
      qPred: String = "n_id < 8"): String = s"""
      ${tag}cent AS (SELECT vec_id AS lcid, vec AS l_vec FROM $centSrc WHERE vec_id % 100 = 0),
      ${tag}ldist AS (
        SELECT a.vec_id AS n_id, c.lcid,
          list_sum(list_transform(range(1, least(len(a.vec), len(c.l_vec)) + 1), i ->
            (a.vec[i] - c.l_vec[i]) * (a.vec[i] - c.l_vec[i]))) AS d
        FROM cur a CROSS JOIN ${tag}cent c),
      ${tag}assign AS (
        SELECT n_id, lcid FROM (
          SELECT *, row_number() OVER (PARTITION BY n_id ORDER BY d, lcid) AS rn
          FROM ${tag}ldist) WHERE rn = 1),
      ${tag}resid AS (
        SELECT a.n_id, a.lcid,
          list_transform(range(1, least(len(x.vec), len(c.l_vec)) + 1),
            i -> x.vec[i] - c.l_vec[i]) AS rv
        FROM ${tag}assign a JOIN cur x ON x.vec_id = a.n_id
        JOIN ${tag}cent c ON c.lcid = a.lcid),
      ${tag}cb AS (
        SELECT sub,
          CAST(row_number() OVER (PARTITION BY sub ORDER BY n_id) - 1 AS BIGINT) AS cid,
          rv[sub*16 + 1 : sub*16 + 16] AS c_vec
        FROM ${tag}resid CROSS JOIN subs WHERE n_id % $stride = 0 $cbPred),
      ${tag}cd AS (
        SELECT r.n_id, b.sub, b.cid,
          list_sum(list_transform(range(1, 17), i ->
            (r.rv[b.sub*16 + i] - b.c_vec[i]) * (r.rv[b.sub*16 + i] - b.c_vec[i]))) AS d2
        FROM ${tag}resid r CROSS JOIN ${tag}cb b),
      ${tag}codes AS (
        SELECT n_id, list(cid ORDER BY sub) AS codes FROM (
          SELECT n_id, sub, cid,
            row_number() OVER (PARTITION BY n_id, sub ORDER BY d2, cid) AS rn
          FROM ${tag}cd) WHERE rn = 1 GROUP BY n_id),
      ${tag}probes AS (
        SELECT n_id AS q_id, lcid FROM (
          SELECT *, row_number() OVER (PARTITION BY n_id ORDER BY d, lcid) AS rn
          FROM ${tag}ldist WHERE $qPred) WHERE rn <= $nprobe),
      ${tag}qres AS (
        SELECT p.q_id, p.lcid,
          list_transform(range(1, least(len(q.vec), len(c.l_vec)) + 1),
            i -> q.vec[i] - c.l_vec[i]) AS rv
        FROM ${tag}probes p JOIN cur q ON q.vec_id = p.q_id
        JOIN ${tag}cent c ON c.lcid = p.lcid),
      ${tag}ld AS (
        SELECT r.q_id, r.lcid, b.sub, b.cid,
          list_sum(list_transform(range(1, 17), i ->
            (r.rv[b.sub*16 + i] - b.c_vec[i]) * (r.rv[b.sub*16 + i] - b.c_vec[i]))) AS pd
        FROM ${tag}qres r CROSS JOIN ${tag}cb b),
      ${tag}lut1 AS (SELECT q_id, lcid, sub, list(pd ORDER BY cid) AS lrow
               FROM ${tag}ld GROUP BY q_id, lcid, sub),
      ${tag}lut AS (SELECT q_id, lcid, list(lrow ORDER BY sub) AS lut
              FROM ${tag}lut1 GROUP BY q_id, lcid),
      ${tag}scored AS (
        SELECT l.q_id, a.n_id,
          list_sum(list_transform(range(0, 4), j -> l.lut[j+1][x.codes[j+1] + 1])) AS adist
        FROM ${tag}lut l
        JOIN ${tag}assign a ON a.lcid = l.lcid
        JOIN ${tag}codes x ON x.n_id = a.n_id
        WHERE a.n_id <> l.q_id),
      ${tag}top AS (
        SELECT q_id, n_id FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS rank
          FROM ${tag}scored) WHERE rank <= $k)"""

  /** Unrolled DuckDB replay of `iters` integer-Lloyd rounds over the
    * embeddings table ([[ext.Similarity.lloydInt]] semantics verbatim):
    * fixed-point grid, exact squared-L2 argmin (ties → smaller cid),
    * elementwise floored means. MATERIALIZED throughout — each round
    * references its predecessor twice. Returns the WITH body; the caller
    * selects the final assignment against c`iters`. */
  def lloydOracleCtes(iters: Int, dims: Int): String = {
    val base = s"""v AS MATERIALIZED (
        SELECT vec_id,
          list_transform(embedding::DOUBLE[],
            x -> CAST(floor(x * 1000) AS BIGINT) + 1024) AS y
        FROM embeddings),
      c0 AS MATERIALIZED (SELECT vec_id AS cid, y AS cy FROM v WHERE vec_id % 100 = 0)"""
    val rounds = (1 to iters).map { i =>
      s"""a$i AS MATERIALIZED (
        SELECT vec_id, cid, y FROM (
          SELECT v.vec_id, c.cid, v.y,
            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              list_sum(list_transform(range(1, len(v.y) + 1),
                j -> (v.y[j] - c.cy[j]) * (v.y[j] - c.cy[j]))), c.cid) AS rn
          FROM v CROSS JOIN c${i - 1} c) WHERE rn = 1),
      m$i AS MATERIALIZED (
        SELECT cid, list(m ORDER BY i) AS cy FROM (
          SELECT a.cid, t.i, sum(a.y[t.i]) // count(*) AS m
          FROM a$i a CROSS JOIN range(1, ${dims + 1}) t(i)
          GROUP BY a.cid, t.i) GROUP BY cid),
      c$i AS MATERIALIZED (
        SELECT c.cid, COALESCE(m.cy, c.cy) AS cy
        FROM c${i - 1} c LEFT JOIN m$i m USING (cid))"""
    }
    (base +: rounds).mkString(",\n      ")
  }


  /** (name, spark impl, duckdb oracle SQL — None ⇒ rows-only check). */

  /** Per-JVM memo of the WordPiece piece sets per sfDir — the [[bpeModel8]]
    * discipline applied to the second tokenizer family: q264's streaming
    * serve consumes the sets as a SHIPPED MODEL (so the bench times the
    * serve, not a re-derivation per pass); q261, the derivation gate,
    * stays live and its oracle replays the derivation from scratch. */
  private val wpModelMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Set[String], Set[String])]()
  def wpModel(s: SparkSession, dir: String): (Set[String], Set[String]) =
    wpModelMemo.computeIfAbsent(dir, _ => {
      val v = ext.Wordpiece.vocab(T(s, dir, "documents"), "text", 4, 50)
        .select(col("side"), col("piece")).collect()
      (v.collect { case r if r.getString(0) == "init" => r.getString(1) }.toSet,
        v.collect { case r if r.getString(0) == "cont" => r.getString(1) }.toSet)
    })

  /** WordPiece derivation + greedy-apply replay CTEs, shared VERBATIM by
    * q261 (word-dict segmentation) and q264 (streaming rowwise serve):
    * the occurrence-weighted piece vocabulary (top-50 per side + all
    * singles, maxLen 4) and the longest-match recursion carrying the
    * piece list per word. Callers must open with WITH RECURSIVE; exposes
    * `w` (word, cnt) and `fin` (word, pieces — bare, '##' applied by the
    * caller's projection). */
  def wordpieceOracleCtesTagged(topK: Int, tag: String,
      textExpr: String = "text"): String = s"""
      w$tag AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_filter(string_split($textExpr, ' '), x -> x <> '')) AS word
          FROM documents WHERE text IS NOT NULL) GROUP BY word),
      ini$tag AS (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
          SELECT substr(word, 1, CAST(l.i AS INT)) AS piece, cnt
          FROM w$tag CROSS JOIN LATERAL (
            SELECT unnest(range(1, least(4, length(word)) + 1)) AS i) l)
        GROUP BY piece),
      con$tag AS (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
          SELECT substr(word, CAST(p.i AS INT), CAST(l.i AS INT)) AS piece, cnt
          FROM w$tag
          CROSS JOIN LATERAL (
            SELECT unnest(range(2, length(word) + 1)) AS i) p
          CROSS JOIN LATERAL (
            SELECT unnest(range(1, least(4, length(word) - p.i + 1) + 1)) AS i) l)
        GROUP BY piece),
      initv$tag AS (
        SELECT piece FROM (
          SELECT piece, row_number() OVER (ORDER BY c DESC, piece) AS rn
          FROM ini$tag WHERE length(piece) >= 2) WHERE rn <= $topK
        UNION
        SELECT piece FROM ini$tag WHERE length(piece) = 1),
      contv$tag AS (
        SELECT piece FROM (
          SELECT piece, row_number() OVER (ORDER BY c DESC, piece) AS rn
          FROM con$tag WHERE length(piece) >= 2) WHERE rn <= $topK
        UNION
        SELECT piece FROM con$tag WHERE length(piece) = 1),
      lens$tag AS (SELECT unnest(range(1, 5)) AS ll),
      tok$tag(word, pos, pieces) AS (
        SELECT word, CAST(1 AS BIGINT), CAST([] AS VARCHAR[]) FROM w$tag
        UNION ALL
        SELECT word, pos + bl, list_append(pieces, bp) FROM (
          SELECT t.word, t.pos, t.pieces, l.ll AS bl,
            substr(t.word, CAST(t.pos AS INT), CAST(l.ll AS INT)) AS bp,
            row_number() OVER (PARTITION BY t.word ORDER BY l.ll DESC) AS rn
          FROM tok$tag t CROSS JOIN lens$tag l
          WHERE t.pos <= length(t.word)
            AND l.ll <= length(t.word) - t.pos + 1
            AND ((t.pos = 1 AND substr(t.word, CAST(t.pos AS INT), CAST(l.ll AS INT))
                    IN (SELECT piece FROM initv$tag))
              OR (t.pos > 1 AND substr(t.word, CAST(t.pos AS INT), CAST(l.ll AS INT))
                    IN (SELECT piece FROM contv$tag))))
        WHERE rn = 1),
      fin$tag AS (SELECT word, pieces FROM tok$tag WHERE pos = length(word) + 1)"""

  /** The default-model instantiation (topK = 50, untagged names) shared
    * VERBATIM by q261 and q264. */
  val wordpieceOracleCtes: String = wordpieceOracleCtesTagged(50, "")

  /** Hybrid RRF retrieval replay — per-query BM25 (query terms = each
    * query doc's 4 most distinctive by exact tf·(N div df)), the exact
    * cosine vector arm, and the 1/(60+rank) fusion — shared VERBATIM by
    * q268 (batch) and q270 (the per-micro-batch streaming serve of the
    * SAME query set; per-query independence makes union-over-any-split ≡
    * one-shot). */
  val hybridRrfOracle: String = hybridRrfOracleFor("TRUE")

  /** [[hybridRrfOracle]] with the CORPUS restricted to documents whose id
    * satisfies `corpusPred` — written over the placeholder `__id__`,
    * substituted with `doc_id` on the postings side and `vec_id` on the
    * vector side (1:1 by fixture contract). The postings-deletion twin:
    * the query set (doc_id < 6) and its texts are untouched, only the
    * stored postings/vectors shrink, and every downstream df/idf/stats
    * value re-derives from the survivors exactly as
    * `removeFromHybridCorpus`'s subtraction algebra produces them.
    * `TRUE` reproduces the full oracle verbatim.
    * @param textExpr the corpus text expression (default the raw column) —
    *        the UPSERT twin substitutes the updated text here (q286), so
    *        the oracle prepares the POST-UPDATE corpus from scratch
    * @param vrankCtes replacement VECTOR-ARM CTE block (must define
    *        `vrank(q_id, n_id, rank_v)`, rank_v ≤ the arm's k) — the
    *        two-store composition (q287) swaps the exact-cosine arm for
    *        the residual-IVFADC chain here; null keeps the exact arm */
  def hybridRrfOracleFor(corpusPred: String,
      textExpr: String = "text",
      vrankCtes: String = null): String = s"""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split($textExpr, ' '), w -> w <> '')) AS t
        FROM documents WHERE text IS NOT NULL
          AND (${corpusPred.replace("__id__", "doc_id")})),
      dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
      stats AS (SELECT count(*)::BIGINT AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
      alldf AS (
        SELECT t, count(*)::BIGINT AS df
        FROM (SELECT DISTINCT doc_id, t FROM toks) GROUP BY 1),
      qterms AS (
        SELECT q_id, t FROM (
          SELECT q.doc_id AS q_id, q.t,
            row_number() OVER (PARTITION BY q.doc_id
              ORDER BY q.qtf * (n // df) DESC, q.t) AS rn
          FROM (SELECT doc_id, t, count(*)::BIGINT AS qtf FROM toks
                WHERE doc_id < 6 GROUP BY 1, 2) q
          JOIN alldf USING (t) CROSS JOIN stats) WHERE rn <= 4),
      tq AS (SELECT DISTINCT t FROM qterms),
      tf AS (
        SELECT doc_id, t, count(*)::BIGINT AS tfv
        FROM toks JOIN tq USING (t) GROUP BY 1, 2),
      lexs AS (
        SELECT q_id, n_id,
          list_sum(list_transform(
            list(struct_pack(t := t, s := s) ORDER BY t), x -> x.s)) AS score
        FROM (
          SELECT qt.q_id, tf.doc_id AS n_id, tf.t,
            (n // df)::DOUBLE * (tfv::DOUBLE * 2.25) /
              (tfv::DOUBLE + 1.25 * (0.25 + 0.75 *
                (dl::DOUBLE / (tot::DOUBLE / n::DOUBLE)))) AS s
          FROM tf JOIN qterms qt USING (t) JOIN alldf USING (t)
          JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
          WHERE tf.doc_id <> qt.q_id)
        GROUP BY 1, 2),
      lrank AS (
        SELECT q_id, n_id, rank_l FROM (
          SELECT q_id, n_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank_l
          FROM lexs) WHERE rank_l <= 10),
      ${if (vrankCtes != null) vrankCtes else s"""
      qv AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qvv FROM embeddings WHERE vec_id < 6),
      cv AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv FROM embeddings
             WHERE (${corpusPred.replace("__id__", "vec_id")})),
      vrank AS (
        SELECT q_id, n_id, rank_v FROM (
          SELECT q_id, n_id,
            row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank_v
          FROM (
            SELECT q_id, n_id,
              list_sum(list_transform(range(1, least(len(qvv), len(nv)) + 1), i -> qvv[i] * nv[i])) /
                (sqrt(list_sum(list_transform(range(1, len(qvv) + 1), i -> qvv[i] * qvv[i]))) *
                 sqrt(list_sum(list_transform(range(1, len(nv) + 1), i -> nv[i] * nv[i])))) AS sim
            FROM qv CROSS JOIN cv WHERE n_id <> q_id)) WHERE rank_v <= 10)"""},
      fused AS (
        SELECT coalesce(v.q_id, l.q_id) AS q_id, coalesce(v.n_id, l.n_id) AS n_id,
          coalesce(CAST(1 AS DOUBLE) / (60 + v.rank_v), CAST(0 AS DOUBLE)) +
          coalesce(CAST(1 AS DOUBLE) / (60 + l.rank_l), CAST(0 AS DOUBLE)) AS rrf,
          v.rank_v, l.rank_l
        FROM vrank v FULL OUTER JOIN lrank l
          ON v.q_id = l.q_id AND v.n_id = l.n_id)
      SELECT q_id, CAST(rn AS INT) AS rank, n_id, rrf,
        CAST(rank_v AS INT) AS rank_v, CAST(rank_l AS INT) AS rank_l
      FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, n_id) AS rn
            FROM fused)
      WHERE rn <= 5 ORDER BY q_id, rank"""

  /** The full RAG-pipeline replay — hybrid RRF fusion, the state-carrying
    * MMR recursion over the fused candidates, the 192-token budget fill —
    * shared VERBATIM by q269 (batch flagship) and q275 (the per-micro-batch
    * streaming serve of the same pipeline; every stage is per-query
    * independent, so union-over-any-split ≡ one-shot). */
  val ragPipelineOracle: String = """
      WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS t
        FROM documents WHERE text IS NOT NULL),
      dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
      stats AS (SELECT count(*)::BIGINT AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
      alldf AS (
        SELECT t, count(*)::BIGINT AS df
        FROM (SELECT DISTINCT doc_id, t FROM toks) GROUP BY 1),
      qterms AS (
        SELECT q_id, t FROM (
          SELECT q.doc_id AS q_id, q.t,
            row_number() OVER (PARTITION BY q.doc_id
              ORDER BY q.qtf * (n // df) DESC, q.t) AS rn
          FROM (SELECT doc_id, t, count(*)::BIGINT AS qtf FROM toks
                WHERE doc_id < 6 GROUP BY 1, 2) q
          JOIN alldf USING (t) CROSS JOIN stats) WHERE rn <= 4),
      tq AS (SELECT DISTINCT t FROM qterms),
      tf AS (
        SELECT doc_id, t, count(*)::BIGINT AS tfv
        FROM toks JOIN tq USING (t) GROUP BY 1, 2),
      lexs AS (
        SELECT q_id, n_id,
          list_sum(list_transform(
            list(struct_pack(t := t, s := s) ORDER BY t), x -> x.s)) AS score
        FROM (
          SELECT qt.q_id, tf.doc_id AS n_id, tf.t,
            (n // df)::DOUBLE * (tfv::DOUBLE * 2.25) /
              (tfv::DOUBLE + 1.25 * (0.25 + 0.75 *
                (dl::DOUBLE / (tot::DOUBLE / n::DOUBLE)))) AS s
          FROM tf JOIN qterms qt USING (t) JOIN alldf USING (t)
          JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
          WHERE tf.doc_id <> qt.q_id)
        GROUP BY 1, 2),
      lrank AS (
        SELECT q_id, n_id, rank_l FROM (
          SELECT q_id, n_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rank_l
          FROM lexs) WHERE rank_l <= 10),
      qv AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qvv FROM embeddings WHERE vec_id < 6),
      cv AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv FROM embeddings),
      vrank AS (
        SELECT q_id, n_id, rank_v FROM (
          SELECT q_id, n_id,
            row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank_v
          FROM (
            SELECT q_id, n_id,
              list_sum(list_transform(range(1, least(len(qvv), len(nv)) + 1), i -> qvv[i] * nv[i])) /
                (sqrt(list_sum(list_transform(range(1, len(qvv) + 1), i -> qvv[i] * qvv[i]))) *
                 sqrt(list_sum(list_transform(range(1, len(nv) + 1), i -> nv[i] * nv[i])))) AS sim
            FROM qv CROSS JOIN cv WHERE n_id <> q_id)) WHERE rank_v <= 10),
      fused AS (
        SELECT coalesce(v.q_id, l.q_id) AS q_id, coalesce(v.n_id, l.n_id) AS n_id,
          coalesce(CAST(1 AS DOUBLE) / (60 + v.rank_v), CAST(0 AS DOUBLE)) +
          coalesce(CAST(1 AS DOUBLE) / (60 + l.rank_l), CAST(0 AS DOUBLE)) AS rel
        FROM vrank v FULL OUTER JOIN lrank l
          ON v.q_id = l.q_id AND v.n_id = l.n_id),
      cvf AS (SELECT f.q_id, f.n_id, f.rel, c.nv FROM fused f JOIN cv c USING (n_id)),
      p AS (
        SELECT a.q_id, a.n_id AS ia, b.n_id AS ib,
          list_sum(list_transform(range(1, least(len(a.nv), len(b.nv)) + 1), i -> a.nv[i] * b.nv[i])) /
            (sqrt(list_sum(list_transform(range(1, len(a.nv) + 1), i -> a.nv[i] * a.nv[i]))) *
             sqrt(list_sum(list_transform(range(1, len(b.nv) + 1), i -> b.nv[i] * b.nv[i])))) AS s
        FROM cvf a JOIN cvf b ON a.q_id = b.q_id AND a.n_id < b.n_id),
      sel(q_id, step, sel_ids, n_id, score) AS (
        SELECT q_id, 1, [n_id], n_id, rel / 2 FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, n_id) AS rn
          FROM fused) WHERE rn = 1
        UNION ALL
        SELECT q_id, step, list_append(sel_ids, n_id), n_id, score FROM (
          SELECT x.*, row_number() OVER (PARTITION BY x.q_id ORDER BY x.score DESC, x.n_id) AS rn
          FROM (
            SELECT s.q_id, s.step + 1 AS step, s.sel_ids, c2.n_id,
              c2.rel / 2 - max(p.s) / 2 AS score
            FROM sel s
            JOIN fused c2 ON c2.q_id = s.q_id AND NOT list_contains(s.sel_ids, c2.n_id)
            JOIN p ON p.q_id = s.q_id
              AND ((p.ia = c2.n_id AND list_contains(s.sel_ids, p.ib))
                OR (p.ib = c2.n_id AND list_contains(s.sel_ids, p.ia)))
            WHERE s.step < 5
            GROUP BY s.q_id, s.step, s.sel_ids, c2.n_id, c2.rel) x) WHERE rn = 1),
      lens AS (
        SELECT doc_id, len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS n_tokens
        FROM documents WHERE text IS NOT NULL),
      packed AS (
        SELECT s.q_id, CAST(s.step AS INT) AS rank, l.doc_id, l.n_tokens, s.score,
          CAST(sum(l.n_tokens) OVER (PARTITION BY s.q_id ORDER BY s.step) AS BIGINT) AS cum_tokens
        FROM sel s JOIN lens l ON l.doc_id = s.n_id)
      SELECT q_id, rank, doc_id, n_tokens, cum_tokens, score
      FROM packed WHERE cum_tokens <= 192
      ORDER BY q_id, rank"""

  /** FFD bin-packing replay CTEs (q253/q254): whitespace-token doc lengths
    * (q243's length source), the exact (length desc, id asc) rank, groups
    * of `groupDocs` consecutive ranks, and a recursive CTE that advances
    * all groups in lockstep — iteration r places each group's rank-r doc
    * into the first bin with room (state = per-group bin-load list), the
    * exact first-fit-decreasing fold `Packing.ffdPack` runs per group.
    * Callers must open with WITH RECURSIVE. Exposes `g` (doc_id, n, grp,
    * rnk) and `fin` (grp, bins — 1-based bin index per rank). */
  def ffdOracleCtes(budget: Int, groupDocs: Int): String = s"""
      d AS (
        SELECT doc_id, len(list_filter(string_split(text,' '), w -> w <> ''))::BIGINT AS n
        FROM documents WHERE text IS NOT NULL),
      r AS (
        SELECT doc_id, n, row_number() OVER (ORDER BY n DESC, doc_id) AS rn
        FROM d WHERE n > 0),
      g AS (
        SELECT doc_id, n, CAST((rn-1)//$groupDocs AS BIGINT) AS grp,
               CAST((rn-1)%$groupDocs AS BIGINT) AS rnk FROM r),
      ffd(grp, step, loads, bins) AS (
        SELECT grp, CAST(-1 AS BIGINT), CAST([] AS BIGINT[]), CAST([] AS INT[])
        FROM (SELECT DISTINCT grp FROM g)
        UNION ALL
        SELECT grp, step,
          CASE WHEN fit IS NULL THEN list_append(loads, n)
               ELSE list_transform(range(1, len(loads)+1),
                      i -> CASE WHEN i = fit THEN loads[i] + n ELSE loads[i] END)
          END AS loads,
          list_append(bins, CAST(coalesce(fit, len(loads)+1) AS INT)) AS bins
        FROM (
          SELECT f.grp, f.step + 1 AS step, f.loads, f.bins, x.n,
            list_filter(range(1, len(f.loads)+1),
              i -> f.loads[i] + x.n <= $budget)[1] AS fit
          FROM ffd f JOIN g x ON x.grp = f.grp AND x.rnk = f.step + 1)),
      fin AS (
        SELECT grp, bins FROM (
          SELECT grp, bins, row_number() OVER (PARTITION BY grp ORDER BY step DESC) AS rr
          FROM ffd) WHERE rr = 1)"""

  /** The full residual-IVFADC serve replay — assignment, residual
    * codebooks (stride 50), codes, nprobe=2 probes, per-(query, probe)
    * LUTs, ADC, top-3 — over the WHOLE embeddings corpus with queries
    * vec_id < 8 at m=4×16. Shared VERBATIM by every gate whose serving
    * path must reproduce the same answers: q212 (one-shot build+serve),
    * q237 (persisted store + frozen-model increment) and q252 (streaming
    * serve of the persisted artifact).
    */
  val ivfAdcFullOracle: String = ivfAdcOracleFor("TRUE")

  /** [[ivfAdcFullOracle]] with the SERVE side restricted to index rows
    * satisfying `servePred` (over `a.n_id`) — the deletion twin: the
    * model (centroids, codebooks) still derives from the FULL corpus
    * (tombstoning vectors never refits an already-trained codebook), only
    * the index rows joined at scoring time shrink. `TRUE` reproduces the
    * full oracle verbatim. */
  def ivfAdcOracleFor(servePred: String): String = s"""
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
      ${ivfAdcBody(servePred)}"""

  /** [[ivfAdcFullOracle]]'s REFIT twin (q299, the model-refresh gate): the
    * WHOLE derivation chain — stride centroids, residual codebooks,
    * assignments, codes, probes, serve — re-derives over the POST-DRIFT
    * corpus (`updExpr` substituted where `updPred` holds, exactly
    * [[ivfAdcUpsertOracle]]'s substitution discipline), i.e. the
    * from-scratch index of the refreshed model that a drift-triggered
    * refit + full re-encode + generation swap must reproduce VERBATIM.
    * Contrast [[ivfAdcUpsertOracle]], where the model stays frozen on the
    * pre-update corpus: refresh is precisely the op that re-fits it. */
  def ivfAdcRefitOracle(updPred: String, updExpr: String): String = s"""
      WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
      v AS (SELECT vec_id,
        CASE WHEN $updPred THEN $updExpr ELSE vec END AS vec FROM v0),
      ${ivfAdcBody("TRUE")}"""

  /** The shared derivation chain over a corpus CTE named `v` — see
    * [[ivfAdcOracleFor]] (identity corpus) and [[ivfAdcRefitOracle]]
    * (post-drift corpus). */
  private def ivfAdcBody(servePred: String): String = s"""
      cent AS (SELECT vec_id AS lcid, vec AS l_vec FROM v WHERE vec_id % 100 = 0),
      ldist AS (
        SELECT a.vec_id AS n_id, c.lcid,
          list_sum(list_transform(range(1, least(len(a.vec), len(c.l_vec)) + 1), i ->
            (a.vec[i] - c.l_vec[i]) * (a.vec[i] - c.l_vec[i]))) AS d
        FROM v a CROSS JOIN cent c),
      assign AS (
        SELECT n_id, lcid FROM (
          SELECT *, row_number() OVER (PARTITION BY n_id ORDER BY d, lcid) AS rn
          FROM ldist) WHERE rn = 1),
      resid AS (
        SELECT a.n_id, a.lcid,
          list_transform(range(1, least(len(x.vec), len(c.l_vec)) + 1),
            i -> x.vec[i] - c.l_vec[i]) AS rv
        FROM assign a JOIN v x ON x.vec_id = a.n_id JOIN cent c ON c.lcid = a.lcid),
      subs AS (SELECT unnest(range(0, 4)) AS sub),
      cb AS (
        SELECT sub,
          CAST(row_number() OVER (PARTITION BY sub ORDER BY n_id) - 1 AS BIGINT) AS cid,
          rv[sub*16 + 1 : sub*16 + 16] AS c_vec
        FROM resid CROSS JOIN subs WHERE n_id % 50 = 0),
      cd AS (
        SELECT r.n_id, b.sub, b.cid,
          list_sum(list_transform(range(1, 17), i ->
            (r.rv[b.sub*16 + i] - b.c_vec[i]) * (r.rv[b.sub*16 + i] - b.c_vec[i]))) AS d2
        FROM resid r CROSS JOIN cb b),
      codes AS (
        SELECT n_id, list(cid ORDER BY sub) AS codes FROM (
          SELECT n_id, sub, cid,
            row_number() OVER (PARTITION BY n_id, sub ORDER BY d2, cid) AS rn
          FROM cd) WHERE rn = 1 GROUP BY n_id),
      probes AS (
        SELECT n_id AS q_id, lcid FROM (
          SELECT *, row_number() OVER (PARTITION BY n_id ORDER BY d, lcid) AS rn
          FROM ldist WHERE n_id < 8) WHERE rn <= 2),
      qres AS (
        SELECT p.q_id, p.lcid,
          list_transform(range(1, least(len(q.vec), len(c.l_vec)) + 1),
            i -> q.vec[i] - c.l_vec[i]) AS rv
        FROM probes p JOIN v q ON q.vec_id = p.q_id JOIN cent c ON c.lcid = p.lcid),
      ld AS (
        SELECT r.q_id, r.lcid, b.sub, b.cid,
          list_sum(list_transform(range(1, 17), i ->
            (r.rv[b.sub*16 + i] - b.c_vec[i]) * (r.rv[b.sub*16 + i] - b.c_vec[i]))) AS pd
        FROM qres r CROSS JOIN cb b),
      lut1 AS (SELECT q_id, lcid, sub, list(pd ORDER BY cid) AS lrow
               FROM ld GROUP BY q_id, lcid, sub),
      lut AS (SELECT q_id, lcid, list(lrow ORDER BY sub) AS lut
              FROM lut1 GROUP BY q_id, lcid),
      scored AS (
        SELECT l.q_id, a.n_id,
          list_sum(list_transform(range(0, 4), j -> l.lut[j+1][x.codes[j+1] + 1])) AS adist
        FROM lut l
        JOIN assign a ON a.lcid = l.lcid
        JOIN codes x ON x.n_id = a.n_id
        WHERE a.n_id <> l.q_id AND ($servePred)),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS INT) AS rank
        FROM scored)
      SELECT q_id, rank, n_id, adist FROM ranked WHERE rank <= 3
      ORDER BY q_id, rank"""

  /** [[ivfAdcFullOracle]]'s UPSERT twin (q294): the MODEL (centroids +
    * residual codebooks) still derives from the PRE-update corpus `v` —
    * updating vectors never refits an already-trained codebook — while
    * the INDEX and serve sides re-derive over the POST-update corpus
    * `cur`, where `updExpr` (over `vec`, guarded by `updPred` on
    * `vec_id`) substitutes the new vectors. The q286 textExpr discipline,
    * vector form: every assignment/code/score re-derives from the
    * substituted corpus under the frozen model, so a latest-wins
    * bookkeeping error anywhere in the re-encode+compaction path shifts
    * scores and fails the hash. Queries (vec_id < 8) must be disjoint
    * from `updPred` so both engines probe with identical query vectors. */
  def ivfAdcUpsertOracle(updPred: String, updExpr: String): String = s"""
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
      cur AS (SELECT vec_id,
        CASE WHEN $updPred THEN $updExpr ELSE vec END AS vec FROM v),
      cent AS (SELECT vec_id AS lcid, vec AS l_vec FROM v WHERE vec_id % 100 = 0),
      subs AS (SELECT unnest(range(0, 4)) AS sub),
      mldist AS (
        SELECT a.vec_id AS n_id, c.lcid,
          list_sum(list_transform(range(1, least(len(a.vec), len(c.l_vec)) + 1), i ->
            (a.vec[i] - c.l_vec[i]) * (a.vec[i] - c.l_vec[i]))) AS d
        FROM v a CROSS JOIN cent c),
      massign AS (
        SELECT n_id, lcid FROM (
          SELECT *, row_number() OVER (PARTITION BY n_id ORDER BY d, lcid) AS rn
          FROM mldist) WHERE rn = 1),
      mresid AS (
        SELECT a.n_id, a.lcid,
          list_transform(range(1, least(len(x.vec), len(c.l_vec)) + 1),
            i -> x.vec[i] - c.l_vec[i]) AS rv
        FROM massign a JOIN v x ON x.vec_id = a.n_id JOIN cent c ON c.lcid = a.lcid),
      cb AS (
        SELECT sub,
          CAST(row_number() OVER (PARTITION BY sub ORDER BY n_id) - 1 AS BIGINT) AS cid,
          rv[sub*16 + 1 : sub*16 + 16] AS c_vec
        FROM mresid CROSS JOIN subs WHERE n_id % 50 = 0),
      ldist AS (
        SELECT a.vec_id AS n_id, c.lcid,
          list_sum(list_transform(range(1, least(len(a.vec), len(c.l_vec)) + 1), i ->
            (a.vec[i] - c.l_vec[i]) * (a.vec[i] - c.l_vec[i]))) AS d
        FROM cur a CROSS JOIN cent c),
      assign AS (
        SELECT n_id, lcid FROM (
          SELECT *, row_number() OVER (PARTITION BY n_id ORDER BY d, lcid) AS rn
          FROM ldist) WHERE rn = 1),
      resid AS (
        SELECT a.n_id, a.lcid,
          list_transform(range(1, least(len(x.vec), len(c.l_vec)) + 1),
            i -> x.vec[i] - c.l_vec[i]) AS rv
        FROM assign a JOIN cur x ON x.vec_id = a.n_id JOIN cent c ON c.lcid = a.lcid),
      cd AS (
        SELECT r.n_id, b.sub, b.cid,
          list_sum(list_transform(range(1, 17), i ->
            (r.rv[b.sub*16 + i] - b.c_vec[i]) * (r.rv[b.sub*16 + i] - b.c_vec[i]))) AS d2
        FROM resid r CROSS JOIN cb b),
      codes AS (
        SELECT n_id, list(cid ORDER BY sub) AS codes FROM (
          SELECT n_id, sub, cid,
            row_number() OVER (PARTITION BY n_id, sub ORDER BY d2, cid) AS rn
          FROM cd) WHERE rn = 1 GROUP BY n_id),
      probes AS (
        SELECT n_id AS q_id, lcid FROM (
          SELECT *, row_number() OVER (PARTITION BY n_id ORDER BY d, lcid) AS rn
          FROM ldist WHERE n_id < 8) WHERE rn <= 2),
      qres AS (
        SELECT p.q_id, p.lcid,
          list_transform(range(1, least(len(q.vec), len(c.l_vec)) + 1),
            i -> q.vec[i] - c.l_vec[i]) AS rv
        FROM probes p JOIN cur q ON q.vec_id = p.q_id JOIN cent c ON c.lcid = p.lcid),
      ld AS (
        SELECT r.q_id, r.lcid, b.sub, b.cid,
          list_sum(list_transform(range(1, 17), i ->
            (r.rv[b.sub*16 + i] - b.c_vec[i]) * (r.rv[b.sub*16 + i] - b.c_vec[i]))) AS pd
        FROM qres r CROSS JOIN cb b),
      lut1 AS (SELECT q_id, lcid, sub, list(pd ORDER BY cid) AS lrow
               FROM ld GROUP BY q_id, lcid, sub),
      lut AS (SELECT q_id, lcid, list(lrow ORDER BY sub) AS lut
              FROM lut1 GROUP BY q_id, lcid),
      scored AS (
        SELECT l.q_id, a.n_id,
          list_sum(list_transform(range(0, 4), j -> l.lut[j+1][x.codes[j+1] + 1])) AS adist
        FROM lut l
        JOIN assign a ON a.lcid = l.lcid
        JOIN codes x ON x.n_id = a.n_id
        WHERE a.n_id <> l.q_id),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS INT) AS rank
        FROM scored)
      SELECT q_id, rank, n_id, adist FROM ranked WHERE rank <= 3
      ORDER BY q_id, rank"""


  /** The exact per-dimension drift replay (quantized BIGINT sums over the
    * %2 base/delta snapshot split of the embeddings corpus) — shared
    * VERBATIM by q201 (batch) and q257 (the same gauge maintained as a
    * complete-mode STREAMING aggregation over the delta side). */
  val perDimDriftOracle: String = """
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
      e AS (
        SELECT (vec_id % 2 = 0) AS is_base, t.i AS dim,
          CAST(floor(vec[CAST(t.i AS INT)] * 1000) AS BIGINT) AS q
        FROM v CROSS JOIN range(1, 65) t(i)),
      agg AS (
        SELECT dim,
          count(*) FILTER (WHERE is_base) AS n_base,
          count(*) FILTER (WHERE NOT is_base) AS n_delta,
          CAST(sum(q) FILTER (WHERE is_base) AS BIGINT) AS sum_base,
          CAST(sum(q) FILTER (WHERE NOT is_base) AS BIGINT) AS sum_delta
        FROM e GROUP BY 1)
      SELECT CAST(dim AS INT) AS dim, n_base, n_delta, sum_base, sum_delta,
        CAST(sum_base AS DOUBLE) / n_base -
          CAST(sum_delta AS DOUBLE) / n_delta AS shift_milli
      FROM agg ORDER BY dim"""

}
