package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders over the driver corpus (TESTDATA.md).
  *
  * Stand-in for the reference's two sources: the Kafka tick stream
  * (reference `stream_consumer.py:89-93`) and the MySQL raw-tick table
  * (reference `batch_processor.py:72-79`). In the sandbox both are parquet;
  * the schemas are fixed (FIXTURES.md §B) so scans stay prunable —
  * column projection and predicate pushdown reach the parquet reader.
  */
object Tables {

  /** LOGICAL-PLAN memo for the table loaders. `spark.read.parquet` is not
    * free on the driver: every call re-lists the path and re-reads parquet
    * footers for the schema (~40-50 ms measured via tools/Profile at
    * sf0.1), and the 217-query bench calls the loaders 300+ times — ~15 s
    * of pure duplicated driver work per iteration. A DataFrame is an
    * immutable logical plan, so handing the SAME plan object to every
    * query is semantically identical to re-reading; each query still
    * plans/prunes/executes its own tree on top. Nothing row-level is
    * cached — this is driver metadata reuse, which a long-lived production
    * session gets for free from its catalog, and is scale-neutral (at
    * 100 TB the listing is *more* expensive, so reusing it matters more).
    *
    * Keying: (sessionUUID, path, content fingerprint). The session key
    * keeps plans from leaking across the many short-lived test sessions
    * (a Dataset is bound to the session that built it); the fingerprint
    * ([[tableFingerprint]] — per-file sizes+mtimes, not the directory
    * mtime) makes ANY rewrite of a generated fixture invalidate the
    * entry, including an in-place part-file rewrite that leaves the
    * directory's own mtime untouched (the file-listing snapshot inside
    * the plan would otherwise go stale).
    * Bounded LRU so dead sessions' entries age out. */
  private val planCache =
    new java.util.LinkedHashMap[(String, String, Long), DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Long), DataFrame]): Boolean =
        size > 64
    }

  /** Per-session tag via the session-scoped SQLConf (public API; each
    * SparkSession carries its own conf even under a shared context).
    * Used to key session-bound cached DataFrames — a Dataset handed
    * across sessions (or out of a stopped one) is a runtime error. */
  private[graft] def sessionTag(spark: SparkSession): String =
    spark.conf.getOption("graft.session.tag").getOrElse {
      val t = java.util.UUID.randomUUID().toString
      spark.conf.set("graft.session.tag", t); t
    }

  /** Content fingerprint of one parquet table directory: a fold of
    * (path, size, mtime) over every regular file under it, in sorted
    * path order. This — not the directory's own mtime — is the
    * freshness key for every cached plan/count/artifact: an in-place
    * part-file rewrite (same file names, so the directory entry set and
    * its mtime are unchanged) still moves the file's size or mtime, so
    * the fingerprint moves and the stale cache entry is unreachable.
    * Same discipline as Similarity.cachedCount's inputFiles hash.
    * Listing a table dir is tens of entries (hundreds at the generated
    * scale fixtures) — microseconds against the queries it keys.
    *
    * IO-FAULT posture: a file vanishing mid-walk (the concurrent
    * in-place rewrite this fingerprint exists to catch) or any other
    * stat/walk failure must DEGRADE, not propagate — the callers are
    * load()/rowCount()/artifact(), none of which should fail because a
    * freshness probe hiccuped. Per-file stat errors skip that file;
    * anything else returns an always-fresh sentinel (monotonic, never
    * equal to a real hash of this fold nor to a prior sentinel), so the
    * caches MISS and rebuild rather than serve a stale entry — the
    * conservative direction for a freshness key. */
  private[graft] def tableFingerprint(path: String): Long =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) return -1L
      var h = 1125899906842597L
      def mix(x: Long): Unit = h = h * 31 + x
      val st = java.nio.file.Files.walk(p)
      try {
        val it = st.sorted().iterator()
        while (it.hasNext) {
          val f = it.next()
          try {
            if (java.nio.file.Files.isRegularFile(f)) {
              mix(f.toString.hashCode.toLong)
              mix(java.nio.file.Files.size(f))
              mix(java.nio.file.Files.getLastModifiedTime(f).toMillis)
            }
          } catch {
            // vanished between walk and stat: the rewrite itself moves
            // sibling mtimes, so skipping the ghost still changes the fold
            case scala.util.control.NonFatal(_) => ()
          }
        }
      } finally st.close()
      h
    } catch {
      case scala.util.control.NonFatal(_) =>
        // walk itself failed (UncheckedIOException, InvalidPathException
        // on non-path tags, …): unique negative sentinel = forced miss
        -math.abs(freshSentinel.incrementAndGet())
    }

  private val freshSentinel =
    new java.util.concurrent.atomic.AtomicLong(System.nanoTime())

  /** Session + freshness prefix for a cached Dataset derived from the
    * named tables of corpus `d`: a Dataset is bound to the session that
    * built it (handing it to a second session in the same JVM fails at
    * runtime), and serving one built from a since-rewritten fixture
    * would silently verify nothing — both dimensions key every entry. */
  private[graft] def artifactTag(s: SparkSession, d: String, tables: Seq[String]): String =
    sessionTag(s) + "|" + d + "|" +
      tables.map(t => tableFingerprint(s"$d/$t.parquet")).mkString(",")

  /** One shared memo for every per-corpus checkpointed artifact (dedup
    * pair index, shingle arrays, window arrays, frozen PSI bins, check
    * verdicts, …). Callers declare WHICH tables the artifact reads, so
    * the key carries (session, per-table content fingerprint, params).
    *
    * Deliberately lock-free around `build` (get → build → putIfAbsent):
    * artifacts nest (a verdict builds on the truth index which builds on
    * the corpus scan), and nesting inside one map's computeIfAbsent is a
    * documented ConcurrentHashMap hazard. A racing duplicate build is
    * benign — every artifact is a deterministic function of the
    * fingerprinted inputs, so first-put-wins returns an equal value.
    * Bounded: one arbitrary entry evicted past 192 (dead sessions' and
    * stale fingerprints' checkpoints age out; rebuilding after eviction
    * is correct, just one extra build). */
  private val artifactCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Any), AnyRef]()

  /** Test hook: simulate a fresh JVM (cold in-memory caches) so the
    * disk-sidecar path of [[corpusValue]] can be exercised in-process. */
  private[graft] def clearMemoryArtifactsForTest(): Unit = artifactCache.clear()

  /** Non-building lookup into the artifact memo: Some only when the
    * keyed artifact is ALREADY materialized for this (session, corpus
    * fingerprint). Lets a derived artifact choose the cheaper of two
    * equivalent builds — e.g. the hashed-shingle table projects off an
    * already-checkpointed string-shingle table instead of re-running
    * the corpus tokenize+shingle pass, but only when that (much larger)
    * artifact exists anyway; peeking never forces it into existence. */
  private[graft] def artifactPeek[T <: AnyRef](s: SparkSession, d: String,
      tables: Seq[String], key: Any): Option[T] =
    Option(artifactCache.get((artifactTag(s, d, tables), key): (String, Any)))
      .map(_.asInstanceOf[T])

  private[graft] def artifact[T <: AnyRef](s: SparkSession, d: String,
      tables: Seq[String], key: Any)(build: => T): T = {
    val k = (artifactTag(s, d, tables), key)
    val hit = artifactCache.get(k)
    if (hit != null) return hit.asInstanceOf[T]
    val v = build
    if (artifactCache.size > 192) {
      val it = artifactCache.keySet().iterator()
      if (it.hasNext) { it.next(); it.remove() }
    }
    val prev = artifactCache.putIfAbsent(k, v.asInstanceOf[AnyRef])
    if (prev != null) prev.asInstanceOf[T] else v
  }

  /** Like [[artifact]] for plain driver-side values (trained centroids,
    * PQ codebooks, counts) — freshness-keyed but session-free, since a
    * value is not bound to the session that computed it.
    *
    * ALSO DISK-PERSISTED, per (corpus, per-table content fingerprint,
    * key, format version), under [[artifactRoot]] — the production
    * shape: an index model (coarse quantizer, PQ codebook) is trained
    * once per corpus SNAPSHOT and shipped as a sidecar next to the
    * data, not retrained by every JVM that opens the table. Locally
    * this is what takes the gen-scale classifier's cold run from
    * k-means+PQ-training-dominated to scan-dominated — measured at 2M
    * vectors in SCALING.md round 14: a fresh-store cold JVM pays
    * 70.0 s (training + sidecar publish), a sidecar-reading cold JVM
    * 31.3 s against a 25.4 s warm leg (1.23x, meeting the r12
    * cold ≤ 2x warm criterion). Freshness is the same fingerprint
    * discipline as every
    * cache here: an in-place part-file rewrite moves the fingerprint,
    * which moves the sidecar FILE NAME, so a stale sidecar is simply
    * never opened (and ages out with tmp). All IO is best-effort —
    * any read/write/deserialize failure degrades to an in-memory
    * rebuild, never to an error or a stale value. */
  private[graft] def corpusValue[T <: AnyRef](d: String,
      tables: Seq[String], key: Any)(build: => T): T = {
    val fp = tables.map(t => tableFingerprint(s"$d/$t.parquet")).mkString(",")
    val k = (s"$d|$fp", key)
    val hit = artifactCache.get(k)
    if (hit != null) return hit.asInstanceOf[T]
    val fromDisk = diskRead[T](d, fp, key)
    val v = fromDisk.getOrElse(build)
    if (fromDisk.isEmpty) diskWrite(d, fp, key, v)
    if (artifactCache.size > 192) {
      val it = artifactCache.keySet().iterator()
      if (it.hasNext) { it.next(); it.remove() }
    }
    val prev = artifactCache.putIfAbsent(k, v.asInstanceOf[AnyRef])
    if (prev != null) prev.asInstanceOf[T] else v
  }

  /** Like [[artifact]] for DataFrame-shaped per-corpus artifacts (pair
    * indexes, truth sets, check verdicts, PQ code tables): the same
    * in-memory memo per session, PLUS a PARQUET SIDECAR under
    * [[artifactRoot]] keyed by the same content fingerprint — a cold
    * JVM READS the artifact instead of rebuilding it. Before this, the
    * Dataset-shaped artifacts localCheckpointed per JVM, so every cold
    * bench leg re-paid each truth-index scan, pair-index shuffle, and
    * verdict intersect job; the sidecar is the production shape (an
    * index table ships with the corpus snapshot, it is not re-derived
    * by every reader).
    *
    * Atomic publish: Spark writes to a unique temp sibling directory,
    * then ONE rename moves it into place — concurrent builders race
    * benignly (deterministic inputs ⇒ equal contents; first move wins,
    * the loser keeps its in-JVM copy). All IO is best-effort: any
    * read/write failure degrades to the in-JVM checkpointed build,
    * never to an error or a stale value. Freshness is content-
    * addressed like [[corpusValue]]: a rewritten input table moves the
    * fingerprint, which moves the sidecar DIRECTORY NAME.
    *
    * Contract for callers: row ORDER is not preserved across the
    * parquet round trip (consumers must join/aggregate/sort
    * downstream — every registered consumer does), the build must NOT
    * localCheckpoint (dfArtifact materializes either way), and the
    * schema must be parquet-representable (no void/interval columns). */
  /** Run-level observability for the sidecar lifecycle (r15 ADVICE):
    * how many dfArtifact resolutions were served from an on-disk
    * sidecar vs built fresh this JVM. Bench emits both counts into its
    * summary JSON so a "cold" total is self-describing — a cold run
    * whose disk-hit count is nonzero rode pre-built sidecars under
    * [[artifactRoot]] and silently omits those build costs. */
  private[graft] val artifactDiskHits = new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val artifactBuilds   = new java.util.concurrent.atomic.AtomicLong(0)

  /** The on-disk directory a [[dfArtifact]] with this (corpus, tables,
    * key) publishes to — the address a snapshot MANIFEST records, so a
    * reader can bind a specific artifact GENERATION by path instead of
    * re-deriving "latest" (the Iceberg manifest-entry shape). Pure
    * function of the same content fingerprint as [[dfArtifact]]; no IO. */
  private[graft] def dfArtifactDir(d: String, tables: Seq[String],
      key: Any): String = {
    val fp = tables.map(t => tableFingerprint(s"$d/$t.parquet")).mkString(",")
    diskPath(d, fp, s"df:$key").toString + ".parquet"
  }

  private[graft] def dfArtifact(s: SparkSession, d: String,
      tables: Seq[String], key: Any)(build: => DataFrame): DataFrame =
    artifact(s, d, tables, key) {
      val fp = tables.map(t => tableFingerprint(s"$d/$t.parquet")).mkString(",")
      val dir = diskPath(d, fp, s"df:$key").toString + ".parquet"
      val done = java.nio.file.Paths.get(dir, "_SUCCESS")
      val fromDisk =
        try {
          if (!java.nio.file.Files.isRegularFile(done)) None
          else {
            val df = s.read.parquet(dir)
            df.schema // force footer/schema resolution now, fail early
            artifactDiskHits.incrementAndGet()
            Some(df)
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      fromDisk.getOrElse {
        artifactBuilds.incrementAndGet()
        val built = build.localCheckpoint(true)
        try {
          val tmpDir = dir + "." + java.util.UUID.randomUUID() + ".tmp"
          built.write.parquet(tmpDir)
          try java.nio.file.Files.move(
            java.nio.file.Paths.get(tmpDir), java.nio.file.Paths.get(dir),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case scala.util.control.NonFatal(_) =>
            // another JVM published first, or the rename failed: keep
            // the in-JVM checkpoint, drop the orphaned temp dir
            deleteDirBestEffort(java.nio.file.Paths.get(tmpDir))
          }
        } catch { case scala.util.control.NonFatal(_) => () }
        built
      }
    }

  private def deleteDirBestEffort(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch {
            case scala.util.control.NonFatal(_) => () })
      else java.nio.file.Files.deleteIfExists(p)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Bump when the serialized shape OR the producing algorithm of any
    * disk-persisted corpus value changes — old sidecars must become
    * unreachable, not deserialized into a shape the new code misreads. */
  private val ArtifactFormatVersion = 1

  /** Sidecar root for cross-JVM corpus artifacts. Overridable so tests
    * (and deployments whose tmp is small) can point it elsewhere; the
    * corpus dirs themselves are read-only, so the sidecar cannot live
    * beside the data here — at 100 TB it would be a path in the same
    * object store as the table, keyed by the snapshot id. */
  private[graft] def artifactRoot: java.nio.file.Path =
    java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_DIR",
      sys.props("java.io.tmpdir") + "/graft_artifacts"))

  /** Content-addressed sidecar path: the fingerprint (and key, and
    * format version) is IN the name, so freshness needs no
    * invalidation protocol — a rewrite changes the name. */
  private def diskPath(d: String, fp: String, key: Any): java.nio.file.Path = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val bytes = md.digest(
      s"v$ArtifactFormatVersion|$d|$fp|$key".getBytes("UTF-8"))
    artifactRoot.resolve(
      bytes.take(16).map(b => f"$b%02x").mkString + ".bin")
  }

  private def diskRead[T](d: String, fp: String, key: Any): Option[T] =
    try {
      val p = diskPath(d, fp, key)
      if (!java.nio.file.Files.isRegularFile(p)) None
      else {
        val in = new java.io.ObjectInputStream(new java.io.BufferedInputStream(
          java.nio.file.Files.newInputStream(p)))
        try Some(in.readObject().asInstanceOf[T]) finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Atomic publish: serialize to a unique temp sibling, then move into
    * place — concurrent JVMs building the same artifact race benignly
    * (deterministic inputs ⇒ equal values; last move wins). */
  private def diskWrite(d: String, fp: String, key: Any, v: AnyRef): Unit =
    try {
      val p = diskPath(d, fp, key)
      java.nio.file.Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(
        p.getFileName.toString + "." + java.util.UUID.randomUUID() + ".tmp")
      val out = new java.io.ObjectOutputStream(new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(tmp)))
      try out.writeObject(v) finally out.close()
      try java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch { case scala.util.control.NonFatal(_) =>
        java.nio.file.Files.deleteIfExists(tmp); () }
    } catch { case scala.util.control.NonFatal(_) => () }

  private def cached(spark: SparkSession, path: String, variant: String = "")(
      build: => DataFrame): DataFrame = {
    val fp = tableFingerprint(path)
    val tag = sessionTag(spark)
    val key = (tag, path + variant, fp)
    planCache.synchronized {
      val hit = planCache.get(key)
      if (hit != null) hit
      else { val df = build; planCache.put(key, df); df }
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val p = s"$sfDir/$name.parquet"
    cached(spark, p)(spark.read.parquet(p))
  }

  /** Memoized table row count per (path, content fingerprint) —
    * size-regime gates (artifact materialization, exact-vs-blocked
    * routing) and samplers consult the corpus size repeatedly; the count
    * itself is one metadata-cheap scan and, unlike a DataFrame, is not
    * bound to the session that computed it. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()

  def rowCount(s: SparkSession, d: String, name: String): Long = {
    val p = s"$d/$name.parquet"
    countCache.computeIfAbsent((p, tableFingerprint(p)),
      _ => java.lang.Long.valueOf(load(s, d, name).count())).longValue()
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  /** events.ts loader, SCHEMA-ADAPTIVE over the physical encodings a sane
    * fixture generator may emit. The tick timestamp is semantically just a
    * timestamp column (reference `stream_consumer.py:82-87` declares
    * TimestampType); the engine must not care how parquet stores it:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it by default;
    *    with the legacy conf it arrives as a raw nanos LongType → truncate
    *    nanos → micros, exactly like DuckDB does on its side of the oracle
    *    compare, so both engines see identical microsecond values.
    *  - parquet timestamp[us] (isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ → cast to TimestampType. The session timezone is
    *    pinned UTC everywhere (Verify/Bench/specs), so the cast is
    *    value-stable and downstream window/date_trunc code and DuckDB
    *    hashes are unchanged.
    *  - parquet timestamp[us/ms] adjusted to UTC: already TimestampType.
    *
    * Anything else (string, int32 days, …) fails loudly with the observed
    * dtype rather than producing silently-wrong timestamps. */
  def events(s: SparkSession, d: String): DataFrame =
    cached(s, s"$d/events.parquet", variant = "#normalized") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$d/events.parquet")
      normalizeTs(raw)
    }

  /** ts-dtype branch shared by the batch loader and the stream prestage. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>            // raw nanos (legacy TIMESTAMP(NANOS) read)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>    // timestamp[us], not UTC-adjusted
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df    // already what downstream expects
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported dtype $other — expected parquet " +
          "TIMESTAMP(NANOS) (read as raw long), timestamp[us] (NTZ), or a " +
          "UTC-adjusted timestamp; extend Tables.normalizeTs for new encodings")
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Tick schema, identical to the reference's declared stream schema
    * (`stream_consumer.py:82-87`). */
  val tickSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("timestamp", TimestampType),
    StructField("price", DoubleType),
    StructField("volume", LongType)))

  /** NORMALIZED events schema — what every consumer downstream of
    * [[events]] / the stream prestage sees, independent of the fixture's
    * physical ts encoding. Streaming file sources require an explicit
    * schema; the prestage writes its staged files with ts already
    * normalized to TimestampType ([[normalizeTs]] at write time), so
    * stream reads declare this schema directly and need no per-stream
    * fix-up. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
