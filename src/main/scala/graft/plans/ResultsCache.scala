package graft.plans

import java.nio.file.Files
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import scala.util.Try

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Query results cache — the Hive 3 `hive.query.results.cache` analogue
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/cache/results/
  * QueryResultsCache.java]: a repeated identical query is answered from
  * its previously materialized result instead of re-executing, with the
  * same two validity rules Hive applies:
  *
  *   - semantic identity: the key is the CANONICALIZED analyzed plan, so
  *     alias renames / column reorders that normalize identically share
  *     one entry, while any semantic change misses;
  *   - staleness: every source table's file listing (path, length,
  *     mtime) is fingerprinted at fill time; a mutated input invalidates
  *     the entry (Hive checks transactional write ids — the filesystem
  *     fingerprint is this repo's snapshot analogue, same as
  *     [[MaterializedViewRewrite]]).
  *
  * Non-deterministic plans (rand(), current_timestamp, ...) are never
  * cached, matching Hive's eligibility rule. Results are materialized as
  * parquet (spilled to disk, re-read through the vectorized scan), so a
  * hit costs one small scan and ZERO recomputation — at 100 TB this is
  * the difference between a dashboard refresh re-running a fact scan and
  * reading back kilobytes.
  */
object ResultsCache {

  /** The stored canonicalized plan is the REAL key: the semanticHash map
    * key only routes to a bucket, and a hit is confirmed with
    * `sameResult` on the full plan tree. Keying on a rendered string was
    * wrong (ADVICE r6): plan toString truncates node fields at
    * spark.sql.debug.maxToStringFields (default 25), so two projections
    * differing only past the 25th field rendered identically and the
    * second query was served the first one's result.
    *
    * Each 32-bit hash bucket holds a LIST of entries (ADVICE r7): two
    * semantically different plans that collide on semanticHash coexist
    * instead of evicting each other on every fill. Total entries are
    * LRU-bounded (the `hive.query.results.cache.max.size` analogue, conf
    * below) so a long-lived session cannot grow plan trees without
    * bound. Evicted entries only drop the in-memory plan + path; the
    * parquet dir stays on disk until the JVM shutdown hook because a
    * previously returned (lazy) DataFrame may still read it. */
  private case class Entry(plan: LogicalPlan, sourcesFp: String, path: String) {
    @volatile var lastAccess: Long = 0L
  }
  private val cache = new ConcurrentHashMap[Int, List[Entry]]()
  private val tick = new java.util.concurrent.atomic.AtomicLong()

  /** Session conf knob for the LRU bound; Hive's equivalent is byte-sized
    * (hive.query.results.cache.max.size) — entry-count is the analogue
    * that makes sense for a plan+path registry. */
  val MaxEntriesConf = "spark.graft.resultsCache.maxEntries"
  private val DefaultMaxEntries = 64

  /** Observability for tests: did the last run() hit the cache? */
  @volatile private var lastWasHit = false
  def lastHit: Boolean = lastWasHit

  def clear(): Unit = cache.clear()

  /** Expressions that Catalyst marks deterministic but that are pinned
    * per-query (ComputeCurrentTime) and so must never be served from a
    * prior query's materialization — Hive's QueryResultsCache applies the
    * same eligibility rule (ADVICE r6). Matched by class name to cover
    * the whole current_* family without importing each node. */
  private val ContextDependent = Set(
    "CurrentTimestamp", "CurrentDate", "Now", "LocalTimestamp",
    "CurrentTimeZone", "CurrentDatabase", "CurrentCatalog", "CurrentUser")

  /** All plan nodes including those inside scalar/IN/EXISTS subqueries.
    * The outer-only walks were a blind spot (ADVICE r7): current_date()
    * inside a subquery passed the eligibility gate, and a file source
    * referenced only in a subquery was missing from the staleness
    * fingerprint. */
  private def allNodes(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collectWithSubqueries { case p => p }

  private def contextDependent(plan: LogicalPlan): Boolean =
    allNodes(plan).exists(_.expressions.exists(_.exists(e =>
      ContextDependent.contains(e.getClass.getSimpleName))))

  /** Run df through the cache: answer from a valid prior materialization
    * when the canonical plan + source fingerprints match; otherwise
    * execute, materialize, and fill. Uncacheable frames (no file
    * sources, non-deterministic or context-dependent expressions, or
    * unreadable source listings) pass through untouched. */
  def run(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    val roots = scanRoots(analyzed)
    val deterministic =
      allNodes(analyzed).forall(_.expressions.forall(_.deterministic))
    if (roots.isEmpty || !deterministic || contextDependent(analyzed)) {
      lastWasHit = false; return df
    }
    // fail closed (ADVICE r6): an unlistable source means staleness
    // cannot be judged — bypass the cache entirely (neither serve nor
    // fill) rather than validate against a constant error sentinel.
    val fps = roots.sorted.map(fingerprint)
    if (fps.exists(_.isEmpty)) { lastWasHit = false; return df }
    val fp = fps.map(_.get).mkString("|")
    val canonical = analyzed.canonicalized
    val key = canonical.semanticHash()
    cache.getOrDefault(key, Nil)
      .find(e => e.plan.sameResult(canonical) && e.sourcesFp == fp) match {
      case Some(e) =>
        e.lastAccess = tick.incrementAndGet()
        lastWasHit = true
        spark.read.parquet(e.path)
      case None =>
        lastWasHit = false
        val out = tmpDir()
        df.write.mode("overwrite").parquet(out)
        val entry = Entry(canonical, fp, out)
        entry.lastAccess = tick.incrementAndGet()
        val maxEntries = Try(
          spark.conf.get(MaxEntriesConf).toInt).getOrElse(DefaultMaxEntries)
        fill(key, entry, maxEntries)
        spark.read.parquet(out)
    }
  }

  /** Insert under the global LRU bound. A same-plan entry in the bucket
    * (typically a stale fingerprint being refreshed) is replaced in
    * place so a hot query refilled after every source mutation holds one
    * slot, not a trail of dead ones. */
  private def fill(key: Int, entry: Entry, maxEntries: Int): Unit =
    cache.synchronized {
      val bucket = cache.getOrDefault(key, Nil)
        .filterNot(_.plan.sameResult(entry.plan))
      cache.put(key, entry :: bucket)
      var total = 0
      cache.forEach((_, es) => total += es.size)
      while (total > math.max(1, maxEntries)) {
        var lruKey = 0
        var lru: Entry = null
        cache.forEach { (k, es) =>
          es.foreach { e =>
            if (lru == null || e.lastAccess < lru.lastAccess) {
              lru = e; lruKey = k
            }
          }
        }
        val rest = cache.get(lruKey).filterNot(_ eq lru)
        if (rest.isEmpty) cache.remove(lruKey) else cache.put(lruKey, rest)
        total -= 1
      }
    }

  private def scanRoots(plan: LogicalPlan): Seq[String] =
    allNodes(plan).flatMap {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        h.location.rootPaths.map(_.toString)
      case _ => Nil
    }

  private def md5(s: String): String = {
    val md = MessageDigest.getInstance("MD5")
    md.update(s.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Same listing fingerprint as MaterializedViewRewrite: any file
    * add/remove/resize/touch under a source root invalidates. None on
    * any listing failure — the caller must treat that as uncacheable
    * (a constant failure sentinel would compare equal to a previous
    * failure and serve a possibly-stale entry). */
  private def fingerprint(path: String): Option[String] = Try {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      entries +=
        s"${f.getPath.toUri.getPath}:${f.getLen}:${f.getModificationTime}"
    }
    md5(entries.sorted.mkString("\n"))
  }.toOption

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft_qcache").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(d)
    }))
    new java.io.File(d, "result").getAbsolutePath
  }
}
