package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod, when}

/** Versioned keyed snapshot on plain parquet: the minimal table-format
  * core (hash-bucketed versioned data dirs + an append-only commit log)
  * that makes a continuously-upserted lake table safe without a
  * heavyweight format.
  *
  * Layout:
  * {{{
  *   dir/v00000007/_bucket=3/   parquet for bucket 3, rewritten at v7
  *   dir/v00000007/_manifest    bucket -> owning version, written pre-marker
  *   dir/_commits/v00000007     empty marker, created AFTER data + manifest
  * }}}
  *
  * Rows are hash-partitioned on the key into a fixed number of buckets
  * (`spark.graft.snapshot.buckets`, pinned at first commit). A version
  * rewrites ONLY the buckets its delta touches — upsert IO is
  * O(delta + touched buckets), not O(table), which is what makes
  * continuous CDC viable on a 100 TB snapshot. Untouched buckets keep
  * serving from the older version dir that last wrote them; the
  * per-version `_manifest` records, for every bucket, which version dir
  * holds its current rows, and readers union exactly those leaf dirs.
  *
  * Crash safety is unchanged from the unbucketed design: readers
  * resolve max(committed version) from the EMPTY create-once markers,
  * so a writer crashing mid-data or mid-manifest leaves an orphan dir
  * that is never visible — no mutable pointer file, no rename anywhere
  * (S3A-safe), and markers stay content-free so a torn marker write
  * cannot corrupt head resolution. A RETRIED version commit (same
  * version number, e.g. a replayed foreachBatch) short-circuits on the
  * existing marker, which is what turns streaming's at-least-once batch
  * delivery into an exactly-once snapshot.
  *
  * Sizing: a bucket's data is table_size / numBuckets and each touched
  * bucket is rewritten by one task, so pick the bucket count so that
  * quotient is a sane task size (the knob is per-table, pinned in the
  * first version's manifest; re-bucketing is a full rewrite by design).
  *
  * Concurrent writers (optimistic concurrency): a writer CLAIMS its
  * version before touching any data — an empty create-once file at
  * `dir/_claims/vNNNNNNNN`, the same atomic primitive as the commit
  * markers. The claim loser gets a loud [[ConcurrentWriteException]]
  * immediately (retry against the new head with a fresh version), so
  * two writers can never interleave inside one version dir. Just
  * before the commit marker the writer RE-VALIDATES that the head it
  * merged from is still the head — a writer that raced a DIFFERENT
  * version number fails loudly there instead of silently stranding the
  * other commit outside the manifest chain (the classic lost update:
  * both read head v, both commit, the higher version's manifest never
  * saw the lower's buckets). Claims are deleted on commit AND on every
  * in-process failure; only a hard writer crash leaves one behind, and
  * a stale claim (older than `spark.graft.snapshot.claimTtlMs`, default
  * 30 min) is auto-reclaimed by the next writer — set the TTL above
  * any plausible write duration, because a writer that outlives its
  * own claim re-enters the race it thought it had won. Honest residual:
  * head re-validation and marker creation are two filesystem calls, so
  * two different-version writers both passing validation inside that
  * window can still interleave; closing it outright needs a true CAS
  * on the head (contiguous version numbers or an external log — the
  * Delta/Iceberg route), noted as the upgrade path. Within one
  * streaming checkpoint the query remains single-writer and none of
  * this machinery is exercised beyond one create/delete per commit.
  */
object SnapshotStore {

  /** Another writer holds (or held) this version — the OCC loser path.
    * The message carries the claim path and age so an operator can
    * distinguish a live contender (retry with a fresh version once it
    * commits) from a crashed writer's leftover (delete the claim file,
    * or wait out the TTL).
    */
  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  /** Which version dir currently owns each bucket's rows. `mode`
    * records HOW rows were placed — `hash:<key>` (the default
    * hash-partitioned layout) or `content:<col>` (explicit content ids,
    * e.g. IVF cells) — so read paths that assume hash placement
    * (`lookupKey`, `maintainJoin`'s bucket prune) can verify it instead
    * of trusting a doc-comment contract: before this was recorded, a
    * caller hash-pruning a content-bucketed store silently read the
    * wrong buckets and dropped rows. None only on manifests written
    * before the field existed (readers treat that as "unknown" and take
    * the unpruned path).
    */
  final case class Manifest(numBuckets: Int, buckets: Map[Int, Long],
                            mode: Option[String] = None)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionName(v: Long): String = f"v$v%08d"

  def versionDir(dir: String, v: Long): String = s"$dir/${versionName(v)}"

  private def markerPath(dir: String, v: Long): Path =
    new Path(s"$dir/_commits/${versionName(v)}")

  private def manifestPath(dir: String, v: Long): Path =
    new Path(s"${versionDir(dir, v)}/_manifest")

  private def bucketDirName(b: Int): String = s"_bucket=$b"

  private def bucketExpr(key: String, numBuckets: Int): Column =
    pmod(hash(col(key)), lit(numBuckets))

  private val versionPat = "v(\\d{8,})".r

  private def confBuckets(spark: SparkSession): Int = {
    val raw = spark.conf.get("spark.graft.snapshot.buckets", "16")
    val n =
      try raw.toInt
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.snapshot.buckets must be an int, got '$raw'")
      }
    require(n >= 1, s"spark.graft.snapshot.buckets must be >= 1, got $n")
    n
  }

  /** Highest committed version, if any commit exists. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val commits = new Path(s"$dir/_commits")
    val f = fs(spark, dir)
    if (!f.exists(commits)) None
    else f.listStatus(commits)
      .map(_.getPath.getName)
      .collect { case versionPat(n) => n.toLong }
      .reduceOption(_ max _)
  }

  /** The head manifest (None before the first commit). */
  def manifest(spark: SparkSession, dir: String): Option[Manifest] =
    latestVersion(spark, dir).map(readManifest(fs(spark, dir), dir, _))

  private def readManifest(f: FileSystem, dir: String, v: Long): Manifest = {
    val in = f.open(manifestPath(dir, v))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val n = lines.head.stripPrefix("buckets=").toInt
    val mode = lines.tail.find(_.startsWith("mode="))
      .map(_.stripPrefix("mode="))
    Manifest(n, lines.tail
      .filter(l => l.nonEmpty && !l.startsWith("mode=")).map { l =>
        val Array(b, ver) = l.split(",")
        b.toInt -> ver.toLong
      }.toMap, mode)
  }

  private def writeManifest(f: FileSystem, dir: String, v: Long,
                            m: Manifest): Unit = {
    val out = f.create(manifestPath(dir, v), false)
    try out.write(
      (s"buckets=${m.numBuckets}" +:
        (m.mode.map(md => s"mode=$md").toSeq ++
          m.buckets.toSeq.sortBy(_._1).map { case (b, ver) => s"$b,$ver" }))
        .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The current snapshot contents (None before the first commit):
    * the union of every bucket's owning leaf dir per the head manifest.
    */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    latestVersion(spark, dir).map(readVersion(spark, dir, _))

  /** All committed versions, ascending — the auditable history (markers
    * are never pruned; DATA older than the retention window is).
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val commits = new Path(s"$dir/_commits")
    val f = fs(spark, dir)
    if (!f.exists(commits)) Seq.empty
    else f.listStatus(commits).map(_.getPath.getName)
      .collect { case versionPat(n) => n.toLong }.toSeq.sorted
  }

  /** The snapshot AS OF committed `version` (time travel): the union of
    * every bucket's owning leaf dir per THAT version's manifest — the
    * same plan shape as a head read, so an as-of query costs exactly a
    * current query. Readable while the version sits inside the `retain`
    * window; asking for a version whose data has been pruned fails on
    * the missing leaf dirs (loudly — never a silent partial snapshot),
    * and asking for a never-committed version fails here on the marker
    * check, which also keeps crash-orphan dirs unreadable.
    */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val f = fs(spark, dir)
    require(f.exists(markerPath(dir, version)),
      s"version $version was never committed in $dir " +
        s"(committed: ${versions(spark, dir).mkString(", ")})")
    require(f.exists(manifestPath(dir, version)),
      s"version $version is outside the retention window: its manifest " +
        "was pruned (raise `retain` on the writer to keep deeper history)")
    val m = readManifest(f, dir, version)
    val paths = m.buckets.toSeq.sortBy(_._1).map { case (b, ver) =>
      s"${versionDir(dir, ver)}/${bucketDirName(b)}"
    }
    // mergeSchema: after an additive schema evolution (`evolve=true`
    // upsert) untouched buckets still serve pre-evolution files, so the
    // union across leaf dirs must reconcile by NAME, null-filling the
    // columns a leaf predates. Cost is one footer read per leaf dir
    // (<= numBuckets), not a data scan; on a never-evolved store the
    // schemas are identical and this is a no-op.
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** Merge `delta` into the snapshot as `version` (idempotent: a version
    * already committed is a no-op, so at-least-once callers get an
    * exactly-once snapshot). Delta rows win over snapshot rows on `key`;
    * new keys append. Within the delta, the row with the highest
    * `seqCol` per key wins, with an md5-of-row tiebreak on equal seq so
    * replays pick the SAME winner (deterministic snapshot contents);
    * pass a delta already unique on `key` to skip that pass.
    *
    * With `opCol` set, the delta is a CDC feed: rows with op `'d'` are
    * tombstones that REMOVE their key from the snapshot, anything else
    * upserts (`Layout.applyCdc`). The per-key seq winner decides the
    * key's fate, so an update and a later delete in one batch deletes,
    * and vice versa. Tombstones cost the same as upserts — the key's
    * bucket merges and rewrites; nothing else moves — and the op column
    * never reaches disk. Deleting a key absent from the snapshot no-ops,
    * so replayed or duplicated delete batches are harmless.
    *
    * With `evolve` set, the delta may ADD columns (and/or stop carrying
    * old ones): the touched buckets' merge null-fills by name, untouched
    * buckets keep their pre-evolution files on disk, and readers
    * reconcile across vintages via parquet schema merge — an additive
    * column evolution rewrites NOTHING beyond the delta's own buckets.
    * Time travel preserves history faithfully: a pre-evolution version
    * reads back WITHOUT the new column. Type changes are not evolution
    * (the parquet merge refuses conflicting types, loudly).
    *
    * Only the key-hash buckets the delta touches are read back, merged,
    * and rewritten; every other bucket's files are untouched on disk and
    * carried forward by manifest reference. The one driver-side action
    * is collecting the distinct touched bucket ids (<= numBuckets ints).
    *
    * After committing, bucket dirs no retained manifest references are
    * deleted; a version dir survives as long as ANY retained version
    * still reads one of its buckets (markers stay forever, so version
    * history remains auditable).
    *
    * Replay vs collision: at-least-once streaming can only replay the
    * LAST committed batch, so version == latest no-ops (the replay) but
    * version < latest throws — that is a writer running against a
    * checkpoint that was reset while the snapshot dir survived, and a
    * silent no-op there would discard every batch whose id collides
    * with an old marker. (The one undetectable case is a reset
    * checkpoint colliding on the very latest version; recovery from a
    * checkpoint loss is to also start a fresh snapshot dir or
    * re-point `retain`-aware tooling at the old one.)
    *
    * With `bucketCol` set, rows are placed by that column's value (an
    * int in `[0, numBuckets)`) instead of `hash(key)` — the seam that
    * turns the store into a CONTENT-partitioned index (the ANN index's
    * IVF cell, an inverted index's term shard): readers that know which
    * buckets answer their query read ONLY those dirs (`readBuckets`),
    * so probe IO is buckets_probed/numBuckets of the index at any size.
    * Caller contract: a key's bucket value must be STABLE across deltas
    * (derive it from immutable row content, e.g. a frozen centroid
    * assignment) — the merge only consults the delta's own buckets, so
    * a key that moved buckets would survive in its old one.
    * Out-of-range bucket values fail the write loudly. `lookupKey`
    * remains hash-routed and applies only to hash-bucketed stores.
    */
  def upsertVersion(spark: SparkSession, delta: DataFrame, key: String,
                    seqCol: Option[String], dir: String, version: Long,
                    retain: Int = 2, opCol: Option[String] = None,
                    evolve: Boolean = false,
                    bucketCol: Option[String] = None,
                    numBuckets: Option[Int] = None): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val f = fs(spark, dir)
    val latest = latestVersion(spark, dir)
    if (latest.contains(version)) return // replay of the last batch
    require(latest.forall(_ < version),
      s"version $version collides below committed ${latest.get}: the " +
        "checkpoint driving this writer was reset against a live snapshot " +
        "dir (single-writer, monotone-version contract)")

    // OCC claim: create-once BEFORE any data write, so two writers can
    // never interleave inside one version dir (object-doc at top of file)
    claimVersion(spark, f, dir, version)
    try {
    val head = latest.map(readManifest(f, dir, _))
    // explicit per-store sizing beats the session default for content-
    // bucketed stores (numBuckets IS the content-domain size, e.g. the
    // IVF cell count); once committed the manifest's count is law
    val nBuckets = head.map(_.numBuckets)
      .orElse(numBuckets).getOrElse(confBuckets(spark))
    // placement mode is as much "law" as the bucket count: a delta
    // placed by a different rule than the committed rows would merge
    // against the wrong buckets and strand live rows
    val mode = bucketCol.map(c => s"content:$c").getOrElse(s"hash:$key")
    head.flatMap(_.mode).foreach { recorded =>
      require(recorded == mode,
        s"store at $dir is bucketed '$recorded' but this write places " +
          s"'$mode' — placement is pinned at first commit (rebucket into " +
          "a new generation to change it)")
    }
    // explicit content bucket (e.g. IVF cell) or the default key hash;
    // a value outside [0, numBuckets) would land rows in a dir no
    // manifest tracks — fail the write, not the readers
    def placeExpr: Column = bucketCol match {
      case Some(c) =>
        val b = col(c).cast("int")
        when(b.isNull || b < 0 || b >= lit(nBuckets),
          org.apache.spark.sql.functions.raise_error(
            org.apache.spark.sql.functions.concat_ws("",
              lit(s"bucketCol '$c' out of [0, $nBuckets): "),
              col(c).cast("string"))))
          .otherwise(b)
      case None => bucketExpr(key, nBuckets)
    }

    val deltaLatest = seqCol match {
      case Some(seq) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{md5, row_number, struct, to_json}
        delta.withColumn("_rn", row_number().over(
            Window.partitionBy(col(key))
              .orderBy(col(seq).desc, md5(to_json(struct(delta.columns.map(col): _*))))))
          .filter(col("_rn") === 1).drop("_rn")
      case None => delta
    }

    // Stage the bucket-tagged delta once: it feeds both the touched-set
    // collect and the merge write (otherwise the delta source recomputes).
    val tagged = deltaLatest
      .withColumn("_bucket", placeExpr).persist()
    try {
      val touched = tagged.select("_bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      val baseTouched = head.flatMap { m =>
        val paths = m.buckets.collect { case (b, ver) if touched(b) =>
          s"${versionDir(dir, ver)}/${bucketDirName(b)}"
        }.toSeq
        if (paths.isEmpty) None
        else Some(spark.read.option("mergeSchema", "true").parquet(paths: _*))
      }
      val deltaData = tagged.drop("_bucket")
      val merged = (baseTouched, opCol) match {
        case (Some(base), Some(op)) =>
          Layout.applyCdc(base, deltaData, key, op, evolve)
        case (Some(base), None) =>
          Layout.upsert(base, deltaData, key, evolve)
        // first commit / all-new buckets: tombstones for never-seen keys
        // are no-ops, so a CDC delta just drops its delete rows
        case (None, Some(op)) => deltaData.filter(col(op) =!= lit("d")).drop(op)
        case (None, None)     => deltaData
      }
      // One task per touched bucket: each rewritten bucket lands as a
      // single file of size ~table/numBuckets (size the bucket count so
      // that is a sane task; Layout.compaction handles finer sizing).
      merged.withColumn("_bucket", placeExpr)
        .repartition(touched.size max 1, col("_bucket"))
        .write.partitionBy("_bucket")
        .mode("overwrite").parquet(versionDir(dir, version))
      // A bucket whose merge DELETED every row writes no partition dir
      // (partitionBy skips empty groups). The manifest must still own it
      // at this version — pointing at the old dir would resurrect the
      // deleted rows — so land a zero-row, schema-bearing parquet dir
      // for each (Catalyst folds limit(0) to an empty relation; the
      // write is a footer-only file). Listing the written dirs is
      // filesystem metadata, no recompute.
      val written = f.listStatus(new Path(versionDir(dir, version)))
        .map(_.getPath.getName).filter(_.startsWith("_bucket="))
        .map(_.stripPrefix("_bucket=").toInt).toSet
      (touched -- written).foreach { b =>
        merged.limit(0).write.mode("overwrite")
          .parquet(s"${versionDir(dir, version)}/${bucketDirName(b)}")
      }
      // An EMPTY first commit (a store seeded ahead of its first data —
      // the pattern streaming maintainers use to create the table) must
      // still leave a READABLE snapshot: with zero owned buckets,
      // readVersion would have no parquet paths and no schema. One
      // zero-row schema-bearing bucket dir preserves both.
      val owned =
        if (head.isEmpty && touched.isEmpty) {
          merged.limit(0).write.mode("overwrite")
            .parquet(s"${versionDir(dir, version)}/${bucketDirName(0)}")
          Set(0)
        } else touched
      writeManifest(f, dir, version, Manifest(nBuckets,
        head.map(_.buckets).getOrElse(Map.empty) ++
          owned.map(_ -> version), Some(mode)))
      f.mkdirs(new Path(s"$dir/_commits"))
      // OCC re-validation: this manifest carries forward the bucket
      // ownership of `latest` — if another writer committed meanwhile,
      // publishing it would strand that commit outside the manifest
      // chain (lost update). Fail loudly instead; the caller re-runs
      // against the new head with a fresh version.
      val nowLatest = latestVersion(spark, dir)
      if (nowLatest != latest)
        throw new ConcurrentWriteException(
          s"head moved from ${latest.getOrElse("∅")} to " +
            s"${nowLatest.getOrElse("∅")} while version $version was " +
            "being written — this merge is stale; re-run the upsert " +
            "against the new head with a fresh version")
      f.create(markerPath(dir, version), false).close() // create-once: commit
      pruneData(spark, dir, retain)
    } finally tagged.unpersist()
    } finally {
      // release the claim in every outcome: a committed version is now
      // protected by its create-once marker, and a failed attempt must
      // reopen the slot for the caller's retry (only a hard crash leaves
      // a claim behind — see the TTL reclaim in claimVersion)
      f.delete(claimPath(dir, version), false)
    }
  }

  private def claimPath(dir: String, v: Long): Path =
    new Path(s"$dir/_claims/${versionName(v)}")

  /** Claim `version` via an empty create-once file, the OCC entry gate.
    * An existing claim younger than `spark.graft.snapshot.claimTtlMs`
    * (default 30 min) is a live contender → loud loser. An older one is
    * a crashed writer's leftover (every in-process exit deletes its
    * claim) → reclaimed by delete + re-create, where the create-once on
    * the re-create keeps simultaneous reclaimers serialized. Set the TTL
    * above any plausible write duration: a writer slower than the TTL
    * can lose its claim and re-enter the race it had won.
    */
  private def claimVersion(spark: SparkSession, f: FileSystem, dir: String,
                           version: Long): Unit = {
    f.mkdirs(new Path(s"$dir/_claims"))
    val p = claimPath(dir, version)
    val ttlMs = spark.conf.getOption("spark.graft.snapshot.claimTtlMs")
      .map(_.toLong).getOrElse(30L * 60 * 1000)
    def tryCreate(): Boolean =
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val age =
        try System.currentTimeMillis() - f.getFileStatus(p).getModificationTime
        catch { case _: java.io.IOException => Long.MaxValue } // vanished: retry
      val reclaimed = age > ttlMs && { f.delete(p, false); tryCreate() }
      if (!reclaimed)
        throw new ConcurrentWriteException(
          s"version $version of $dir is claimed by another writer " +
            s"(claim $p, age ${age / 1000}s, ttl ${ttlMs / 1000}s) — " +
            "either a live concurrent commit (retry with a fresh version " +
            "once it lands) or a crashed writer's leftover (wait out the " +
            "ttl, or delete the claim file after confirming the writer " +
            "is dead)")
    }
  }

  /** Point lookup: the current row(s) for one key value, reading ONLY
    * that key's hash bucket — IO is table_size/numBuckets at any table
    * size, which is what makes the store a serviceable key-value read
    * path (the same hash route the upsert writer takes, so reader and
    * writer can never disagree on placement). The filter lands on the
    * single bucket's parquet scan, so row-group stats prune within the
    * file too. Returns None before the first commit.
    */
  def lookupKey(spark: SparkSession, dir: String,
                key: String, value: Any): Option[DataFrame] =
    manifest(spark, dir).map { m =>
      // hash routing is only sound on a store hash-bucketed on THIS key;
      // the manifest records the placement, so verify instead of trusting
      // the caller (a content-bucketed store would route to a bucket that
      // simply doesn't hold the key and report it absent)
      m.mode.foreach { recorded =>
        require(recorded == s"hash:$key",
          s"lookupKey('$key') on a store bucketed '$recorded' — hash " +
            "routing would read the wrong bucket; use readBuckets with " +
            "content ids for content-bucketed stores")
      }
      // the literal must hash under the key column's EXACT type (Murmur3
      // is type-sensitive: hash(5: int) != hash(5L)) — pull the type
      // from any bucket's footer, then route via a 1-row local eval
      // through the same expression the writer bucketed with (no table
      // data is touched)
      val (b0, v0) = m.buckets.head
      val keyType = spark.read
        .parquet(s"${versionDir(dir, v0)}/${bucketDirName(b0)}")
        .schema(key).dataType
      val b = spark.range(1)
        .select(pmod(hash(lit(value).cast(keyType)), lit(m.numBuckets)).as("b"))
        .head().getInt(0)
      m.buckets.get(b) match {
        case Some(owner) =>
          spark.read.option("mergeSchema", "true")
            .parquet(s"${versionDir(dir, owner)}/${bucketDirName(b)}")
            .filter(col(key) === lit(value).cast(keyType))
        case None => // the key's bucket was never written: no such key
          spark.read
            .parquet(s"${versionDir(dir, v0)}/${bucketDirName(b0)}")
            .limit(0)
      }
    }

  /** The current rows of ONLY the given bucket ids — the pruned read
    * path for content-bucketed stores (`upsertVersion(bucketCol=…)`):
    * a probe that knows which buckets can answer it (the query's
    * nprobe IVF cells, a search term's shard) unions just those dirs,
    * so IO is |buckets|/numBuckets of the index at any size. Bucket
    * ids never written serve no rows (they are simply absent from the
    * manifest); ids outside [0, numBuckets) are refused loudly — a
    * caller computing probe buckets with a different modulus than the
    * writer would otherwise silently read nothing. Returns None before
    * the first commit.
    */
  def readBuckets(spark: SparkSession, dir: String,
                  buckets: Set[Int]): Option[DataFrame] =
    manifest(spark, dir).map { m =>
      val bad = buckets.filter(b => b < 0 || b >= m.numBuckets)
      require(bad.isEmpty,
        s"bucket id(s) ${bad.toSeq.sorted.mkString(", ")} outside " +
          s"[0, ${m.numBuckets}) — probe and writer disagree on the layout")
      val paths = m.buckets.toSeq.sortBy(_._1)
        .collect { case (b, ver) if buckets(b) =>
          s"${versionDir(dir, ver)}/${bucketDirName(b)}"
        }
      if (paths.isEmpty) read(spark, dir).get.limit(0)
      else spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }

  /** The net row-level changes between two committed versions — the
    * CDC READ side of the store (time travel answers "what WAS the
    * table"; this answers "what CHANGED"), the feed a downstream
    * incremental consumer (index maintainer, cache invalidator,
    * replication target) tails instead of diffing snapshots.
    *
    * Output: one row per key whose contents differ between the
    * versions, carrying the key, every data column (union of both
    * vintages' schemas — evolution-safe), and `_change`:
    * `'insert'` (key absent at `fromVersion`; new values),
    * `'update'` (present in both, any column differs; new values),
    * `'delete'` (key absent at `toVersion`; LAST-SEEN values).
    * A key rewritten with identical values does NOT appear — the feed
    * reports semantic change, not write activity — and a span of
    * versions nets out (insert then delete within the span → no row).
    *
    * Cost model: only buckets whose manifest OWNERSHIP changed between
    * the two versions are read (ownership changes iff the bucket was
    * rewritten in the span), then one full-outer join on the key over
    * just those buckets' rows — O(churned buckets + changed rows),
    * never O(table). Both versions must still sit inside the retention
    * window (same loud refusal as `readVersion`).
    */
  def changes(spark: SparkSession, dir: String, key: String,
              fromVersion: Long, toVersion: Long): DataFrame = {
    val f = fs(spark, dir)
    val (m1, m2, churned) = spanChurn(f, spark, dir, fromVersion, toVersion)

    def side(m: Manifest): Option[DataFrame] =
      churnedRows(spark, dir, m, churned)
    (side(m1), side(m2)) match {
      case (None, None) => // no churn: an empty, schema-correct feed
        readVersion(spark, dir, toVersion).limit(0)
          .withColumn("_change", lit(""))
      case (o, n) =>
        val oldRaw = o.getOrElse(n.get.limit(0))
        val newRaw = n.getOrElse(o.get.limit(0))
        // align vintages by name: null-fill the columns a side predates
        val allCols = (oldRaw.columns ++ newRaw.columns).distinct.toSeq
        def aligned(df: DataFrame, other: DataFrame): DataFrame =
          df.select(allCols.map { c =>
            if (df.columns.contains(c)) col(c)
            else lit(null).cast(other.schema(c).dataType).as(c)
          }: _*)
        val ol = aligned(oldRaw, newRaw).as("o")
        val nw = aligned(newRaw, oldRaw).as("n")
        val dataCols = allCols.filterNot(_ == key)
        val differs = dataCols
          .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
          .reduceOption(_ || _).getOrElse(lit(false))
        val change = when(col(s"o.$key").isNull, lit("insert"))
          .when(col(s"n.$key").isNull, lit("delete"))
          .when(differs, lit("update"))
        val picked = allCols.map(c =>
          when(col(s"n.$key").isNotNull, col(s"n.$c"))
            .otherwise(col(s"o.$c")).as(c))
        ol.join(nw, col(s"o.$key") === col(s"n.$key"), "full_outer")
          .select(picked :+ change.as("_change"): _*)
          .filter(col("_change").isNotNull)
    }
  }

  /** Validate a version span (both committed, both inside retention) and
    * return its manifests plus the bucket ids whose OWNERSHIP differs —
    * exactly the buckets some version in the span rewrote. Shared by the
    * change feed and incremental view maintenance, which both owe their
    * O(churned buckets) cost bound to this set.
    */
  private def spanChurn(f: FileSystem, spark: SparkSession, dir: String,
                        fromVersion: Long, toVersion: Long)
      : (Manifest, Manifest, Set[Int]) = {
    require(fromVersion < toVersion,
      s"span requires fromVersion < toVersion, got $fromVersion >= $toVersion")
    Seq(fromVersion, toVersion).foreach { v =>
      require(f.exists(markerPath(dir, v)),
        s"version $v was never committed in $dir " +
          s"(committed: ${versions(spark, dir).mkString(", ")})")
      require(f.exists(manifestPath(dir, v)),
        s"version $v is outside the retention window: its manifest was " +
          "pruned (raise `retain` on the writer to keep deeper history)")
    }
    val m1 = readManifest(f, dir, fromVersion)
    val m2 = readManifest(f, dir, toVersion)
    val churned = (m1.buckets.keySet ++ m2.buckets.keySet)
      .filter(b => m1.buckets.get(b) != m2.buckets.get(b))
    (m1, m2, churned)
  }

  /** A manifest's rows restricted to the given buckets, or None if it
    * owns none of them (mergeSchema reconciles cross-vintage columns).
    */
  private def churnedRows(spark: SparkSession, dir: String, m: Manifest,
                          churned: Set[Int]): Option[DataFrame] = {
    val paths = m.buckets.collect { case (b, ver) if churned(b) =>
      s"${versionDir(dir, ver)}/${bucketDirName(b)}"
    }.toSeq
    if (paths.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(paths: _*))
  }

  /** The bucket ids rewritten in a version span (spec/audit seam: pins
    * the O(churned buckets) cost bound of `changes`/`maintainAgg`). */
  private[graft] def churnedBuckets(spark: SparkSession, dir: String,
                                    fromVersion: Long, toVersion: Long): Set[Int] =
    spanChurn(fs(spark, dir), spark, dir, fromVersion, toVersion)._3

  /** Whether a span can be read incrementally: both versions committed
    * AND their manifests still inside the retention window. Lets a
    * caller choose a full-rebuild fallback instead of hitting
    * `changes`/`maintainAgg`'s loud refusal.
    */
  def spanReadable(spark: SparkSession, dir: String,
                   fromVersion: Long, toVersion: Long): Boolean = {
    val f = fs(spark, dir)
    fromVersion < toVersion &&
      Seq(fromVersion, toVersion).forall(v =>
        f.exists(markerPath(dir, v)) && f.exists(manifestPath(dir, v)))
  }

  /** Incrementally maintain a grouped count-and-sums aggregate view
    * across a version span — the materialized-view counterpart of
    * `changes`.
    *
    * `oldView` is the full aggregate at `fromVersion` with columns
    * `groupCols ++ cntCol ++ sums.map(_._1)`; `sums` pairs each view
    * column with the row-level expression it sums (cast it to DECIMAL —
    * decimal addition is associative, which is what makes the
    * incremental result BIT-IDENTICAL to a full recompute; double sums
    * would drift with grouping order). The view at `toVersion` is
    * `oldView − partial(churned buckets @ from) + partial(churned
    * buckets @ to)`: per-group signed partials over only the buckets
    * the span rewrote, one shuffle on the group keys over
    * O(view + churned rows) — the base table is never rescanned.
    * Groups whose count reaches zero vanish, new groups appear.
    *
    * Count+sum covers the distributive family (avg = sum/cnt at read
    * time). Min/max are deliberately NOT supported: deleting a group's
    * extremum requires rescanning that group, so an exact min/max view
    * is not maintainable from deltas alone.
    */
  def maintainAgg(spark: SparkSession, dir: String,
                  fromVersion: Long, toVersion: Long,
                  oldView: DataFrame, groupCols: Seq[String],
                  sums: Seq[(String, Column)],
                  cntCol: String = "cnt"): DataFrame = {
    import org.apache.spark.sql.functions.{count, sum}
    val f = fs(spark, dir)
    val (m1, m2, churned) = spanChurn(f, spark, dir, fromVersion, toVersion)
    if (churned.isEmpty) return oldView

    def partial(rows: DataFrame, sign: Int): DataFrame = {
      val aggs = (count(lit(1)) * lit(sign)).cast("long").as(cntCol) +:
        sums.map { case (n, e) => (sum(e) * lit(sign)).as(n) }
      rows.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val frames = Seq(Some(oldView),
      churnedRows(spark, dir, m1, churned).map(partial(_, -1)),
      churnedRows(spark, dir, m2, churned).map(partial(_, +1))).flatten
    val merged = frames.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(cntCol)).cast("long").as(cntCol),
        sums.map { case (n, _) => sum(col(n)).as(n) }: _*)
    merged.filter(col(cntCol) > 0)
  }

  /** Materialize the inner equi-join view A ⋈ B over two committed
    * stores, each row tagged with BOTH sides' owning bucket ids
    * (`_ab`, `_bb`) — the provenance `maintainJoin` needs to drop and
    * rebuild exactly the slices a delta invalidated. `joinCol` is a
    * column both stores carry (it may equal either store's key or
    * neither).
    */
  def joinView(spark: SparkSession, aDir: String, aKey: String,
               bDir: String, bKey: String, joinCol: String): DataFrame = {
    val mA = manifest(spark, aDir).getOrElse(
      sys.error(s"no committed store at $aDir"))
    val mB = manifest(spark, bDir).getOrElse(
      sys.error(s"no committed store at $bDir"))
    val a = read(spark, aDir).get
      .withColumn("_ab", bucketExpr(aKey, mA.numBuckets))
    val b = read(spark, bDir).get
      .withColumn("_bb", bucketExpr(bKey, mB.numBuckets))
    a.join(b, Seq(joinCol))
  }

  /** Incrementally maintain a `joinView` after ONE side advanced
    * `fromVersion` → `toVersion` — the JOIN half of the materialized-
    * view story (`maintainAgg` is the aggregate half; compose them for
    * aggregate-over-join views). `tagCol` names the view column
    * carrying the churned side's bucket ids (`"_ab"` when A advanced,
    * `"_bb"` when B advanced), `otherTag` the static side's.
    *
    * Correctness shape: the store's unit of change IS the bucket —
    * every view row whose churn-side bucket the span rewrote is
    * dropped whole, and the span's NEW bucket contents re-join against
    * the other side. No per-row diffing, no multiset bookkeeping:
    * inserts, updates, and tombstoned deletes all fall out of
    * drop-and-rebuild, and the result is row-identical to a full
    * recompute (SnapshotSpec pins both churn directions).
    *
    * Cost shape at 100 TB: O(churned-bucket rows ⋈ other side) — the
    * view and the churn side are never rescanned. The OTHER side's
    * read is bucket-PRUNED when its store key equals the join column
    * (the fact→dim direction: dim keyed by the join key serves only
    * the buckets the delta's keys hash into — the same ≤ numBuckets
    * driver-side ints as the upsert's touched-set); when it is keyed
    * otherwise the full other side joins (the dim→fact direction is
    * inherently O(facts matching changed keys) — bucket the fact store
    * by the join column if that direction dominates your churn).
    *
    * CONTENT-bucketed other stores (written with `bucketCol`) place
    * rows by an explicit id, not `hash(key)`, so the hash-derived
    * prune would read the WRONG buckets. The other store's manifest
    * records its placement mode, and the prune is taken ONLY when it
    * confirms hash-bucketing on the join column — any other mode (or a
    * pre-mode legacy manifest) falls back to the always-correct full
    * read, so a mistaken `otherKey == joinCol` on a content-bucketed
    * dim can no longer silently drop join rows. Content stores' own
    * pruning seam is `readBuckets` with caller-known content ids.
    */
  def maintainJoin(spark: SparkSession,
                   churnDir: String, churnKey: String,
                   fromVersion: Long, toVersion: Long,
                   otherDir: String, otherKey: String,
                   joinCol: String, oldView: DataFrame,
                   tagCol: String, otherTag: String): DataFrame = {
    val f = fs(spark, churnDir)
    val (_, m2, churned) = spanChurn(f, spark, churnDir, fromVersion, toVersion)
    if (churned.isEmpty) return oldView
    val mO = manifest(spark, otherDir).getOrElse(
      sys.error(s"no committed store at $otherDir"))
    val kept = oldView.filter(!col(tagCol).isin(churned.toSeq: _*))
    churnedRows(spark, churnDir, m2, churned) match {
      case None => kept
      case Some(rows) =>
        val nr = rows.withColumn(tagCol, bucketExpr(churnKey, m2.numBuckets))
        val other =
          if (otherKey == joinCol && mO.mode.contains(s"hash:$otherKey")) {
            val touched = nr
              .select(bucketExpr(joinCol, mO.numBuckets).as("_tb"))
              .distinct().collect().map(_.getInt(0)).toSet
            readBuckets(spark, otherDir, touched).get
          } else read(spark, otherDir).get
        kept.unionByName(
          nr.join(other.withColumn(otherTag, bucketExpr(otherKey, mO.numBuckets)),
            Seq(joinCol)))
    }
  }

  /** Re-bucket a hash-bucketed store into a NEW store dir with a
    * different bucket count — the scale-out reindex for when a growing
    * table's per-bucket size outgrows a sane task (the manifest pins
    * the count at first commit precisely so this is an explicit new
    * GENERATION, never an in-place mutation racing readers). One full
    * read → one full shuffled write, by design; the source store stays
    * untouched and serveable throughout, and the caller swaps readers
    * to `outDir` when the new generation's version 0 commits.
    * Content-bucketed stores re-bucket through their own builder
    * instead (e.g. a K-change on the vector index is a re-quantize).
    */
  def rebucket(spark: SparkSession, dir: String, outDir: String,
               key: String, newBuckets: Int): Unit = {
    require(newBuckets >= 1, s"newBuckets must be >= 1, got $newBuckets")
    manifest(spark, dir).flatMap(_.mode).foreach { recorded =>
      require(recorded == s"hash:$key",
        s"rebucket('$key') on a store bucketed '$recorded' — content-" +
          "bucketed stores re-bucket through their own builder")
    }
    val cur = read(spark, dir).getOrElse(
      sys.error(s"no committed store at $dir"))
    upsertVersion(spark, cur, key, seqCol = None, outDir, version = 0L,
      numBuckets = Some(newBuckets))
  }

  /** Delete bucket dirs that none of the `retain` newest committed
    * manifests reference, then any version dir left empty. Uncommitted
    * orphan dirs (crash leftovers) older than the retention horizon are
    * removed whole.
    */
  private def pruneData(spark: SparkSession, dir: String, retain: Int): Unit = {
    val f = fs(spark, dir)
    val commits = new Path(s"$dir/_commits")
    val committed = f.listStatus(commits).map(_.getPath.getName)
      .collect { case versionPat(n) => n.toLong }
    val retained = committed.sorted.takeRight(retain)
    val cutoff = retained.min
    // (owning version, bucket) pairs some retained manifest still reads
    // NB: .toSeq before the swap — mapping the Map directly would re-key
    // on the version and collapse every bucket it owns into one entry
    val referenced: Set[(Long, Int)] = retained.flatMap { v =>
      readManifest(f, dir, v).buckets.toSeq.map { case (b, ver) => (ver, b) }
    }.toSet
    f.listStatus(new Path(dir))
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case versionPat(n) => Some(s.getPath -> n.toLong)
        case _             => None
      })
      .foreach { case (p, v) =>
        if (v < cutoff) {
          if (!committed.contains(v)) f.delete(p, true) // invisible orphan
          else {
            f.listStatus(p).foreach { st =>
              val name = st.getPath.getName
              val keep = name.startsWith("_bucket=") &&
                referenced((v, name.stripPrefix("_bucket=").toInt))
              if (!keep) f.delete(st.getPath, true)
            }
            if (f.listStatus(p).isEmpty) f.delete(p, true)
          }
        }
      }
  }
}
