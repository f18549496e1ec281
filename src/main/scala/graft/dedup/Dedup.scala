package graft.dedup

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for the training-data pipeline. All are
 * DataFrame transformations built from codegen'd column expressions
 * plus shuffle-efficient join shapes:
 *
 *  - exact:        hash group-by (one shuffle on the content hash)
 *  - ngramJaccard: prefix-filtered (PPJoin) set-similarity join by
 *                  default — rarest-token prefixes bound the candidate
 *                  join so hot shingles can't go quadratic; the
 *                  posting-list variant stays as an explicit fast path
 *  - minhashLsh:   shingles -> k minhashes -> banded bucket keys ->
 *                  NARROW (band, id) self-join -> pair dedup -> exact
 *                  verify via join-back to the shingle table (the
 *                  candidate shuffle never carries the shingle arrays)
 *  - simhash:      60-bit portable fingerprint (md5-derived token
 *                  hashes, one distributed pass of per-bit partial
 *                  sums); near-dups via (maxHamming+1)-block pigeonhole
 *                  — candidate recall is EXACT, so output == brute force
 *  - embeddingCosine: near-dup pairs above a cosine threshold via
 *                  BANDED random-hyperplane buckets (OR of bands) +
 *                  exact cosine verify
 *
 * At 100 TB every variant keeps the quadratic step bounded: candidates
 * come from equi-joins on discriminative keys (tokens / bands /
 * blocks / hyperplane signs), never a cross join, and the candidate
 * join shuffles only (key, id) projections — verification payloads
 * travel once, in the final equi-join-back.
 */
object Dedup {

  /** Round-robin an under-split input up to the session's parallelism
    * BEFORE the per-row heavy passes (shingling, signatures): a
    * single-file corpus (one parquet row group) would otherwise pin
    * each pass to one task. Inputs already at or past half the target
    * keep their partitioning (the 100 TB case: thousands of splits,
    * no extra exchange). Same small-ingest handling as
    * [[graft.engine.Pipeline.renderedFromDocs]]. */
  private def rebalanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target) else df
  }

  /** Partition count for CPU-heavy narrow-row stages: 2x the session
    * parallelism (scheduler slack for uneven verify tasks), nudged so
    * it can never equal `spark.sql.shuffle.partitions` — a user
    * repartition whose keys AND count match the ENSURE_REQUIREMENTS
    * exchange below it is pruned as redundant at planning, and the
    * remaining exchange is then AQE-coalesced by BYTES (candidate
    * pairs are two longs, so a 32 MB pair set collapses to a handful
    * of tasks while costing tens of CPU-seconds of verify work — the
    * r6 q26 profile measured exactly this serialization). */
  private def cpuSpreadCount(spark: org.apache.spark.sql.SparkSession): Int = {
    val t = 2 * math.max(1, spark.sparkContext.defaultParallelism)
    val sp = try spark.conf.get("spark.sql.shuffle.partitions").toInt catch { case _: Exception => -1 }
    if (t == sp) t + 1 else t
  }

  /** Spread a narrow candidate-pair frame across the session's
    * parallelism before a CPU-heavy verify: AQE coalesces the dedup
    * shuffle by BYTES (pairs are two longs), but the exact
    * verification behind it costs array-intersection/cosine CPU per
    * row — a 1 MB partition is minutes of work, not a megabyte.
    * Hash-partitioned on the pair, so placement is deterministic
    * under retries. */
  private def spreadPairs(cand: DataFrame): DataFrame =
    cand.repartition(cpuSpreadCount(cand.sparkSession), col("da"), col("db"))

  /** Spread band/block rows by the self-join key before the candidate
    * join: the explicit REPARTITION_BY_NUM exchange satisfies the
    * join's required distribution (no second exchange appears), AQE
    * cannot coalesce it, and both hint("merge") sides stay the
    * identical subtree so stage reuse still computes the signature
    * pass once. */
  private def spreadKeyed(df: DataFrame, key: String): DataFrame =
    df.repartition(cpuSpreadCount(df.sparkSession), col(key))

  /** Exact duplicate groups by full-content hash. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("canonical"))
      .where(col("copies") > 1)

  /**
   * Train/eval DECONTAMINATION: find training documents sharing any
   * `shingleN`-token shingle with a benchmark/eval document — the
   * standard n-gram-overlap contamination check run before training.
   * Returns one row per (train_id, bench_id) contaminated pair with
   * the number of distinct shared shingles.
   *
   * Scale shape: the benchmark side is tiny by construction (eval
   * sets are a few MB against a multi-TB corpus), so its distinct
   * shingle hashes BROADCAST and the train side — the 100 TB side —
   * is touched by exactly one narrow projection (id, hash) with a
   * map-side broadcast-hash join; the ONLY train-side shuffle is the
   * final per-pair distinct-count, which carries matched rows only
   * (the broadcast semi-join has already dropped everything else).
   * The train side is deliberately NOT pre-deduped: a distinct on
   * (train_id, hash) would plan a full hash-aggregate Exchange over
   * the 100 TB side before the join — the per-pair COUNT(DISTINCT
   * hash) after the join computes the same overlap on a vastly
   * smaller row set. Shingles travel as the portable 60-bit md5 hash
   * ([[graft.text.Text.tokenHash60]]), 8 bytes on the wire and
   * replayable in any engine with md5.
   */
  def contaminationPairs(train: DataFrame, bench: DataFrame, shingleN: Int = 3,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def shingleHashes(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId),
          explode(graft.functions.TextExprs.shingles(col(textCol), shingleN)).as("_sh"))
        .select(col(outId), graft.text.Text.tokenHash60(col("_sh")).as("_h"))
    shingleHashes(rebalanced(train), "train_id")
      .join(broadcast(shingleHashes(bench, "bench_id").distinct()), Seq("_h"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(countDistinct(col("_h")).as("overlap_ngrams"))
  }

  /** The corpus minus every document [[contaminationPairs]] flags —
    * one anti-join; pass the pairs through so callers can log/audit
    * what was dropped (never silently). */
  def decontaminate(train: DataFrame, bench: DataFrame, shingleN: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val flagged = contaminationPairs(train, bench, shingleN, textCol, idCol)
      .select(col("train_id").as(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /**
   * Exact n-gram Jaccard join over `shingleN`-gram shingle sets: pairs
   * with jaccard >= num/den (integer-exact comparison, no FP).
   *
   * DEFAULT = the prefix-filtered PPJoin shape
   * ([[ngramJaccardPairsPrefix]]): candidate volume is bounded by the
   * rare-token prefixes, so one viral boilerplate shingle cannot make
   * the self-join quadratic — the property that matters at corpus
   * scale. The posting-list variant
   * ([[ngramJaccardPairsPostings]]) remains as an explicit opt-in for
   * known-benign vocabularies (it skips the document-frequency window
   * pass). Both produce identical output.
   */
  def ngramJaccardPairs(docs: DataFrame, num: Int, den: Int, shingleN: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    ngramJaccardPairsPrefix(docs, num, den, shingleN, textCol, idCol)

  /**
   * Posting-list candidate join with inline intersection counting —
   * fastest exact shape when shingle document frequencies are benign,
   * but candidate count is Σ df(t)² so a hot token goes quadratic;
   * prefer the default [[ngramJaccardPairs]] unless the vocabulary is
   * known benign.
   */
  def ngramJaccardPairsPostings(docs: DataFrame, num: Int, den: Int, shingleN: Int = 3,
                                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = rebalanced(docs).select(col(idCol).as("id"),
        explode(graft.functions.TextExprs.shingles(col(textCol), shingleN)).as("t"))
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.t") === col("b.t") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("da"), col("b.id").as("db"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("id", "db").withColumnRenamed("n", "nb"), "db")
      // c / (na + nb - c) >= num/den  <=>  c * den >= num * (na + nb - c)
      .where(col("c") * den >= (col("na") + col("nb") - col("c")) * num)
      .select(col("da"), col("db"), col("c"), (col("na") + col("nb") - col("c")).as("u"))
  }

  /**
   * Same exact join via PREFIX FILTERING (the classic PPJoin bound):
   * order every document's shingles by ascending global document
   * frequency (rarest first, ties by token); two sets with J >= t MUST
   * share a token within their first |X| - ceil(t·|X|) + 1 tokens
   * under any shared total order, so only those prefix tokens enter
   * the candidate self-join — one hot shingle can no longer go
   * quadratic. Verification is exact (join back to the full distinct
   * shingle arrays), so the output equals [[ngramJaccardPairsPostings]].
   */
  def ngramJaccardPairsPrefix(docs: DataFrame, num: Int, den: Int, shingleN: Int = 3,
                              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("id"),
        graft.functions.TextExprs.shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val toks = base.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("t"))
    val df = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // prefix length: n - ceil(t*n) + 1 with t = num/den, integer-exact:
    // ceil(num*n/den) = floor((num*n + den - 1)/den)
    val prefixLen = col("n") - floor((lit(num) * col("n") + den - 1) / den) + 1
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("t"))
    val prefixes = toks.join(df, "t")
      .withColumn("rk", row_number().over(byRarity))
      .where(col("rk") <= prefixLen)
      .select(col("id"), col("t"))
    // NOTE: deliberately NOT merge-hinted like the band self-joins
    // below — measured 2-5x slower here (interleaved A/B, warm: hint
    // 6.8-16.2 s vs no-hint 2.7-3.3 s at sf0.1): the prefix token
    // distribution has hot keys whose equal-key groups the sort-merge
    // join must buffer, while the broadcast build AQE picks hashes
    // them; the duplicated prefix subtree is the cheaper evil
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.t") === col("b.t") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .dropDuplicates("da", "db")
    verifyJaccard(cand, base, num, den)
  }

  /** Exact-Jaccard verify shared by the prefix and LSH candidate
    * generators: join the narrow (da, db) candidates back to the
    * shingle table once per side, then keep pairs with
    * |A∩B| * den >= num * |A∪B| (integer math — no float threshold). */
  private def verifyJaccard(cand0: DataFrame, base: DataFrame,
                            num: Int, den: Int): DataFrame = {
    val cand = spreadPairs(cand0)
    cand
      .join(base.select(col("id").as("da"), col("sh").as("sha")), "da")
      .join(base.select(col("id").as("db"), col("sh").as("shb")), "db")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("u", size(col("sha")) + size(col("shb")) - col("c"))
      .where(col("c") * den >= col("u") * num)
      .select(col("da"), col("db"), col("c"), col("u"))
  }

  /**
   * MinHash+LSH near-dup pairs: docs sharing at least one LSH band
   * bucket, verified by exact shingle-set Jaccard >= num/den.
   *
   * Join shape (the 100 TB-critical part): the band self-join shuffles
   * ONLY (band, id); candidate pairs are deduped as narrow (da, db)
   * rows; the exact verify then equi-joins back to the shingle table
   * twice. The wide shingle arrays are never part of the self-join.
   *
   * Default banding (32 bands x 2 rows of k=64): a pair at the j=0.5
   * threshold collides with p = 1-(1-j^2)^32 ≈ 1-6e-5; every observed
   * near-dup in the synthetic corpus has j >= 0.8 where the miss
   * probability is < 1e-14 — the LSH output equals exact brute force.
   */
  def minhashLshPairs(docs: DataFrame, shingleN: Int = 3, k: Int = 64,
                      bands: Int = 32, num: Int = 1, den: Int = 2,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val rows = k / bands
    require(rows * bands == k, s"bands=$bands must divide k=$k")
    import graft.functions.TextExprs
    val base = rebalanced(docs).select(col(idCol).as("id"),
        TextExprs.shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    // native one-pass signature + band keys (the transform/aggregate
    // formulation interprets k·|sh| lambdas per row — 30x slower)
    val bandRows = spreadKeyed(base
      .select(col("id"), TextExprs.minhashSig(col("sh"), k).as("sig"))
      .select(col("id"), explode(TextExprs.lshBandKeys(col("sig"), bands, rows)).as("band")), "band")
    // merge-hinted self-join -> one shared exchange: the shingle +
    // minhash signature pass runs once, not once per join side
    val cand = bandRows.as("a").hint("merge").join(bandRows.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .dropDuplicates("da", "db")
    verifyJaccard(cand, base, num, den)
  }

  /**
   * SimHash signatures: one native pass per document (tokenize, md5
   * each token to the portable 60-bit hash, per-bit majority) — a pure
   * projection, no explode, no shuffle. Bit-identical to the DuckDB
   * oracle's per-token md5 derivation.
   */
  def simhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame =
    rebalanced(docs).select(col(idCol).as("id"),
      graft.functions.TextExprs.simhash60(col(textCol)).as("h"))

  /**
   * SimHash near-dups: hamming(simhash) <= maxHamming. Candidates via
   * the EXACT pigeonhole: the 60-bit signature splits into
   * (maxHamming+1) blocks, so any pair within maxHamming shares at
   * least one whole block — recall is 100% by construction and the
   * output equals brute force (and is DuckDB-oracle-able).
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bits = Text.SimhashBits
    val nb = maxHamming + 1
    require(nb <= bits, s"maxHamming=$maxHamming too large for $bits-bit simhash")
    val widths = Array.tabulate(nb)(i => bits / nb + (if (i < bits % nb) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    val withH = simhashSignatures(docs, textCol, idCol)
    val blocks = withH.select(col("id"), col("h"),
      explode(array((0 until nb).map(i =>
        struct(lit(i).as("blk"),
          shiftright(col("h"), starts(i)).bitwiseAND(lit((1L << widths(i)) - 1)).as("key"))): _*)).as("b"))
    // merge-hinted self-join -> one shared exchange for the simhash
    // signature pass (tokenize + per-token md5)
    val blocksSpread = spreadKeyed(blocks, "b")
    blocksSpread.as("a").hint("merge").join(blocksSpread.as("b").hint("merge"),
        col("a.b") === col("b.b") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        Text.hamming(col("a.h"), col("b.h")).as("hamming"))
      // filter BEFORE deduping: the hamming test is a per-row bit_count
      // (no shuffle) while dropDuplicates shuffles — on low-entropy
      // corpora block collisions make the raw candidate set large, so
      // order matters (~10x here)
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("da", "db")
  }

  /**
   * Connected components over a near-dup pair list: every document
   * gets the SMALLEST id reachable through dup pairs as its cluster
   * label (the canonical survivor) — the step that turns pairwise
   * near-dup output into actual dedup groups.
   *
   * Spark shape, two regimes:
   *  - the pair list (ALREADY the tiny output of LSH verification, not
   *    the corpus) fits the driver -> one collect + union-find, zero
   *    iteration overhead (the reference holds whole relation graphs
   *    in RAM the same way);
   *  - larger graphs -> alternating LARGE-STAR / SMALL-STAR rounds
   *    (the standard MapReduce connected-components construction:
   *    each phase hangs every neighborhood off its minimum member, so
   *    components collapse to stars in O(log) rounds REGARDLESS of
   *    diameter — min-label propagation would need diameter rounds,
   *    which a chain of pairwise near-dups can push past any fixed
   *    iteration budget). Per round: two groupBy-mins + joins, lineage
   *    truncated; converged when the edge set reaches its fixpoint.
   */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 50,
                        aCol: String = "da", bCol: String = "db",
                        localSolveMaxPairs: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one full parallel pass decides the regime (a limit-probe would
    // re-execute the upstream pipeline under incremental-limit)
    val edgeCount = edges.count()
    if (edgeCount <= localSolveMaxPairs) {
      val sample = edges.collect()
      edges.unpersist()
      // small-graph fast path: classic union-find on the driver
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrElse(x, x) != x) {
          parent(x) = parent.getOrElse(parent(x), parent(x)) // halve
          x = parent(x)
        }
        x
      }
      sample.foreach { r =>
        val (u, v) = (r.getLong(0), r.getLong(1))
        // self-pairs are ignored in BOTH regimes (the distributed path
        // filters u != v below): a node appearing only as (x, x) gets
        // no label row, regardless of which regime the volume picks
        if (u != v) {
          parent.getOrElseUpdate(u, u)
          parent.getOrElseUpdate(v, v)
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) { val (lo, hi) = (math.min(ru, rv), math.max(ru, rv)); parent(hi) = lo }
        }
      }
      val rows = parent.keys.toSeq.map(id => (id, find(id))).sortBy(_._1)
      return spark.createDataset(rows).toDF("id", "label")
    }
    // Large regime: alternating LARGE-STAR / SMALL-STAR rounds (the
    // classic scalable connected-components construction — two
    // groupBy-min + join rounds per iteration, O(log n) iterations
    // regardless of component DIAMETER; plain min-label propagation
    // needs diameter rounds, which a long duplicate chain at corpus
    // scale can exceed). Edges keep the invariant u > v.
    val e0 = edges.where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    var cur = e0.localCheckpoint(true)
    edges.unpersist()
    def signature(df: DataFrame): (Long, Long) = {
      // XOR-fold of per-edge hashes: order-insensitive set signature
      // with no ANSI overflow (summing xxhash64 longs overflows)
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(cur)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // large-star: every neighborhood's larger members connect to its min
      val nb = cur.unionByName(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = nb.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLarge = nb.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
      // small-star: each node and its smaller neighbors connect to the min
      val mins2 = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val afterSmall = afterLarge.join(mins2, "u")
        .select(explode(array(
          struct(col("u").as("u"), col("m").as("v")),
          struct(col("v").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u"), col("e.v"))
        .where(col("u") =!= col("v")).distinct()
        .localCheckpoint(true) // truncate iterative lineage
      val nextSig = signature(afterSmall)
      converged = nextSig == sig
      sig = nextSig
      cur = afterSmall
      it += 1
    }
    // an un-converged edge set is NOT star-shaped — emitting labels from
    // it would silently produce multiple rows per node downstream
    if (!converged) throw new IllegalStateException(
      s"duplicateClusters did not converge within maxIters=$maxIters rounds; " +
        "raise maxIters (rounds needed grow O(log n) in the largest component)")
    // at the fixpoint every component is a star rooted at its min:
    // members point at the root, the root points nowhere
    val members = cur.select(col("u").as("id"), col("v").as("label"))
    val roots = cur.select(col("v").as("id")).distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .withColumn("label", col("id"))
    members.unionByName(roots)
  }

  /**
   * Embedding near-dup pairs: cosine >= threshold. Candidates from
   * BANDED random-hyperplane signatures (OR of bands, mirroring the
   * minhash-LSH structure): `bands` bands of `rowsPerBand` planes each;
   * two vectors are candidates iff some band's sign-pattern matches
   * exactly. Plane vectors are deterministic literals (splitmix64), so
   * the signature is reproducible in any engine. Exact cosine verify.
   *
   * Recall at cos θ: per-plane agreement p = 1 - acos(θ)/π; miss
   * probability (1 - p^r)^b — with 16x4 over cos 0.95 that is < 1e-7.
   * Candidate volume stays bounded: a random pair (cos≈0) matches a
   * 4-plane band with p=1/16, not the all-pairs blowup of a single
   * wide bucket.
   */
  def embeddingCosinePairs(emb: DataFrame, threshold: Double,
                           bands: Int = 16, rowsPerBand: Int = 4,
                           vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorExprs
    val v = rebalanced(emb).select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val dim = graft.ann.Ann.probeDim(emb, vecCol)
    val planes = graft.ann.Ann.planeMatrix(bands * rowsPerBand, dim)
    // native one-loop signature (the zip_with/aggregate form interprets
    // bands·rows·dim lambdas per row)
    val bandRows = spreadKeyed(v.select(col("id"),
      explode(VectorExprs.bandedPlaneSig(col("v"), planes, bands, rowsPerBand)).as("bk")), "bk")
    // merge-hinted self-join -> one shared exchange: the 64-plane dot
    // product signature pass runs once, not once per join side
    val cand = bandRows.as("a").hint("merge").join(bandRows.as("b").hint("merge"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .dropDuplicates("da", "db")
    val cosine = VectorExprs.cosineSim(col("va"), col("vb"))
    spreadPairs(cand)
      .join(v.select(col("id").as("da"), col("v").as("va")), "da")
      .join(v.select(col("id").as("db"), col("v").as("vb")), "db")
      .select(col("da"), col("db"), round(cosine, 6).as("cos"))
      .where(col("cos") >= threshold)
  }
}
