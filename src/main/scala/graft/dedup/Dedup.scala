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
 *  - ngramJaccard: token-posting-list candidate join + integer-exact
 *                  threshold (the classic SIGMOD set-similarity join:
 *                  explode distinct tokens, equi-join postings,
 *                  count intersections, |A∪B| = |A|+|B|-∩)
 *  - minhashLsh:   shingles -> k minhashes -> banded bucket keys ->
 *                  self-join on (band, key) -> verified candidates
 *  - simhash:      64-bit fingerprint; near-dups via banded blocks +
 *                  hamming verify (pigeonhole: d <= 3 pairs share one
 *                  of 4 16-bit blocks)
 *  - embeddingCosine: near-dup pairs above a cosine threshold via
 *                  random-hyperplane LSH buckets + exact verify
 *
 * At 100 TB every variant keeps the quadratic step bounded: candidates
 * come from equi-joins on discriminative keys (tokens / bands /
 * blocks / hyperplane signs), never a cross join.
 */
object Dedup {

  /** Exact duplicate groups by full-content hash. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("canonical"))
      .where(col("copies") > 1)

  /**
   * Exact n-gram Jaccard join over `shingleN`-gram shingle sets: pairs
   * with jaccard >= num/den (integer-exact comparison, no FP).
   * Shingles (not unigrams) keep the posting lists selective — a
   * small-vocabulary corpus would otherwise make the candidate join
   * quadratic.
   */
  def ngramJaccardPairs(docs: DataFrame, num: Int, den: Int, shingleN: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(Text.shingles(col(textCol), shingleN)).as("t"))
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
   * MinHash+LSH near-dup candidates: docs sharing at least one LSH band
   * bucket, verified by exact shingle-set Jaccard >= num/den.
   */
  def minhashLshPairs(docs: DataFrame, shingleN: Int = 3, k: Int = 64,
                      bands: Int = 16, num: Int = 1, den: Int = 2,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val rows = k / bands
    val withSig = docs.select(col(idCol).as("id"), col(textCol).as("text"),
        Text.shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", Text.minhash(col("sh"), k))
      .withColumn("band", explode(Text.lshBands(col("sig"), bands, rows)))
    val cand = withSig.as("a").join(withSig.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("da", "db")
    // exact verify: |A∩B| * den >= num * |A∪B| (integer math)
    cand
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("u", size(col("sha")) + size(col("shb")) - col("c"))
      .where(col("c") * den >= col("u") * num)
      .select(col("da"), col("db"), col("c"), col("u"))
  }

  /** SimHash near-dups: hamming(simhash) <= maxHamming, candidates via
    * 4x16-bit block pigeonhole. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val withH = docs.select(col(idCol).as("id"), Text.simhash(col(textCol)).as("h"))
    val blocks = withH.select(col("id"), col("h"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("blk"), col("h").bitwiseAND(lit(0xffffL << (16 * i))).as("key"))): _*)).as("b"))
    blocks.as("a").join(blocks.as("b"),
        col("a.b.blk") === col("b.b.blk") && col("a.b.key") === col("b.b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        Text.hamming(col("a.h"), col("b.h")).as("hamming"))
      .dropDuplicates("da", "db")
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Embedding near-dup pairs: cosine >= threshold. Candidates from
   * random-hyperplane sign buckets (deterministic pseudo-planes from
   * xxhash64 of (dim index, plane index)), exact cosine verify.
   */
  def embeddingCosinePairs(emb: DataFrame, threshold: Double, planes: Int = 8,
                           vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    // deterministic pseudo-random hyperplanes: component p_j(i) from a
    // hash of (j, i) mapped to [-1, 1]
    def planeDot(p: Int): Column =
      aggregate(zip_with(col("v"),
        sequence(lit(0), size(col("v")) - 1),
        (x, i) => x * ((xxhash64(lit(p), i) % 1000001L).cast("double") / 1000000.0)),
        lit(0.0d), (acc, x) => acc + x)
    val sig = (0 until planes).map(p => when(planeDot(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val withSig = v.withColumn("sig", sig)
    val cosine = {
      val dot = aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      val na = sqrt(aggregate(col("a.v"), lit(0.0d), (acc, x) => acc + x * x))
      val nb = sqrt(aggregate(col("b.v"), lit(0.0d), (acc, x) => acc + x * x))
      dot / (na * nb)
    }
    withSig.as("a").join(withSig.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"), round(cosine, 6).as("cos"))
      .where(col("cos") >= threshold)
  }
}
