package graft

import graft.ann.Ann
import graft.dedup.Dedup
import graft.text.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup / ANN / text-analysis operator semantics on small fixtures. */
class ModulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup finds duplicate groups") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z", 4L -> "a b c")
    val out = Dedup.exact(d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("copies") == 3)
    assert(out.head.getAs[Long]("canonical") == 1)
  }

  test("ngram jaccard pairs: exact threshold over 3-gram shingles") {
    val d = docs(
      1L -> "a b c d e", // shingles {abc, bcd, cde}
      2L -> "a b c d f", // shingles {abc, bcd, cdf} -> jaccard 2/4 = 0.5
      3L -> "p q r s t")
    val hi = Dedup.ngramJaccardPairs(d, 6, 10).collect() // >= 0.6: none
    assert(hi.isEmpty)
    val lo = Dedup.ngramJaccardPairs(d, 5, 10).collect() // >= 0.5: (1,2)
    assert(lo.map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet == Set((1L, 2L)))
  }

  test("minhash LSH finds near-identical docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.minhashLshPairs(d, shingleN = 3, k = 64, bands = 16, num = 1, den = 2)
      .collect()
    assert(pairs.map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet == Set((1L, 2L)))
  }

  test("simhash: identical docs hamming 0, near docs small hamming") {
    val d = docs(1L -> "the quick brown fox jumps over the lazy dog and runs far away today",
      2L -> "the quick brown fox jumps over the lazy dog and runs far away tonight",
      3L -> "zx qv wk jn pm lr ts uv ef gh ij kl mn op qr st uv wx yz ab")
    val h = d.select(col("doc_id"), Text.simhash(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(h(1L) ^ h(1L)) == 0)
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) < java.lang.Long.bitCount(h(1L) ^ h(3L)))
  }

  test("brute force knn: self excluded, ranks deterministic, identical vector found") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.001f, 0.0f), 0), // nearly identical to 0
      (2L, Seq(0.0f, 1.0f, 0.0f), 1),
      (3L, Seq(0.0f, 0.0f, 1.0f), 2)).toDF("vec_id", "embedding", "label")
    val out = Ann.bruteForceTopK(emb, Seq(0L), 2).collect()
    assert(out.length == 2)
    assert(out.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("neighbor") == 1L)
  }

  test("lsh ann buckets identical vectors together") {
    val emb = (0 until 50).map { i =>
      val v = if (i < 25) Seq(1.0f, 2.0f, 3.0f, (i * 0.001).toFloat)
      else Seq(-1.0f, -2.0f, -3.0f, (i * 0.001).toFloat)
      (i.toLong, v, i / 25)
    }.toDF("vec_id", "embedding", "label")
    val out = Ann.lshTopK(emb, Seq(0L), 3, planes = 3).collect()
    assert(out.nonEmpty)
    // all neighbors come from the same half (same bucket side)
    assert(out.forall(_.getAs[Long]("neighbor") < 25))
  }

  test("top-k survives NaN cosines from zero vectors (NaN sorts last)") {
    // neighbor 1 is a zero vector -> cosine NaN; arriving first it must
    // not freeze the k=2 buffer and block the later good candidates
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.1f, 0.0f)),
      (4L, Seq(1.0f, 0.2f, 0.0f))).toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(emb.coalesce(1), Seq(0L), 2).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor")).toSeq
    assert(out == Seq(3L, 4L), s"NaN rows must rank below finite cosines, got $out")
  }

  test("probeDim skips empty vectors and fails loudly when none are usable") {
    val emb = Seq((1L, Seq.empty[Float]), (2L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    assert(Ann.probeDim(emb.coalesce(1), "embedding") == 2)
    val bad = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Ann.probeDim(bad, "embedding"))
    assert(e.getMessage.contains("non-empty"))
  }

  test("ivf native centroid assignment matches the interpreted argmin form") {
    val emb = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Ann.ivfTopK(emb, Seq(0L, 7L), 3, cells = 4, nprobe = 2).collect()
    // reference: brute-force within the same probed cells via the old
    // zip_with/aggregate argmin, recomputed here driver-side
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // same deterministic centroid pick as ivfTopK
    val cents = vecs.keys.toSeq
      .sortBy(id => ((id * 2654435761L) % 4294967296L + 4294967296L) % 4294967296L -> id)
      .take(4).map(id => id -> vecs(id))
    def near(v: Array[Double], n: Int) =
      cents.sortBy { case (cid, cv) => (sq(v, cv), cid) }.take(n).map(_._1)
    val assign = vecs.map { case (id, v) => id -> near(v, 1).head }
    for (q <- Seq(0L, 7L)) {
      val probed = near(vecs(q), 2).toSet
      val cand = vecs.keys.filter(id => id != q && probed(assign(id)))
      def cos(a: Array[Double], b: Array[Double]) = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        BigDecimal(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val expect = cand.toSeq.map(id => (id, cos(vecs(q), vecs(id))))
        .sortBy { case (n, c) => (-c, n) }.take(3).map(_._1)
      val got = out.filter(_.getAs[Long]("qid") == q)
        .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor")).toSeq
      assert(got == expect, s"qid=$q")
    }
  }

  test("simhash pairs equal exact brute force (pigeonhole recall is total)") {
    // docs engineered so some qualifying pairs differ in bits spread
    // across many blocks — the r1 4-block scheme missed these
    val d = docs((1L to 30L).map { i =>
      val toks = (1 to 20).map(j => if (j % (i % 7 + 2) == 0) s"v${i}_$j" else s"base$j")
      i -> toks.mkString(" ")
    }: _*)
    val lsh = Dedup.simhashPairs(d, maxHamming = 6).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val sigs = Dedup.simhashSignatures(d).collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (ia, ib)).toSet
    assert(lsh == brute)
    assert(brute.nonEmpty, "fixture should produce at least one qualifying pair")
  }

  test("embedding cosine LSH finds planted near-dups (banded recall)") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = (0 until 40).map { i =>
      val v =
        if (i < 10) base.map(x => x + 0.02f * rnd.nextGaussian().toFloat) // near-dups of each other
        else Array.fill(16)(rnd.nextGaussian().toFloat)
      (i.toLong, v.toSeq, 0)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingCosinePairs(emb, 0.95, bands = 16, rowsPerBand = 4).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    // exact brute force over the same fixture
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val brute = (for {
      (ia, va, _) <- rows; (ib, vb, _) <- rows
      if ia < ib && (math.rint(cos(va, vb) * 1e6) / 1e6) >= 0.95
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty)
    assert(got == brute)
  }

  test("vector expressions stay codegen'd and match an independent Scala replay") {
    // r6: CosineSim/BandedPlaneSig/PlaneSig/NearestCentroids grew real
    // doGenCode (a CodegenFallback anywhere ejects the whole operator
    // from whole-stage codegen — the dominant cost of the q26 verify).
    // Assert (a) the projection stays inside a WholeStageCodegen span
    // and (b) generated-code results equal a plain-Scala replay on
    // both float and double arrays.
    import graft.functions.VectorExprs
    val rnd = new scala.util.Random(11)
    val dim = 16
    val rows = (0 until 50).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    val planes = Array.fill(8, dim)(rnd.nextGaussian())
    val cents = Array.tabulate(4)(c => (c.toLong, Array.fill(dim)(rnd.nextGaussian())))
    for (asFloat <- Seq(false, true)) {
      val df0 = rows.map { case (i, v) => (i, v.toSeq) }.toDF("id", "v")
      // repartition keeps ConvertToLocalRelation from folding the
      // whole projection at plan time (which would bypass codegen)
      val df = (if (asFloat) df0.select(col("id"), col("v").cast("array<float>").as("v")) else df0)
        .repartition(2)
      val vcol = col("v")
      val out = df.select(col("id"),
        VectorExprs.cosineSim(vcol, vcol).as("cos"),
        VectorExprs.planeSig(vcol, planes).as("sig"),
        VectorExprs.bandedPlaneSig(vcol, planes, 4, 2).as("bands"),
        VectorExprs.nearestCentroids(vcol, cents, 2).as("near"))
      val got = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getSeq[Long](3), r.getSeq[Long](4))).sortBy(_._1)
      // executedPlan is the FINAL adaptive plan only after the action ran
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("*("),
        s"vector exprs must stay inside whole-stage codegen (asFloat=$asFloat):\n$plan")
      rows.foreach { case (i, v0) =>
        val v = if (asFloat) v0.map(x => x.toFloat.toDouble) else v0
        val (_, cos, sig, bands, near) = got(i.toInt)
        def dot(a: Array[Double], b: Array[Double]) =
          a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
        assert(cos == dot(v, v) / (math.sqrt(dot(v, v)) * math.sqrt(dot(v, v))))
        val expSig = planes.zipWithIndex.map { case (p, j) =>
          if (dot(v, p) >= 0) 1L << j else 0L }.foldLeft(0L)(_ | _)
        assert(sig == expSig)
        val expBands = (0 until 4).map { b =>
          val key = (0 until 2).map { r =>
            if (dot(v, planes(b * 2 + r)) >= 0) 1L << r else 0L }.foldLeft(0L)(_ | _)
          (b.toLong << 2) | key
        }
        assert(bands == expBands)
        val expNear = cents.map { case (cid, cv) =>
          (v.zip(cv).map { case (x, y) => (x - y) * (x - y) }.foldLeft(0.0)(_ + _), cid)
        }.sortBy(identity).take(2).map(_._2).toSeq
        assert(near == expNear)
      }
    }
  }

  test("prefix-filtered jaccard join equals the posting-list join") {
    // include a HOT token shared by every doc — the prefix filter must
    // still find exactly the same qualifying pairs
    val d = docs((1L to 20L).map { i =>
      val noise = (1 to 10).map(j => s"w${i}_$j")
      val hot = Seq("common", "filler", "words")
      i -> (hot ++ noise ++ (if (i % 2 == 0) (1 to 9).map(j => s"w${i - 1}_$j") else Nil))
        .mkString(" ")
    }: _*)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.get(2).toString.toLong, r.get(3).toString.toLong)).sorted.toSeq
    val posting = norm(Dedup.ngramJaccardPairsPostings(d, 1, 3))
    val prefix = norm(Dedup.ngramJaccardPairsPrefix(d, 1, 3))
    assert(posting == prefix)
    assert(posting.nonEmpty, "fixture should produce qualifying pairs")
    // the DEFAULT is the prefix-filtered plan: its candidate stage runs
    // through the row_number rarity window (the PPJoin prefix bound)
    val defaultPlan = Dedup.ngramJaccardPairs(d, 1, 3)
      .queryExecution.optimizedPlan.toString
    assert(defaultPlan.contains("row_number"),
      s"default jaccard join must use the prefix-filter stage:\n$defaultPlan")
  }

  test("duplicate clusters: label propagation finds min-id components") {
    // chain 1-2-3-4 (one component), 10-11, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("da", "db")
    val labels = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("TopKAggregator: partial heaps match global sort") {
    val scored = (0 until 200).map(i => (i % 3L, i.toLong, (i * 37 % 100) / 100.0))
      .toDF("qid", "neighbor", "cos")
    val agg = org.apache.spark.sql.functions.udaf(new graft.ann.TopKAggregator(4))
    val got = scored.repartition(8).groupBy(col("qid"))
      .agg(agg(col("neighbor"), col("cos")).as("top")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getDouble(1)))).toMap
    val exact = (0 until 200).map(i => (i % 3L, i.toLong, (i * 37 % 100) / 100.0))
      .groupBy(_._1).map { case (q, xs) =>
        q -> xs.map(x => (x._2, x._3)).sortBy { case (n, c) => (-c, n) }.take(4)
      }
    assert(got == exact)
  }

  test("language id: stopword heuristic picks the right profile") {
    val d = Seq(
      (1L, "the cat and the dog ran to the house with a friend"),
      (2L, "el gato y el perro en la casa con los amigos un dia"),
      (3L, "der hund und die katze ist mit das haus auf ein weg"),
      (4L, "qqq www eee rrr ttt")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), Text.langId(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "de")
    assert(got(4L) == "und")
  }

  test("native LangQualityExpr matches the Column formulation bit-for-bit") {
    import graft.functions.TextExprs
    val texts = Seq(
      "the cat and the dog ran to the house with a friend",
      "el gato y el perro en la casa con los amigos un dia",
      "der hund und die katze ist mit das haus auf ein weg",
      "le chat et les chiens des maisons en un jour est une",
      "qqq www eee rrr ttt",
      "中文文本 the and of to in", // CJK wins over stopword hits
      "für FÜR für das DAS", // non-ASCII lowercase in stopword match
      "", // empty text -> one empty token
      "  leading and trailing whitespace  ",
      "a", "a b", "one-token",
      "punct!!! ??? ### $$$ %%%",
      "the the the the the the the the the the the the the the the the " * 8, // >64 tokens
      "x y z " + ("pad " * 60))
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = d.select(col("id"), TextExprs.langQuality(col("text")).as("lq"))
      .select(col("id"), col("lq.lang_pred"), col("lq.q_decile"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val column = d.withColumn("toks", Text.tokens(col("text")))
      .select(col("id"), Text.langIdFromTokens(col("text"), col("toks")).as("l"),
        floor(Text.qualityScoreRaw(col("text"), col("toks")) * 10).cast("long").as("q"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(native == column)
  }

  test("native Md5ChainFingerprintExpr matches the aggregate-HOF chain") {
    import graft.functions.TextExprs
    val texts = Seq("a b c", "c b a", "single", "", "  x  y ", "tok")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = d.select(col("id"), TextExprs.md5ChainFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val column = d.select(col("id"), Text.fingerprintPortable(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native == column)
    assert(native(0L) != native(1L)) // order-sensitive
  }

  test("quality score in [0,1], garbage scores lower than prose") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (2L, "a a a a a a a a a a a a a a a a")).toDF("doc_id", "text")
    val q = d.select(col("doc_id"), Text.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0 && v <= 1))
    assert(q(1L) > q(2L))
  }

  test("decontamination: overlapping shingles flag pairs; clean docs survive; bench side broadcasts") {
    import graft.dedup.Dedup
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox appears in this corpus too"),
      (3L, "completely unrelated words with zero shared trigrams here")).toDF("doc_id", "text")
    val bench = Seq((100L, "watch the quick brown fox run")).toDF("doc_id", "text")
    val pairs = Dedup.contaminationPairs(train, bench, shingleN = 3)
    // "quick brown fox" (and for doc 1 also "the quick brown") overlap
    val m = pairs.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1L) == 2L && m(2L) == 1L && !m.contains(3L))
    // the eval side must be the broadcast build side (the 100 TB-scale contract)
    val pPlan = pairs.queryExecution.executedPlan
    assert(pPlan.toString.contains("BroadcastHashJoin"))
    // ... and the TRAIN side must reach the join without any shuffle:
    // the only exchanges are the bench-side distinct (inside the
    // broadcast build) and the post-join per-pair distinct-count
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flat(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flat(s.plan)
      case _ => p +: p.children.flatMap(flat)
    }
    val bhj = flat(pPlan).collectFirst {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.get
    val streamed = if (bhj.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight)
      bhj.left else bhj.right
    assert(!flat(streamed).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"train side must not shuffle before the broadcast join:\n$streamed")
    val clean = Dedup.decontaminate(train, bench, shingleN = 3)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(3L))
  }

  test("sampling: deterministic in (seed, key), dyadic-exact thresholds, stratified rates") {
    import graft.engine.Sampling
    val df = spark.range(0, 2000).select(col("id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val a = Sampling.bernoulli(df, col("id"), lit(0.25), "s1").select("id").as[Long].collect().sorted
    val b = Sampling.bernoulli(df, col("id"), lit(0.25), "s1").select("id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq) // same seed -> identical sample, every run
    val c = Sampling.bernoulli(df, col("id"), lit(0.25), "s2").select("id").as[Long].collect().sorted
    assert(a.toSeq != c.toSeq) // different seed -> different sample
    assert(math.abs(a.length / 2000.0 - 0.25) < 0.05) // rate honored
    assert(Sampling.bernoulli(df, col("id"), lit(0.0), "s1").count() == 0)
    assert(Sampling.bernoulli(df, col("id"), lit(1.0), "s1").count() == 2000)
    val strat = Sampling.stratified(df, col("id"), col("lang"),
      Map("en" -> 0.5), defaultRate = 0.125, seed = "s1")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(strat("en") / 1000.0 - 0.5) < 0.1)
    assert(math.abs(strat("de") / 1000.0 - 0.125) < 0.1)
  }

  test("sampling + pii plans are narrow: zero exchanges before any aggregation") {
    import graft.engine.Sampling
    import graft.text.Pii
    val df = spark.range(0, 100).select(col("id"), col("id").cast("string").as("text"))
    val sPlan = Sampling.bernoulli(df, col("id"), lit(0.5), "s")
      .queryExecution.executedPlan.toString
    assert(!sPlan.contains("Exchange"), "a sample pass over 100 TB must not shuffle")
    val pPlan = df.select(Pii.redact(col("text")), Pii.emailCount(col("text")))
      .queryExecution.executedPlan.toString
    assert(!pPlan.contains("Exchange"), "a scrub pass over 100 TB must not shuffle")
    assert(pPlan.contains("*("), "regexp chain must stay inside whole-stage codegen ('*(n)' span)")
  }

  test("pii: email/ip/phone redaction and counts") {
    import graft.text.Pii
    val df = Seq(
      "mail me at jo.doe+spam@sub.example.co.uk or call +4915112345678 from 192.168.1.254 ok",
      "no pii here just words and 1234 numbers",
      "two mails a@b.io c@d.org one ip 8.8.8.8").toDF("text")
    val out = df.select(Pii.redact(col("text")).as("r"),
      Pii.emailCount(col("text")).as("e"), Pii.ipCount(col("text")).as("i"),
      Pii.phoneCount(col("text")).as("p")).collect()
    assert(out(0).getString(0) == "mail me at <EMAIL> or call <PHONE> from <IP> ok")
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1 && out(0).getInt(3) == 1)
    assert(out(1).getString(0) == "no pii here just words and 1234 numbers")
    assert(out(1).getInt(1) == 0 && out(1).getInt(2) == 0 && out(1).getInt(3) == 0)
    assert(out(2).getString(0) == "two mails <EMAIL> <EMAIL> one ip <IP>")
    assert(out(2).getInt(1) == 2 && out(2).getInt(2) == 1)
    // counts agree with the scrub: a phone-like run INSIDE an email's
    // local part is swallowed by <EMAIL>, so it must not count as a phone
    val tricky = Seq("mail +12345678@host.com now").toDF("text")
      .select(Pii.redact(col("text")).as("r"), Pii.phoneCount(col("text")).as("p"))
      .collect()(0)
    assert(tricky.getString(0) == "mail <EMAIL> now" && tricky.getInt(1) == 0)
  }

  test("fingerprint is order-sensitive") {
    val d = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fp = d.select(Text.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) != fp(1))
  }

  test("codecs: PNG / WAV / animated GIF round-trip exactly (JDK codecs)") {
    import graft.mm.Codecs
    // PNG is lossless: every pixel survives encode -> decode
    val png = Codecs.encodePng(23, 17, (x, y) =>
      ((x * 7 + y * 11) % 256 << 16) | ((x * 3 + y * 5) % 256 << 8) | ((x * 13 + y * 3) % 256))
    val img = Codecs.decodeImage(png)
    assert(img.width == 23 && img.height == 17)
    for (y <- 0 until 17; x <- 0 until 23)
      assert((img.pixel(x, y) & 0xffffff) ==
        (((x * 7 + y * 11) % 256 << 16) | ((x * 3 + y * 5) % 256 << 8) | ((x * 13 + y * 3) % 256)))
    // 16-bit PCM WAV: sample-exact both ways
    val samples = Array.tabulate(777)(i => ((i * 37 + i * i % 101) % 65536 - 32768).toShort)
    val (got, rate) = Codecs.decodeWav(Codecs.encodeWavPcm16(samples, 8000))
    assert(rate == 8000 && got.toSeq == samples.toSeq)
    // a 16-bit stream truncated to an odd byte count fails LOUDLY
    // (named corrupt-block contract) instead of silently dropping the
    // trailing byte and decoding plausible-looking samples
    val wav = Codecs.encodeWavPcm16(samples, 8000)
    val truncated = java.util.Arrays.copyOf(wav, wav.length - 1)
    // patch RIFF + data chunk sizes so the header itself stays
    // consistent with the odd payload (headers at 4 and 40 for the
    // canonical 44-byte javax.sound WAV layout)
    def putLe(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe(truncated, 4, truncated.length - 8)
    putLe(truncated, 40, truncated.length - 44)
    val ex = intercept[Exception](Codecs.decodeWav(truncated))
    assert(ex.getMessage != null && ex.getMessage.contains("odd data-chunk byte count"),
      s"expected the named odd-byte failure, got: ${ex.getMessage}")
    // animated GIF: <=256-color frames and delays round-trip exactly
    val frames = (0 until 3).map { f =>
      (Array.tabulate(20 * 14) { i =>
        val v = ((i % 20) * 7 + (i / 20) * 11 + f * 37) % 256
        0xff000000 | (v << 16) | (v << 8) | v
      }, 10 + f)
    }
    val back = Codecs.decodeGifFrames(Codecs.encodeGifAnim(20, 14, frames))
    assert(back.size == 3)
    for (f <- 0 until 3) {
      assert(back(f)._2 == 10 + f)
      assert(back(f)._1.argb.map(_ & 0xffffff).toSeq == frames(f)._1.map(_ & 0xffffff).toSeq)
    }
    // exact area-average resample: 2x2 box means
    val src = Codecs.Image(4, 2, Array(0, 0, 100 << 16, 100 << 16, 40, 60, 0, 0).map(0xff000000 | _))
    val rs = Codecs.resample(src, 2, 1)
    assert(((rs.pixel(0, 0) >> 16) & 0xff) == 0 && (rs.pixel(0, 0) & 0xff) == 25)
    assert(((rs.pixel(1, 0) >> 16) & 0xff) == 50)
  }

  test("multimodal: real payloads, true metadata, features, resize, frame sampling") {
    import graft.mm.{Codecs, Multimodal}
    // media://m/0 -> video, m/2 -> image, m/4 -> audio (hash-derived kinds)
    val refs = Seq("media://m/0", "media://m/2", "media://m/4", "media://m/2").toDF("media_ref")
    val media = Multimodal.synthesizeMedia(refs)
    val rows = media.collect().map(r => r.getString(1) -> r).toMap
    assert(rows.keySet == Set("image", "audio", "video"))
    // the image payload is a real PNG whose decoded dims match meta
    val imgRow = rows("image")
    val dec = Codecs.decodeImage(imgRow.getAs[Array[Byte]]("payload"))
    assert(dec.width == imgRow.getStruct(3).getInt(0) && dec.height == imgRow.getStruct(3).getInt(1))
    // the audio payload is a real WAV whose duration matches meta
    val (aus, _) = Codecs.decodeWav(rows("audio").getAs[Array[Byte]]("payload"))
    assert(rows("audio").getStruct(3).getInt(2) == aus.length * 1000 / Multimodal.SampleRate)
    // features: fixed dim, deterministic, null payload -> null feature
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.getAs[Seq[Float]]("feature").size == Multimodal.FeatureDim))
    val feats2 = Multimodal.extractFeatures(Multimodal.synthesizeMedia(refs)).collect()
    assert(feats.map(_.toString).sorted.toSeq == feats2.map(_.toString).sorted.toSeq)
    val nulled = media.withColumn("payload",
      org.apache.spark.sql.functions.lit(null).cast("binary"))
    assert(Multimodal.extractFeatures(nulled).collect().forall(_.isNullAt(2)))
    // resize re-encodes the image at the target dims (real PNG out)
    val resized = Multimodal.resize(media, 8, 8).collect()
      .find(_.getString(1) == "image").get
    val rimg = Codecs.decodeImage(resized.getAs[Array[Byte]]("payload"))
    assert(rimg.width == 8 && rimg.height == 8 && resized.getStruct(3).getString(3) == "image/png")
    // frame sampling decodes the real GIF: one row per everyMs tick
    // across the true duration, shown_frame from the delay timeline
    val vids = Multimodal.sampleFrames(media, everyMs = 80).collect()
    val nFrames = Codecs.decodeGifFrames(rows("video").getAs[Array[Byte]]("payload")).size
    assert(vids.length == nFrames) // 80 ms/frame delays, 80 ms ticks
    assert(vids.map(_.getInt(2)).sorted.toSeq == (0 until nFrames))
    assert(vids.forall(_.getLong(3) > 0L))
    // corrupt-blob contract everywhere, not just extractFeatures: a
    // garbage payload passes through resize unchanged and contributes
    // no sampled frames — never a stage failure
    val corrupt = media.withColumn("payload",
      org.apache.spark.sql.functions.lit("not media".getBytes))
    val rz = Multimodal.resize(corrupt, 8, 8).collect()
    assert(rz.forall(_.getAs[Array[Byte]]("payload").sameElements("not media".getBytes)))
    assert(Multimodal.sampleFrames(corrupt, everyMs = 80).collect().isEmpty)
  }

  test("streaming: watermarked window agg over a rate-less batch via AvailableNow") {
    import graft.streaming.Streams
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = Streams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append mode emits only windows older than the watermark; compare
    // against batch computation restricted to the same closed windows
    val streamed = spark.sql("SELECT * FROM win_out")
    val batch = spark.read.parquet(s"$dir/in")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win"), col("event_type"), col("n"))
    val cut = spark.read.parquet(s"$dir/in")
      .agg((max(col("ts").cast("timestamp")).cast("long") - 3 * 3600 - 60).cast("timestamp"))
      .collect()(0).getTimestamp(0)
    val closed = batch.where(col("win") < lit(cut))
    val sCnt = streamed.select("win", "event_type", "n").collect().map(_.toString).toSet
    val bCnt = closed.collect().map(_.toString).toSet
    assert(bCnt.subsetOf(sCnt), s"missing windows: ${bCnt.diff(sCnt).take(3)}")
  }

  test("streaming sessionization matches batch gap logic") {
    import graft.streaming.Streams
    val evs = Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", 1.0),
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "a", 1.0),
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "a", 1.0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "b", 1.0))
    // batch-mode check of the state function via groupByKey on a static DS
    val closed = Streams.sessionize(evs.toDS(), gapSeconds = 1800).collect()
    // user 1: first session (2 events) closes when the 02:00 event arrives
    assert(closed.length == 1)
    assert(closed.head.user_id == 1L && closed.head.events == 2)
  }
}
