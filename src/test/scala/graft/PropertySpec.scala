package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators._

/** Property-based laws (SURVEY §5.3): dedup ≡ last-per-key, outer-join
  * row preservation, explode_outer row-count law. Inputs come from
  * scalacheck generators sampled at pinned seeds (the scalatest bridge
  * artifact is not in the offline cache, so sampling is driven directly —
  * deterministic by construction).
  */
class PropertySpec extends SparkSpec {
  import testImplicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(String, Int, String)]] =
    Gen.listOfN(30, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(0, 100)
      p <- Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    } yield (k, v, p))

  test("law: keepLatest == max-by-(order,tiebreak) per key") {
    samples(rowsGen, 8).filter(_.nonEmpty).foreach { rows =>
      // tiebreak on payload so the order is total even with duplicate v
      val df = rows.toDF("k", "v", "p")
      val got = Dedup.keepLatest(df, Seq("k"), Seq(col("v"), col("p")))
        .select("k", "v", "p").as[(String, Int, String)].collect().toSet
      val want = rows.groupBy(_._1).map { case (_, vs) => vs.maxBy(r => (r._2, r._3)) }.toSet
      assert(got === want, s"input: $rows")
    }
  }

  test("law: left outer join preserves every left row at least once") {
    val pairs = samples(rowsGen, 4).zip(samples(rowsGen, 4).reverse)
    pairs.filter(_._1.nonEmpty).foreach { case (l, r) =>
      val lf = l.toDF("k", "v", "p")
      val rf = r.toDF("k2", "v2", "p2")
      val joined = lf.join(rf, col("k") === col("k2"), "left_outer")
      assert(joined.select("k", "v", "p").distinct().count() === lf.distinct().count())
    }
  }

  test("law: explode_outer row count == sum(max(1, |items|))") {
    val arrGen = Gen.listOfN(15, Gen.listOf(Gen.choose(0, 9)).map(_.take(5)))
    samples(arrGen, 8).filter(_.nonEmpty).foreach { arrs =>
      val df = arrs.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "items")
      val n = Unnest.outer(df, col("items"), "x").count()
      assert(n === arrs.map(a => math.max(1, a.size)).sum.toLong, s"input: $arrs")
    }
  }

  test("law: JaccardJoin == brute force on random low-vocabulary corpora") {
    // tiny vocabulary = high document-frequency for every shingle = the
    // adversarial case for prefix filtering, and the regime where the
    // PPJoin length/positional filters must stay COMPLETE (they prune
    // candidates, never true pairs). Random thresholds cross the
    // integer-boundary cases.
    val corpusGen: Gen[(List[String], Int, Int)] = for {
      vocab <- Gen.choose(3, 6)
      nDocs <- Gen.choose(2, 18)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, vocab - 1).map(i => s"w$i")).map(_.mkString(" "))))
      num <- Gen.choose(1, 10)
    } yield (docs, num, 10)
    samples(corpusGen, 12).foreach { case (texts, num, den) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = JaccardJoin.nearDupPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
          ngram = 2, num = num, den = den)
        .select("id_a", "id_b", "inter_size", "union_size")
        .as[(Long, Long, Long, Long)].collect().toSet
      def sh(t: String): Set[String] =
        if (t.split(" ").length < 2) Set.empty
        else t.split(" ").sliding(2).map(_.mkString(" ")).toSet
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = sh(ta) if sa.nonEmpty
        sb = sh(tb) if sb.nonEmpty
        inter = (sa & sb).size.toLong
        union = (sa | sb).size.toLong
        if inter * den >= union * num
      } yield (ia, ib, inter, union)).toSet
      assert(got === want, s"num=$num/$den docs=$texts")
    }
  }

  test("law: connectedComponents == driver union-find on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(60, for {
        a <- Gen.choose(0L, 39L)
        b <- Gen.choose(0L, 39L)
      } yield (a, b))
    samples(edgeGen, 6).foreach { edges =>
      val real = edges.filter { case (a, b) => a != b }
      if (real.nonEmpty) {
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        real.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(v => v -> find(v)).toMap
        // min-reachable canonicalization: union-find roots are already
        // the min because we always parent max under min
        val got = Components.connectedComponents(real.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(got === want, s"edges=$real")
      }
    }
  }

  test("connectedComponents labels a long path to its min (pointer jumping)") {
    // a 200-node path: plain 1-hop min propagation needs ~200 rounds;
    // pointer jumping must finish within the default maxIter=30
    val path = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(path, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 200)
    assert(got.values.toSet === Set(0L))
  }

  test("law: exact dedup is idempotent and keeps one row per key") {
    samples(rowsGen, 6).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "v", "p")
      val once = Dedup.exact(df, Seq("k"), col("v"))
      val twice = Dedup.exact(once, Seq("k"), col("v"))
      assert(once.count() === rows.map(_._1).distinct.size.toLong)
      assert(once.collect().toSet === twice.collect().toSet)
    }
  }
}
