package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY §5.2 item 3). Plain scalacheck `Gen`
  * sampled under a fixed seed (the scalatest-plus bridge isn't in the
  * offline dependency set).
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))({ case (a, b) => f(a, b) })

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])
                                (f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd))({ case (a, b, c, d) => f(a, b, c, d) })

  private val isoTs: Gen[String] = for {
    y <- Gen.choose(1990, 2030); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
  } yield f"$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:$s%02d.000Z"

  test("PROPERTY: lexicographic ISO-string compare == instant compare (F2 semantics)") {
    forAll(isoTs, isoTs) { (a, b) =>
      val sa = java.time.Instant.parse(a)
      val sb = java.time.Instant.parse(b)
      assert((a >= b) == !sa.isBefore(sb))
    }
  }

  test("PROPERTY: winnow fingerprints are a subset of gram hashes and nonempty on long text") {
    forAll(Gen.listOfN(30, Gen.alphaLowerStr.suchThat(_.nonEmpty))) { words =>
      val text = words.mkString(" ")
      import org.apache.spark.unsafe.types.UTF8String
      val grams = functions.StringKernels.charGramHashes(UTF8String.fromString(text), 5)
      val fps = functions.StringKernels.winnow(grams, 4)
      assert(fps.toSet.subsetOf(grams.toSet))
      if (grams.length >= 4) assert(fps.nonEmpty)
    }
  }

  test("PROPERTY: shingle hashes from tokens == polyhash of joined shingle strings") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.listOfN(10, Gen.alphaLowerStr.suchThat(_.nonEmpty))) { words =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        words.map(w => UTF8String.fromString(w)).toArray[Any])
      val kernel = functions.ShingleHashes(null, 3).nullSafeEval(arr)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
      val expected = words.sliding(3).filter(_.size == 3)
        .map(s => functions.StringKernels.polyHash(UTF8String.fromString(s.mkString(" "))))
        .toSeq.distinct
      assert(kernel == expected)
    }
  }

  test("PROPERTY: connected components == brute-force union-find on random graphs") {
    import spark.implicits._
    val edgeGen: Gen[List[(Long, Long)]] = for {
      nNodes <- Gen.choose(2, 24)
      nEdges <- Gen.choose(1, 40)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, nNodes - 1L), Gen.choose(0L, nNodes - 1L)))
    } yield edges
    forAll(edgeGen, n = 12) { edges =>
      val real = edges.filter { case (a, b) => a != b }
      if (real.nonEmpty) {
        // reference: sequential union-find
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        real.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x))
          .filter { case (x, r) => x != r }.toMap
        val got = graft.dedup.Dedup.connectedComponents(real.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"edges=$real")
      }
    }
  }

  test("PROPERTY: chunking covers all tokens exactly with stride overlap") {
    import graft.ops.LlmData.{ChunkStride, ChunkTokens}
    forAll(Gen.choose(1, 500), n = 100) { n =>
      val starts = 0 to ((n - 1) / ChunkStride)
      val chunks = starts.map(ci =>
        (ci * ChunkStride, math.min(ci * ChunkStride + ChunkTokens, n)))
      // full coverage, in order, no gaps between consecutive chunks
      assert(chunks.head._1 == 0 && chunks.last._2 == n)
      chunks.sliding(2).foreach {
        case Seq((_, prevEnd), (start, _)) => assert(start <= prevEnd)
        case _ =>
      }
      // every chunk except possibly the last is full width or reaches n
      chunks.init.foreach { case (s, e) => assert(e - s == math.min(ChunkTokens, n - s)) }
    }
  }

  test("PROPERTY: int8 quantization error bound holds on random vectors") {
    import spark.implicits._
    val vecGen: Gen[List[Float]] =
      Gen.listOfN(8, Gen.choose(-1000000, 1000000).map(_ / 1000.0f))
    forAll(Gen.listOfN(24, vecGen), n = 4) { vecs =>
      val nonZero = vecs.filter(_.exists(_ != 0.0f))
      if (nonZero.nonEmpty) {
        val df = nonZero.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
        val out = graft.sim.Similarity.quantizeInt8(df, 8).collect()
        assert(out.length == nonZero.length)
        out.foreach { r =>
          val (scale, err, cos) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
          assert(err <= 0.5 / scale + 1e-9)
          assert(cos <= 1.0 + 1e-12 && cos >= 0.99)
        }
      }
    }
  }

  test("PROPERTY: XML render is total and well-nested over arbitrary flat products") {
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ean", StringType), StructField("price", DoubleType),
      StructField("n", LongType), StructField("ok", BooleanType)))
    forAll(Gen.alphaNumStr, Gen.double, Gen.long, Gen.oneOf(true, false)) {
      (s, d, n, b) =>
        val row = new GenericRowWithSchema(Array[Any](s, d, n, b), schema)
        val xml = graft.xml.XmlRender.renderProduct(row, "")
        assert(xml.count(_ == '<') == xml.count(_ == '>'))
        assert(xml.contains(s"<n>$n</n>"))
    }
  }

  test("PROPERTY: normalize is idempotent, trimmed, and emits only [a-z0-9 ]") {
    import org.apache.spark.sql.functions.col
    val charGen = Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(' ', '\t', 'É', 'ñ', 'Ü', 'ß', '!', '#', ',', '.', '€'))
    val strGen = Gen.listOfN(12, charGen).map(_.mkString)
    val samples = collection.mutable.ListBuffer[String]()
    forAll(strGen)(s => samples += s)
    import spark.implicits._
    spark.createDataset(samples.toSeq).toDF("text")
      .select(graft.text.TextOps.normalize(col("text")).as("n"))
      .withColumn("n2", graft.text.TextOps.normalize(col("n")))
      .collect().foreach { r =>
        val (n, n2) = (r.getString(0), r.getString(1))
        assert(n == n2, s"not idempotent: '$n' -> '$n2'")
        assert(n.forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c == ' '))
        assert(n == n.trim && !n.contains("  "))
      }
  }

  test("PROPERTY: bloom semi join equals the exact key intersection") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    forAll(Gen.zip(Gen.listOfN(40, Gen.choose(0L, 5000L)),
      Gen.listOfN(200, Gen.choose(0L, 5000L))), n = 5) { case (bks, pks) =>
      val got = ops.Relational.bloomSemiJoin(
          pks.distinct.toDF("pk"), "pk", bks.toDF("bk"), "bk")
        .select(col("pk")).as[Long].collect().toSet
      assert(got == pks.toSet.intersect(bks.toSet))
    }
  }

  test("PROPERTY: Misra-Gries bound and heavy-item superset hold on random streams") {
    val streamGen = for {
      nItems <- Gen.choose(3, 40)
      len <- Gen.choose(20, 800)
      // zipf-ish skew: item k drawn with weight 1/(k+1)
      s <- Gen.listOfN(len, Gen.frequency(
        (0 until nItems).map(k => (nItems - k, Gen.const(s"i$k"))): _*))
    } yield s
    val capGen = Gen.choose(2, 24)
    val partsGen = Gen.choose(1, 9)
    forAll(Gen.zip(streamGen, capGen, partsGen), n = 120) { case (stream, cap, parts) =>
      val mg = new graft.functions.MisraGries(cap)
      val merged = stream.grouped(math.max(1, stream.size / parts))
        .map(c => c.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      val sk = mg.finish(merged)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.size
      assert(sk.size <= cap)
      sk.foreach { case (k, est) =>
        assert(est <= exact(k) && est >= exact(k) - n / (cap + 1),
          s"cap=$cap parts=$parts item=$k est=$est exact=${exact(k)} n=$n")
      }
      exact.filter(_._2 > n / (cap + 1)).keys.foreach(k =>
        assert(sk.contains(k), s"heavy $k evicted (cap=$cap parts=$parts)"))
    }
  }
}
