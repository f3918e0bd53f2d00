package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity, TextAnalysis}

/** Specs for the round-9 training-pipeline additions: t12 sliding-
  * window chunking, d12 duplicated-span detection, s11 composed
  * IVF + residual-PQ search. Each operator's CORRECTNESS row gates
  * cross-engine value equality; these tests pin the SEMANTIC laws the
  * hash can't express (reassembly, span maximality, probe discipline).
  */
class PipelineOpsSpec extends SparkSpec {

  // ---- t12 chunking ------------------------------------------------------

  test("t12: chunks tile every document — strided starts, full coverage, " +
      "and stride-prefixes reassemble the exact text") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), trim(col("text")).as("txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TextAnalysis.chunkDocs(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))).toMap
    assert(chunks.keySet == docs.filter(_._2.nonEmpty).keySet)
    val stride = TextAnalysis.ChunkStride
    val width = TextAnalysis.ChunkChars
    chunks.foreach { case (id, cs) =>
      val txt = docs(id)
      cs.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i, s"doc $id chunk_idx gap at $i")
        assert(r.getLong(2) == i.toLong * stride, s"doc $id start off")
        val expected = txt.substring(i * stride,
          math.min(txt.length, i * stride + width))
        assert(r.getString(3) == expected, s"doc $id chunk $i text")
        assert(r.getLong(4) == expected.length.toLong)
      }
      // last chunk reaches the end of the doc; one chunk per started
      // stride window
      assert(cs.size == (txt.length + stride - 1) / stride)
      assert((cs.size - 1) * stride + cs.last.getLong(4) == txt.length)
      // stride-prefixes concatenate back to the source text exactly
      val rebuilt = cs.map(r => r.getString(3).take(stride)).mkString
      assert(rebuilt == txt, s"doc $id reassembly")
    }
  }

  test("t13: token chunks tile every document — strided starts, exact " +
      "budget, and stride-prefixes reassemble the token stream") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val chunks = TextAnalysis.chunkDocsTokens(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))).toMap
    val stride = TextAnalysis.TokenStride
    val budget = TextAnalysis.ChunkTokens
    assert(chunks.keySet == docs.filter(_._2.nonEmpty).keySet)
    chunks.foreach { case (id, cs) =>
      val toks = docs(id)
      cs.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i && r.getLong(2) == i.toLong * stride)
        val expect = toks.slice(i * stride,
          math.min(toks.size, i * stride + budget))
        assert(r.getString(3) == expect.mkString(" "), s"doc $id chunk $i")
        assert(r.getLong(4) == expect.size.toLong)
        assert(r.getLong(4) <= budget.toLong)
      }
      assert(cs.size == (toks.size + stride - 1) / stride)
      val rebuilt = cs.flatMap(r => r.getString(3).split(" ").take(stride))
      assert(rebuilt.toVector == toks, s"doc $id token reassembly")
    }
  }

  // ---- d12 duplicated spans ---------------------------------------------

  private def spansOf(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("d12: a shared boilerplate run is found as one maximal span per " +
      "doc; unique text yields none; within-doc repetition counts") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // 10 shared tokens
    val uniq = (c: Char) => (1 to 12).map(i => s"$c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${uniq('x')}"),
      (2L, s"${uniq('y')} $boiler"),
      (3L, uniq('z')),
      // within-doc repetition: the same 8-token run twice, no other doc
      (4L, s"${(1 to 8).map(i => s"r$i").mkString(" ")} mid " +
        (1 to 8).map(i => s"r$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = spansOf(dupSpansOf(docs))
    // boilerplate is 10 tokens → grams at 3 positions; doc 1 has it at
    // tokens 0..9, doc 2 at 12..21
    assert(out.contains((1L, 0L, 9L, 10L, 3L)), out)
    assert(out.contains((2L, 12L, 21L, 10L, 3L)), out)
    assert(!out.exists(_._1 == 3L), out)
    // doc 4: two copies of an 8-token run at 0..7 and 9..16 — the gap
    // (9 - 0 = 9 > 8) keeps them separate islands
    assert(out.contains((4L, 0L, 7L, 8L, 1L)), out)
    assert(out.contains((4L, 9L, 16L, 8L, 1L)), out)
    assert(out.size == 4)
  }

  test("d12: corpus-wide boilerplate is linear, not quadratic — one " +
      "maximal span per doc on the 600-doc templated corpus") {
    import spark.implicits._
    // the DedupSkewSpec regime: a gram shared by ALL 600 docs costs
    // d12 600 position rows (per-occurrence), where pair-based
    // detectors pay up to 600² candidate pairs — span detection has
    // no pair stage to flood. Docs 2k/2k+1 of the first 40 also share
    // their tails except the last token, extending THEIR spans.
    val boiler = (0 until 60).map(i => s"boiler$i").mkString(" ")
    def tail(i: Int): String = {
      val base = if (i < 40) i / 2 * 2 else i
      ((0 until 19).map(j => s"u${base}_$j") :+ s"v$i").mkString(" ")
    }
    val docs = (0 until 600).map(i => (i.toLong, s"$boiler ${tail(i)}"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = spansOf(dupSpansOf(docs))
    info(f"600-doc boilerplate corpus: ${out.size} spans in " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(out.size == 600) // exactly one maximal span per doc
    out.foreach { case (id, start, end, toks, grams) =>
      assert(start == 0L)
      if (id < 40L) // shared tail: span runs to the second-last token
        assert(end == 78L && toks == 79L && grams == 72L, s"doc $id")
      else          // unique tail: span covers the boilerplate only
        assert(end == 59L && toks == 60L && grams == 53L, s"doc $id")
    }
  }

  test("d12: overlapping duplicated grams merge into one island") {
    import spark.implicits._
    // 12-token run shared verbatim by two docs → 5 gram positions
    // (0..4), all within SpanGram of each other → ONE span 0..11
    val run = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, run), (2L, run)).toDF("doc_id", "text")
    val out = spansOf(dupSpansOf(docs))
    assert(out == Set((1L, 0L, 11L, 12L, 5L), (2L, 0L, 11L, 12L, 5L)), out)
  }

  test("d12: no keyed shuffle carries document text — the gram, repeat " +
      "and island exchanges move hashed longs only") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = spark.conf
    val prev = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val keyed = Dedup.dupSpans(spark, sfDir)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
        }
      assert(keyed.nonEmpty)
      keyed.foreach { e =>
        val cols = e.child.output.map(_.name.toLowerCase)
        // the only string-bearing exchange allowed is the corpus-spread
        // round-robin repartition (excluded above): every semantic
        // shuffle must be pre-hashed
        assert(!cols.exists(c => c == "text" || c == "txt" || c == "t"),
          s"document text crosses a keyed shuffle: ${cols.mkString(",")}")
      }
    } finally conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Writes a (doc_id, text) frame as a documents fixture dir so the
    * registered d12/d13 query entry points run against it.
    */
  private def fixtureDir(docs: DataFrame): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("spanfix").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def dupSpansOf(docs: DataFrame): DataFrame =
    Dedup.dupSpans(spark, fixtureDir(docs))

  // ---- d13 span-cut application -----------------------------------------

  test("d13: each duplicated span survives only at its first " +
      "occurrence; unaffected docs pass through verbatim") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val uniq = (c: Char) => (1 to 12).map(i => s"$c$i").mkString(" ")
    val rrun = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${uniq('x')}"),
      (2L, s"${uniq('y')} $boiler"),
      (3L, uniq('z')),
      (4L, s"$rrun mid $rrun")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedupApply(spark, fixtureDir(docs))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    // doc 1 holds the boilerplate's first occurrence → untouched
    assert(out(1L) == (s"$boiler ${uniq('x')}", 0L))
    // doc 2's copy is cut, its unique prefix survives
    assert(out(2L) == (uniq('y'), 10L))
    assert(out(3L) == (uniq('z'), 0L))
    // doc 4 keeps the FIRST copy of its internal repeat
    assert(out(4L) == (s"$rrun mid", 8L))
  }

  test("d13: a document that is entirely one duplicated span rebuilds " +
      "as the empty string") {
    import spark.implicits._
    val run = (1 to 9).map(i => s"e$i").mkString(" ")
    val docs = Seq((1L, run), (2L, run)).toDF("doc_id", "text")
    val out = Dedup.spanDedupApply(spark, fixtureDir(docs))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) == (run, 0L))
    assert(out(2L) == (("", 9L)))
  }

  test("t14: OOV counts equal a Scala recount against the t7 vocabulary") {
    val vocab = TextAnalysis.vocabulary(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val got = TextAnalysis.oovRate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, toks) =>
      val oov = toks.count(!vocab.contains(_)).toLong
      val (n, nOov, rate) = got(id)
      assert(n == toks.size.toLong && nOov == oov, s"doc $id")
      assert(math.abs(rate -
        BigDecimal(oov.toDouble / toks.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  // ---- c11 source-epoch materialization ---------------------------------

  test("c11: each doc repeats floor(ratio) or ceil(ratio) times with " +
      "contiguous epochs, and realized repetition tracks the ratio") {
    val rows = graft.llm.Curation.sourceEpochs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_._1)
    perDoc.foreach { case (id, rs) =>
      val ratio = rs.head._3
      val epochs = rs.map(_._4).sorted.toSeq
      assert(epochs == (1L to rs.size.toLong), s"doc $id epochs: $epochs")
      assert(rs.size == math.floor(ratio).toInt ||
        rs.size == math.ceil(ratio).toInt, s"doc $id: ${rs.size} vs $ratio")
    }
    // realized per-source expansion approximates the ratio (hash
    // selection is a fixed-denominator bucket draw, so allow slack)
    val docsPerSource = graft.core.Tables.load(spark, sfDir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val ratio = rs.head._3
      val realized = rs.size.toDouble / docsPerSource(src)
      assert(math.abs(realized - ratio) <= 0.25 + 1.0 / docsPerSource(src),
        s"$src: realized $realized vs ratio $ratio")
    }
  }

  // ---- s11 composed IVF + residual PQ -----------------------------------

  test("s11: every neighbor honors the probe discipline, sits in the " +
      "ADC top-C candidate set, and scores by exact cosine") {
    val out = Similarity.knnIvfPq(spark, sfDir).collect()
    assert(out.nonEmpty)
    // recompute coarse assignment + residual-PQ encode + ADC ranking
    // in plain Scala from the same data-sampled cells/codebooks
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val units = emb.view.mapValues(unit).toMap
    val cells = Similarity.CoarseCellIds.zipWithIndex
      .map { case (id, c) => c -> units(id) }.toMap
    val books = (for {
      sub <- 0 until Similarity.PqM
      (id, code) <- Similarity.PqSampleIds.zipWithIndex
    } yield {
      val dsub = Similarity.Dims / Similarity.PqM
      (sub, code) -> units(id).slice(sub * dsub, (sub + 1) * dsub)
    }).toMap
    val m = Similarity.PqM
    val dsub = Similarity.Dims / m
    // multi-assignment (r13): each vector is assigned to its
    // IvfPqAssign best cells, with a residual code PER assigned cell
    def cellsOf(u: Array[Double]): Seq[Int] =
      cells.toSeq.map { case (c, cv) => (dot(u, cv), c) }
        .sortBy { case (d, c) => (-d, c) }
        .take(Similarity.IvfPqAssign).map(_._2)
    // min-L2 encode of the residual vs the GIVEN cell: argmax
    // (r·c − ½‖c‖²), ties to the smallest code — the pqEncode rule
    def codesOf(u: Array[Double], cell: Int): Array[Int] = {
      val cv = cells(cell)
      val r = u.indices.map(i => u(i) - cv(i)).toArray
      (0 until m).map { sub =>
        val seg = r.slice(sub * dsub, (sub + 1) * dsub)
        (0 until Similarity.PqK)
          .map { code =>
            val b = books((sub, code))
            (dot(seg, b) - dot(b, b) / 2, code)
          }
          .sortBy { case (d, c) => (-d, c) }.head._2
      }.toArray
    }
    val allCells = units.view.mapValues(cellsOf).toMap
    val allCodes = (for {
      (v, u) <- units.toSeq; cell <- allCells(v)
    } yield (v, cell) -> codesOf(u, cell)).toMap
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val qu = units(qid)
      val probed = cells.toSeq
        .map { case (c, cv) => (dot(qu, cv), c) }
        .sortBy { case (d, c) => (-d, c) }
        .take(Similarity.IvfPqProbes).map(_._2).toSet
      // the ADC top-C candidate set this query's rerank may draw from:
      // each vector scores from its best probed copy (max over the
      // assigned∩probed cells of the per-cell rounded ADC score)
      val qcd = cells.view.mapValues(dot(qu, _)).toMap
      val cand = units.keys.toSeq
        .filter(v => v != qid && allCells(v).exists(probed.contains))
        .map { v =>
          val score = allCells(v).filter(probed.contains).map { cell =>
            val adc = allCodes((v, cell)).zipWithIndex
              .map { case (code, sub) =>
                dot(qu.slice(sub * dsub, (sub + 1) * dsub),
                  books((sub, code)))
              }.sum
            math.rint((qcd(cell) + adc) * 1e6) / 1e6
          }.max
          (score, v)
        }
        .sortBy { case (a, v) => (-a, v) }
        .take(Similarity.IvfPqRerank).map(_._2).toSet
      rows.foreach { r =>
        val vid = r.getLong(1)
        assert(allCells(vid).exists(probed.contains),
          s"neighbor $vid of $qid has no assigned cell among the probed")
        assert(cand.contains(vid),
          s"neighbor $vid of $qid outside the ADC top-C candidates")
        val exact = dot(qu, units(vid))
        assert(math.abs(r.getDouble(2) - exact) <= 5.000001e-7,
          s"s11 sim for ($qid,$vid) is not the exact cosine")
      }
    }
  }

  test("s12: prediction is the neighbor-label mode with smallest-label " +
      "ties, and agree compares it to the query's own label") {
    def num(r: Row, i: Int): Long = r.get(i).asInstanceOf[Number].longValue
    val labels = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> num(r, 1)).toMap
    val nn = Similarity.knnBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = Similarity.knnLabelVote(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((num(r, 1), num(r, 2), num(r, 3), r.getInt(4)))).toMap
    assert(got.keySet == nn.keySet)
    nn.foreach { case (q, neigh) =>
      val votes = neigh.groupBy(labels).view.mapValues(_.size).toMap
      val (pred, n) = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head
      val (ownL, predL, votesGot, agree) = got(q)
      assert(ownL == labels(q) && predL == pred && votesGot == n.toLong,
        s"query $q: got ${got(q)}, want ($pred, $n)")
      assert(agree == (if (ownL == predL) 1 else 0))
    }
  }

  test("s11 on a clustered corpus: recall >= 0.9 probing <= half the mass") {
    // The s11 scaladoc argues its 0.71 measured recall is the
    // ISOTROPIC fixture's probe ceiling (recall of any space-
    // partitioning index is bounded by the scanned fraction on such a
    // corpus — Weber et al. 1998), and that real cluster structure
    // does better while probing less. Measure that claim: a
    // mixture-of-Gaussians corpus (40 tight clusters on the 64-sphere,
    // ~50 vectors each — the production regime where cluster size is
    // on the order of the rerank budget, so the exact tier covers the
    // whole home cluster), the SAME pipeline with one sampled cell per
    // cluster, and only 4 of 40 cells probed.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dims = Similarity.Dims
    val nClusters = 40
    val n = 2000
    def gauss() = Array.fill(dims)(rnd.nextGaussian())
    def unit(v: Array[Double]) = {
      val s = math.sqrt(v.map(x => x * x).sum); v.map(_ / s)
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val centers = Array.fill(nClusters)(unit(gauss()))
    val vecs: IndexedSeq[(Long, Array[Double])] = (0 until n).map { i =>
      val c = centers(i % nClusters)
      val g = gauss()
      i.toLong -> unit(c.indices.map(j => c(j) + 0.05 * g(j)).toArray)
    }
    val unitDf = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "uv").repartition(4)
    // 1000 % 40 == 0, so vec_id 1000+c sits in cluster c: one sampled
    // cell per cluster, the PqSampleIds determinism pattern
    val cellIds = (0 until nClusters).map(c => (1000 + c).toLong)
    val nprobe = 4
    val got = Similarity.knnIvfPqOf(unitDf, cellIds, nprobe, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byId = vecs.toMap
    val truth = (0L until 20L).flatMap { q =>
      val qu = byId(q)
      vecs.filter(_._1 != q)
        .map { case (v, u) => (dot(qu, u), v) }
        .sortBy { case (d, v) => (-d, v) }
        .take(5).map { case (_, v) => (q, v) }
    }.toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    // probed fraction: CODE ROWS the nprobe cells hold, relative to
    // corpus size — under IvfPqAssign-way assignment each vector
    // contributes one code copy to each of its assigned cells, so the
    // honest scan measure counts copies, not primary members
    val cells = cellIds.map(byId)
    def cellsOf(u: Array[Double]): Seq[Int] = cells.zipWithIndex
      .map { case (cv, c) => (dot(u, cv), c) }
      .sortBy { case (d, c) => (-d, c) }
      .take(Similarity.IvfPqAssign).map(_._2)
    val cellMass = vecs.flatMap { case (_, u) => cellsOf(u) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val fracs = (0L until 20L).map { q =>
      val qu = byId(q)
      cells.zipWithIndex.map { case (cv, c) => (dot(qu, cv), c) }
        .sortBy { case (d, c) => (-d, c) }.take(nprobe)
        .map { case (_, c) => cellMass.getOrElse(c, 0) }.sum.toDouble / n
    }
    // ideal = IvfPqAssign·nprobe/nClusters = 0.2; uneven cluster draw
    // pushes individual queries a few points above it — 0.3 still
    // proves "well under half the mass" with 2-way assignment
    assert(fracs.max <= 0.3,
      s"probed fraction ${fracs.max} — clusters not separating")
    assert(recall >= 0.9,
      s"clustered-corpus recall $recall probing ${fracs.max} of the mass")
    info(f"clustered-fixture recall $recall%.3f probing ${fracs.max}%.3f of the corpus")
  }

  test("s11: plan has no cartesian product and ranks via the bounded " +
      "heap, not a window sort") {
    val p = Similarity.knnIvfPq(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("topk_by"), p)
    // the candidate stage is an equi-join on cell id with the tiny
    // probe list broadcast — never a corpus-side cross join
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
