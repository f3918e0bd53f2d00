package graft

import java.nio.file.{Files, Paths}
import graft.core.Schemas
import graft.etl.AirlineFixture
import graft.io.{Sinks, Sources}

/** Sources/sinks round-trips and the CLI clean job end-to-end. */
class IoCliSpec extends SparkSpec {

  test("raw airline schema has 61 columns; cleaned has the stage-2 set") {
    assert(Schemas.rawAirline.length == 61)
    assert(Schemas.cleanedAirline.fieldNames.contains("Delay_Status"))
  }

  test("csv sink + inferred source round-trip") {
    val dir = Files.createTempDirectory("graft_io").toString
    val df = AirlineFixture.generate(spark, 200)
    Sinks.csv(df, s"$dir/out", singleFile = true)
    val back = Sources.csvInferred(spark, s"$dir/out")
    assert(back.count() == 200)
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("cli format dispatch resolves CSV dirs through Hadoop FS (file: URI)") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val df = AirlineFixture.generate(spark, 50)
    Sinks.csv(df, s"$dir/csvout", singleFile = true)
    df.write.mode("overwrite").parquet(s"$dir/pqout")
    // an explicit file: URI must dispatch the same as a bare path —
    // the sniff goes through the path's own FileSystem, not java.io
    val viaCsv = graft.cli.Main.read(spark, s"file:$dir/csvout")
    assert(viaCsv.count() == 50 && viaCsv.columns.toSet == df.columns.toSet)
    val viaParquet = graft.cli.Main.read(spark, s"file:$dir/pqout")
    assert(viaParquet.count() == 50)
    // missing path: dispatch must not throw while sniffing (the read
    // itself will fail later, as it should)
    try { graft.cli.Main.read(spark, s"file:$dir/nope"); () }
    catch { case _: org.apache.spark.sql.AnalysisException => () }
  }

  test("tinyCsv + columnList round-trip (S3/S4 driver-side path)") {
    val dir = Files.createTempDirectory("graft_tiny").toString
    Sinks.tinyCsv(Seq("selected_features"),
      Seq(Seq("AirTime"), Seq("Month")), s"$dir/sel.csv")
    val list = Sources.columnList(spark, s"$dir/sel.csv")
    assert(list == Seq("AirTime", "Month"))
  }

  test("permissive csv captures malformed rows instead of failing") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_perm").toString
    Files.writeString(Paths.get(s"$dir/in.csv"),
      "a,b\n1,x\nnot_an_int,y\n3,z\n")
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val df = Sources.csvPermissive(spark, s"$dir/in.csv", schema).cache()
    assert(df.count() == 3)
    val bad = df.filter(df("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record")
      .startsWith("not_an_int"))
    assert(df.filter(df("_corrupt_record").isNull).count() == 2)
    df.unpersist()
  }

  test("json sink + source round-trip (declared schema and inferred)") {
    val dir = Files.createTempDirectory("graft_json").toString
    val df = AirlineFixture.generate(spark, 100)
    Sinks.json(df, s"$dir/out")
    val back = Sources.json(spark, s"$dir/out", df.schema)
    assert(back.count() == 100)
    // JSON reads are always-nullable — compare names and types
    assert(back.schema.map(f => (f.name, f.dataType))
      == df.schema.map(f => (f.name, f.dataType)))
    assert(Sources.jsonInferred(spark, s"$dir/out").count() == 100)
  }

  test("orc sink + source round-trip keeps schema and pushes filters down") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = AirlineFixture.generate(spark, 100)
    Sinks.orc(df, s"$dir/out")
    val back = Sources.orc(spark, s"$dir/out")
    assert(back.count() == 100)
    assert(back.schema.map(f => (f.name, f.dataType))
      == df.schema.map(f => (f.name, f.dataType)))
    // ORC must keep the same scan posture as parquet: predicate reaches
    // the reader as a pushed filter
    val filtered = back.filter(back("Year") === 2018)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("Year"), plan)
    assert(filtered.count() == df.filter(df("Year") === 2018).count())
  }

  test("writeCompacted collapses a small table to one file") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val df = AirlineFixture.generate(spark, 2000).repartition(16)
    graft.ops.Partitioning.writeCompacted(df, s"$dir/out")
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, s"expected 1 compacted file, got ${files.length}")
    assert(spark.read.parquet(s"$dir/out").count() == 2000)
  }

  test("cli layout jobs rewrite a table zordered / sorted / compacted") {
    val dir = Files.createTempDirectory("graft_layout").toString
    val src = "/root/testdata/sf0.001/lineitem.parquet"
    val total = spark.read.parquet(src).count()
    graft.cli.Main.run(spark,
      Seq("layout", "zorder", src, s"$dir/z", "8", "l_orderkey,l_partkey"))
    graft.cli.Main.run(spark,
      Seq("layout", "sort", src, s"$dir/s", "4", "l_quantity"))
    graft.cli.Main.run(spark, Seq("layout", "compact", src, s"$dir/c"))
    for ((p, files) <- Seq("z" -> 8, "s" -> 4, "c" -> 1)) {
      val got = new java.io.File(s"$dir/$p").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(got == files, s"$p: expected $files files, got $got")
      assert(spark.read.parquet(s"$dir/$p").count() == total, p)
    }
  }

  test("cli maintain jobs: upsert then delete then diff, chained through parquet") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_maintain").toString
    val src = "/root/testdata/sf0.001/documents.parquet"
    val base = spark.read.parquet(src).select("doc_id", "source", "n_chars")
    base.write.parquet(s"$dir/base")
    base.filter(col("doc_id") % 7 === 0)
      .withColumn("n_chars", col("n_chars") + 1)
      .write.parquet(s"$dir/upd")
    base.filter(col("doc_id") % 11 === 0).select("doc_id")
      .write.parquet(s"$dir/victims")
    graft.cli.Main.run(spark,
      Seq("maintain", "upsert", s"$dir/base", s"$dir/upd", "doc_id", s"$dir/v2"))
    graft.cli.Main.run(spark,
      Seq("maintain", "delete", s"$dir/v2", s"$dir/victims", "doc_id", s"$dir/v3"))
    graft.cli.Main.run(spark,
      Seq("maintain", "diff", s"$dir/base", s"$dir/v3", "doc_id", s"$dir/d"))
    val n = base.count()
    val n7 = base.filter(col("doc_id") % 7 === 0).count()
    val n11 = base.filter(col("doc_id") % 11 === 0).count()
    assert(spark.read.parquet(s"$dir/v2").count() == n)
    assert(spark.read.parquet(s"$dir/v3").count() == n - n11)
    // diff vs the original: the erased docs read as removed; the
    // surviving updated docs as changed
    val d = spark.read.parquet(s"$dir/d").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(d.count(_._2 == "removed") == n11)
    val changed = base.filter(
      col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0).count()
    assert(d.count(_._2 == "changed") == changed)
    assert(d.count(_._2 == "added") == 0)
  }

  test("cli clean job writes viz + cleaned parity CSVs") {
    val dir = Files.createTempDirectory("graft_cli").toString
    val fixture = s"$dir/raw"
    AirlineFixture.generate(spark, 500).write.parquet(fixture)
    graft.cli.Main.run(spark, Seq("clean", fixture, s"$dir/out"))
    assert(Sources.csvInferred(spark, s"$dir/out/Full_Cleaned_Data").count() > 0)
    val viz = Sources.csvInferred(spark, s"$dir/out/Flight_Data_Visualization")
    assert(viz.count() > 0)
    assert(viz.columns.contains("DelayGroup"))
  }

  test("cli viz job writes all 5 reference CSVs with notebook column names") {
    val dir = Files.createTempDirectory("graft_viz").toString
    val viz = graft.etl.Cleaning.vizDataset(AirlineFixture.generate(spark, 500))
    viz.write.parquet(s"$dir/viz")
    graft.cli.Main.run(spark, Seq("viz", s"$dir/viz", s"$dir/out"))
    // viz1 c2/c4/c6/c8 + viz2 c1 — file name -> columns the notebook reads
    val expected = Seq(
      "Distance_vs_Year" -> Seq("Year", "Distance"),
      "Number_flights_vs_Months" -> Seq("Month", "Number of Flights"),
      "Number_flights_vs_Weeks" -> Seq("Week", "Number of Flights"),
      "Number_flights_vs_DelayGroup" -> Seq("DelayGroup", "Number of Flights"),
      "Airline_DelayGroup_Count" -> Seq("Airline", "DelayGroup", "Number of Flights"))
    expected.foreach { case (file, cols) =>
      val df = Sources.csvInferred(spark, s"$dir/out/$file")
      assert(df.columns.toSeq == cols, file)
      assert(df.count() > 0, file)
    }
  }

  test("cli stats job writes selection lists, chi-square, and both corr matrices") {
    val dir = Files.createTempDirectory("graft_stats").toString
    val cleaned = graft.etl.Cleaning.cleaned(AirlineFixture.generate(spark, 500))
    cleaned.write.parquet(s"$dir/cleaned")
    graft.cli.Main.run(spark, Seq("stats", s"$dir/cleaned", s"$dir/out"))
    Seq("univariate_categorical_feature_selection.csv",
      "univariate_numerical_feature_selection.csv",
      "variance_feature_selection.csv", "chi_square_statistic.csv")
      .foreach(f => assert(Files.exists(Paths.get(s"$dir/out/$f")), f))
    // corr matrices: square, pandas-style numbered header (Scripts/2_...py:63,87)
    Seq("corr_data_before.csv", "corr_data_after.csv").foreach { f =>
      val lines = Files.readAllLines(Paths.get(s"$dir/out/$f"))
      val n = lines.get(0).split(",").length
      assert(lines.get(0).split(",").head == "0", f)
      assert(lines.size == n + 1, s"$f: expected $n data rows, got ${lines.size - 1}")
    }
  }

  test("cli chain: stats consumes clean's CSV output (inter-script handoff)") {
    val dir = Files.createTempDirectory("graft_chain").toString
    AirlineFixture.generate(spark, 400).write.parquet(s"$dir/raw")
    graft.cli.Main.run(spark, Seq("clean", s"$dir/raw", s"$dir/c"))
    // the reference passes header CSV between scripts — stats must work
    // off the inferred-schema read of clean's Full_Cleaned_Data
    graft.cli.Main.run(spark,
      Seq("stats", s"$dir/c/Full_Cleaned_Data", s"$dir/s"))
    val uniNum = Sources.columnList(spark,
      s"$dir/s/univariate_numerical_feature_selection.csv")
    assert(uniNum.nonEmpty)
    assert(Files.exists(Paths.get(s"$dir/s/corr_data_after.csv")))
    // third hand-off: viz off clean's visualization CSV directory
    graft.cli.Main.run(spark,
      Seq("viz", s"$dir/c/Flight_Data_Visualization", s"$dir/v"))
    val dg = Sources.csvInferred(spark, s"$dir/v/Number_flights_vs_DelayGroup")
    assert(dg.count() > 0)
  }

  test("cli train lr emits reg + plain metric CSVs for all 3 feature sets") {
    val dir = Files.createTempDirectory("graft_train").toString
    val cleaned = graft.etl.Cleaning.cleaned(AirlineFixture.generate(spark, 400))
    cleaned.write.parquet(s"$dir/cleaned")
    graft.cli.Main.run(spark, Seq("train", "lr", s"$dir/cleaned", s"$dir/out"))
    val base = s"$dir/out/Logistic_Regression/Logistic_Regression"
    Seq("Full", "Uni", "Var").foreach { set =>
      val reg = Sources.columnList(spark, s"${base}_Regularization_${set}_Data_Metrics.csv")
      // grid best params (regParam, elasticNetParam) + six metrics
      assert(reg.size == 8, s"$set reg rows: $reg")
      val plain = Sources.columnList(spark, s"${base}_${set}_Data_Metrics.csv")
      assert(plain == Seq("area_ROC", "accuracy", "tpr", "fpr", "precision", "f1_score"),
        s"$set plain rows: $plain")
    }
  }

  test("cli index/search run the ANN lifecycle from the persisted layout") {
    val dir = Files.createTempDirectory("graft_ann").toString
    graft.cli.Main.run(spark, Seq("index", "lsh", sfDir, s"$dir/idx"))
    graft.cli.Main.run(spark, Seq("search", "lsh", s"$dir/idx", s"$dir/out"))
    val got = spark.read.parquet(s"$dir/out")
      .collect().map(_.toSeq).toSet
    val lib = graft.llm.Similarity.knnLshFromIndex(spark, s"$dir/idx")
      .collect().map(_.toSeq).toSet
    assert(got == lib)
    assert(got.nonEmpty)
    // IVF flavor: build + search produce ranked rows from the layout
    graft.cli.Main.run(spark, Seq("index", "ivf", sfDir, s"$dir/iidx", "4"))
    graft.cli.Main.run(spark,
      Seq("search", "ivf", s"$dir/iidx", s"$dir/iout", "2"))
    val ivf = spark.read.parquet(s"$dir/iout")
    assert(ivf.count() > 0)
    assert(ivf.columns.toSet == Set("q_id", "vec_id", "sim", "rk"))
  }

  test("cli chunk and spans jobs write parquet equal to the library queries") {
    val dir = Files.createTempDirectory("graft_chunkspan").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    graft.cli.Main.run(spark, Seq("chunk", sfDir, s"$dir/c"))
    assert(rows(spark.read.parquet(s"$dir/c")) ==
      rows(graft.llm.TextAnalysis.chunkDocs(spark, sfDir)))
    graft.cli.Main.run(spark, Seq("chunk", sfDir, s"$dir/ct", "tokens"))
    assert(rows(spark.read.parquet(s"$dir/ct")) ==
      rows(graft.llm.TextAnalysis.chunkDocsTokens(spark, sfDir)))
    graft.cli.Main.run(spark, Seq("spans", sfDir, s"$dir/s"))
    assert(rows(spark.read.parquet(s"$dir/s")) ==
      rows(graft.llm.Dedup.dupSpans(spark, sfDir)))
    graft.cli.Main.run(spark, Seq("spans", sfDir, s"$dir/sc", "cut"))
    assert(rows(spark.read.parquet(s"$dir/sc")) ==
      rows(graft.llm.Dedup.spanDedupApply(spark, sfDir)))
    graft.cli.Main.run(spark, Seq("split", sfDir, s"$dir/sp"))
    assert(rows(spark.read.parquet(s"$dir/sp")) ==
      rows(graft.llm.Dedup.splitLeakfree(spark, sfDir)))
  }

  test("cli ingest dedup: drain-and-exit runs accept each doc exactly once") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val table = "ingest_cli_fp"
    // bootstrap the fp index from the first 100 docs (the known corpus)
    docs.filter(org.apache.spark.sql.functions.col("doc_id") < 100)
      .write.parquet(s"$dir/corpus")
    graft.cli.Main.run(spark, Seq("ingest", "init-dedup", s"$dir/corpus", table))
    // feed 1: 50 genuinely new docs + 20 dups of the known corpus
    new java.io.File(s"$dir/watch").mkdirs()
    docs.filter("doc_id >= 100 AND doc_id < 150")
      .union(docs.filter("doc_id < 20"))
      .write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark,
      Seq("ingest", "dedup", s"$dir/watch", table, s"$dir/acc", s"$dir/ck"))
    def accepted() = spark.read.parquet(s"$dir/acc")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    val a1 = accepted()
    assert(a1 == (100L until 150L), s"run 1 accepted: $a1")
    // feed 2 (same checkpoint): a fresh file with 25 new + 10 docs
    // already accepted by run 1 — only the new ones may land, and run
    // 1's files must be untouched
    docs.filter("doc_id >= 150 AND doc_id < 175")
      .union(docs.filter("doc_id >= 100 AND doc_id < 110"))
      .write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark,
      Seq("ingest", "dedup", s"$dir/watch", table, s"$dir/acc", s"$dir/ck"))
    val a2 = accepted()
    assert(a2 == (100L until 175L), s"run 2 accepted: $a2")
    // the index grew by exactly the accepted fps — no dup fp rows from
    // the replayed-across-runs docs
    val fps = spark.table(table).select("fp").collect().map(_.getString(0))
    assert(fps.length == fps.distinct.length, "duplicate fps in index")
    spark.sql(s"DROP TABLE $table")
  }

  test("cli ingest curate: quality-rejected docs never land or index; " +
      "dedup still applies behind the gate") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ingcur").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val passing = graft.llm.TextAnalysis.qualityRules(spark, sfDir)
      .filter(col("pass") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val table = "ingest_curate_fp"
    docs.filter(col("doc_id") < 100).write.parquet(s"$dir/corpus")
    graft.cli.Main.run(spark,
      Seq("ingest", "init-dedup", s"$dir/corpus", table))
    // a doc that fails the hash-ratio rule deterministically
    val bad = Seq((9000L, "#### #### #### ####")).toDF("doc_id", "text")
    new java.io.File(s"$dir/watch").mkdirs()
    docs.filter("doc_id >= 100 AND doc_id < 150")
      .union(bad)
      .union(docs.filter("doc_id < 20")) // dups of the known corpus
      .write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark,
      Seq("ingest", "curate", s"$dir/watch", table, s"$dir/acc", s"$dir/ck"))
    def accepted() = spark.read.parquet(s"$dir/acc")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect1 = (100L until 150L).filter(passing).toSet
    assert(accepted() == expect1, s"run 1: ${accepted()}")
    // the rejected doc was NOT indexed: re-feeding it (plus new docs)
    // still rejects it, while new passers land exactly once
    docs.filter("doc_id >= 150 AND doc_id < 175")
      .union(bad)
      .write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark,
      Seq("ingest", "curate", s"$dir/watch", table, s"$dir/acc", s"$dir/ck"))
    val expect2 = expect1 ++ (150L until 175L).filter(passing)
    assert(accepted() == expect2, s"run 2: ${accepted()}")
    assert(!accepted().contains(9000L))
    spark.sql(s"DROP TABLE $table")
  }

  test("cli ingest neardup: edited re-uploads drop across drain runs; " +
      "novel docs land exactly once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ingnd").toString
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull &&
        size(split(trim(col("text")), "\\s+")) >= 60)
      .select("doc_id", "text").orderBy("doc_id").limit(20)
    corpus.write.parquet(s"$dir/corpus")
    graft.cli.Main.run(spark, Seq("ingest", "init-neardup",
      s"$dir/corpus", "nd_cli_bands", "nd_cli_hsets"))
    def edit(text: String): String = {
      val w = text.trim.split("\\s+")
      (w.take(10) ++ Array("CLIEDIT") ++ w.drop(11)).mkString(" ")
    }
    val corpusText = corpus.select(trim(col("text"))).head.getString(0)
    def novel(tag: String): String =
      (0 until 60).map(i => s"ndcli_${tag}_w$i").mkString(" ")
    new java.io.File(s"$dir/watch").mkdirs()
    // feed 1: an edited corpus re-upload (drop) + a novel doc (land)
    Seq((9101L, edit(corpusText)), (9102L, novel("a")))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark, Seq("ingest", "neardup", s"$dir/watch",
      "nd_cli_bands", "nd_cli_hsets", s"$dir/acc", s"$dir/ck"))
    def accepted() = spark.read.parquet(s"$dir/acc")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(accepted() == Seq(9102L), s"run 1: ${accepted()}")
    // feed 2 (same checkpoint): an edited re-upload of run 1's novel
    // doc — the state grew, so it drops — plus one more novel
    Seq((9103L, edit(novel("a"))), (9104L, novel("b")))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark, Seq("ingest", "neardup", s"$dir/watch",
      "nd_cli_bands", "nd_cli_hsets", s"$dir/acc", s"$dir/ck"))
    assert(accepted() == Seq(9102L, 9104L), s"run 2: ${accepted()}")
    spark.sql("DROP TABLE nd_cli_bands")
    spark.sql("DROP TABLE nd_cli_hsets")
  }

  test("cli ingest drift: drained batches emit per-dim shift rows vs the " +
      "init-drift baseline") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_ingdrift").toString
    graft.cli.Main.run(spark, Seq("ingest", "init-drift", sfDir, s"$dir/bl"))
    val dim = spark.read.parquet(s"$dir/bl").count()
    new java.io.File(s"$dir/watch").mkdirs()
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").limit(10)
      .write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark, Seq("ingest", "drift", s"$dir/watch",
      s"$dir/bl", s"$dir/out", s"$dir/ck"))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == dim, "one shift row per dimension")
    assert(out.columns.toSet ==
      Set("dim", "n_b", "mean_b", "mean_base", "shift", "batch_id"))
    assert(out.agg(max(abs(col("shift")))).head.getDouble(0) < 1.0)
  }

  test("cli ingest ann: drained batches are searchable; equals one-shot build") {
    val dir = Files.createTempDirectory("graft_ingestann").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val c = org.apache.spark.sql.functions.col("vec_id")
    graft.llm.Similarity.buildLshIndexFrom(all.filter(c < 30), s"$dir/idx")
    new java.io.File(s"$dir/watch").mkdirs()
    all.filter(c >= 30).write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark,
      Seq("ingest", "ann", s"$dir/watch", s"$dir/idx", s"$dir/ck"))
    val inc = graft.llm.Similarity.knnLshFromIndex(spark, s"$dir/idx")
      .collect().map(_.toSeq).toSet
    graft.llm.Similarity.buildLshIndexFrom(all, s"$dir/full")
    val full = graft.llm.Similarity.knnLshFromIndex(spark, s"$dir/full")
      .collect().map(_.toSeq).toSet
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("cli curate writes every stage artifact and shards matching curateFull") {
    val dir = Files.createTempDirectory("graft_curate").toString
    graft.cli.Main.run(spark, Seq("curate", sfDir, s"$dir/out"))
    // every stage boundary is a durable parquet table, strictly
    // shrinking through the filters (rules → decontaminate → dedup →
    // sample), and each is a subset of the raw documents
    val stages = Seq("a_rules", "b_decontaminated", "c_deduped", "d_sampled")
    val counts = stages.map(n => spark.read.parquet(s"$dir/out/$n").count())
    assert(counts.zip(counts.tail).forall { case (x, y) => y <= x }, counts)
    assert(counts.last > 0, counts)
    // the final packed shard table equals the library form's result —
    // the parquet-boundary flow is the same pipeline, not a fork
    val viaCli = spark.read.parquet(s"$dir/out/shards")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val viaLib = graft.llm.Curation.curateFull(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(viaCli == viaLib)
  }

  test("cli train mlp argmaxes topologies and emits 3 metric CSVs") {
    val dir = Files.createTempDirectory("graft_mlp").toString
    val cleaned = graft.etl.Cleaning.cleaned(AirlineFixture.generate(spark, 200))
    cleaned.write.parquet(s"$dir/cleaned")
    graft.cli.Main.run(spark, Seq("train", "mlp", s"$dir/cleaned", s"$dir/out"))
    val base = s"$dir/out/Multi_Layer_Perceptron/Multi_Layer_Perceptron"
    Seq("Full", "Uni", "Var").foreach { set =>
      val rows = Sources.columnList(spark, s"${base}_${set}_Data_Metrics.csv")
      assert(rows.head == "layers", s"$set rows: $rows")
      assert(rows.size == 7, s"$set rows: $rows")
    }
  }

  test("cli lm train + score: persisted-model scores equal the inline t18 " +
      "query end to end") {
    val dir = Files.createTempDirectory("graft_lmcli").toString
    graft.cli.Main.run(spark, Seq("lm", "train", sfDir, s"$dir/model"))
    graft.cli.Main.run(spark,
      Seq("lm", "score", s"$dir/model", sfDir, s"$dir/scores"))
    val got = spark.read.parquet(s"$dir/scores").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val want = graft.llm.LanguageModel.perplexity(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got == want)
  }

  test("cli apss-index + apss-join: stored-index join equals the inline " +
      "sparse APSS end to end") {
    val dir = Files.createTempDirectory("graft_apsscli").toString
    graft.cli.Main.run(spark, Seq("apss-index", sfDir, "apss_cli_spec"))
    graft.cli.Main.run(spark,
      Seq("apss-join", "apss_cli_spec", s"$dir/pairs"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.trim(
              org.apache.spark.sql.functions.col("text"))), "\\s+").as("t"))
    assert(rows(spark.read.parquet(s"$dir/pairs")) ==
      rows(graft.llm.Dedup.apssSparseOf(docs)))
  }

  test("cli bm25-index + bm25-search: stored-index scoring equals the " +
      "inline t11 end to end") {
    val dir = Files.createTempDirectory("graft_bm25cli").toString
    graft.cli.Main.run(spark, Seq("bm25-index", sfDir, "bm25_cli_spec"))
    graft.cli.Main.run(spark, Seq("bm25-search", "bm25_cli_spec", s"$dir/hits"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(rows(spark.read.parquet(s"$dir/hits")) ==
      rows(graft.llm.TextAnalysis.bm25(spark, sfDir)))
  }

  test("cli ingest cms: drained file-stream sketch equals the one-shot " +
      "batch grid over the same corpus") {
    import org.apache.spark.sql.functions.{col, explode, lower, udaf => _}
    val dir = Files.createTempDirectory("graft_cmscli").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    new java.io.File(s"$dir/watch").mkdirs()
    docs.filter(col("doc_id") < 25).write.mode("append").parquet(s"$dir/watch")
    docs.filter(col("doc_id") >= 25).write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark,
      Seq("ingest", "cms", s"$dir/watch", s"$dir/sk", s"$dir/ck"))
    val merged = graft.streaming.IngestCms.readSketch(spark, s"$dir/sk")
    val oneShot = docs
      .select(explode(graft.llm.TextAnalysis.tokens(lower(col("text"))))
        .as("token"))
      .agg(org.apache.spark.sql.functions
        .udaf(graft.functions.CmsAggregator,
          org.apache.spark.sql.Encoders.STRING)
        .apply(col("token")))
      .head.getSeq[Long](0)
    assert(merged.toSeq == oneShot)
  }

  test("cli ingest benford: the drained batch's digit report equals the " +
      "q86 audit over the same amounts") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_benfordcli").toString
    val amounts = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_extendedprice").as("amount"))
    new java.io.File(s"$dir/watch").mkdirs()
    amounts.write.mode("append").parquet(s"$dir/watch")
    graft.cli.Main.run(spark,
      Seq("ingest", "benford", s"$dir/watch", s"$dir/out", s"$dir/ck"))
    val got = spark.read.parquet(s"$dir/out/batch_id=0").collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Double]("chi2"))).toMap
    val q86 = graft.queries.Extended.q86Benford(spark, sfDir).collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Double]("chi2"))).toMap
    assert(got == q86, "streaming report diverges from the batch audit")
  }
}
