package graft.cli

import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.SparkSession
import graft.core.Session
import graft.etl.Cleaning
import graft.io.{Sinks, Sources}
import graft.ml.{Evaluate, Models, TrainJob}
import graft.stats.Statistics
import graft.viz.VizQueries

/** Command-line entry points mirroring the reference's batch scripts
  * (SURVEY §3 entry points A/B/C):
  *
  * {{{
  *   graft.cli.Main clean  <input.csv> <outDir>       // script 1
  *   graft.cli.Main stats  <cleaned>   <outDir>       // script 2
  *   graft.cli.Main train  <model> <cleaned> <outDir> [cv]  // scripts 3-10
  *   graft.cli.Main viz    <vizData>   <outDir>       // viz notebooks' inputs
  *   graft.cli.Main curate <tableDir>  <outDir> [tokenBudget]  // llm pipeline
  *   graft.cli.Main index  ivf|lsh|pq <tableDir> <indexDir> [k] // ANN build
  *   graft.cli.Main index  lsh-append|ivf-append <batch.parquet> <indexDir> // ingest
  *   graft.cli.Main search ivf|lsh <indexDir> <outDir> [nprobe] // ANN query
  *   graft.cli.Main search pq <tableDir> <indexDir> <outDir>    // ADC query
  *   graft.cli.Main layout zorder  <in> <out> <numFiles> <c1,c2[,…]>
  *   graft.cli.Main layout manifest <table> <out> <c1,c2[,…]>  // zone maps
  *   graft.cli.Main layout sort    <in> <out> <numFiles> <c1[,…]>
  *   graft.cli.Main layout compact <in> <out> [targetMB]
  *   graft.cli.Main ingest init-dedup <corpus> <indexTable>     // fp-index bootstrap
  *   graft.cli.Main ingest dedup <watchDir> <indexTable> <acceptedDir> <ckDir>
  *   graft.cli.Main ingest curate <watchDir> <indexTable> <acceptedDir> <ckDir> // + quality gate
  *   graft.cli.Main ingest init-neardup <corpusDir> <bandTable> <hsetTable> // d2/d3 state bootstrap
  *   graft.cli.Main ingest neardup <watchDir> <bandTable> <hsetTable> <acceptedDir> <ckDir>
  *   graft.cli.Main ingest init-drift <corpusDir> <baselineDir>   // per-dim mean table
  *   graft.cli.Main ingest drift <watchDir> <baselineDir> <outDir> <ckDir>
  *   graft.cli.Main ingest ann   <watchDir> <lshIndexDir> <ckDir>
  *   graft.cli.Main ingest benford <watchDir> <outDir> <ckDir>   // first-digit χ² feed
  *   graft.cli.Main ingest cms   <watchDir> <sketchDir> <ckDir>  // live CMS
  *   graft.cli.Main ingest kmv   <watchDir> <sketchDir> <ckDir>  // live KMV
  *   graft.cli.Main lm train <tableDir> <modelDir>   // persisted bigram LM
  *   graft.cli.Main lm score <modelDir> <docs> <outDir>  // perplexity scores
  *   graft.cli.Main dsir train <tableDir> <modelDir>  // persist DSIR ratios
  *   graft.cli.Main dsir score <modelDir> <docs> <outDir> // importance wts
  *   graft.cli.Main ingest upsert <watchDir> <tablePath> <k1[,k2…]> <orderCol> <ckDir>
  *   graft.cli.Main ingest scd2   <watchDir> <tablePath> <k1[,k2…]> <tsCol> <ckDir>
  *   graft.cli.Main chunk <tableDir> <outDir> [chars|tokens]    // doc chunking
  *   graft.cli.Main bpe train <tableDir> <modelDir>   // persist merge table
  *   graft.cli.Main bpe count <modelDir> <docs> <outDir>  // apply stored merges
  *   graft.cli.Main bpe count <tableDir> <outDir>     // inline train+apply (t16)
  *   graft.cli.Main spans <tableDir> <outDir> [report|cut]      // span dedup
  *   graft.cli.Main split <tableDir> <outDir>   // leakage-free train/val/test
  *   graft.cli.Main phash-index <tableDir> <sigTable>   // perceptual sigs, stored
  *   graft.cli.Main phash-check <sigTable> <batchDir> <outDir> // near-dups vs index
  *   graft.cli.Main apss-index <tableDir> <termTable>   // APSS state, stored
  *   graft.cli.Main apss-join  <termTable> <outDir>     // exact join from index
  *   graft.cli.Main bm25-index <tableDir> <table>    // inverted index, stored
  *   graft.cli.Main bm25-append <batch.parquet> <table>   // O(batch) ingest
  *   graft.cli.Main bm25-search <table> <outDir>     // t11 from the index
  *   graft.cli.Main cluster-index <tableDir> <clusterTable>   // d8 once, stored
  *   graft.cli.Main dedup-apply <tableDir> <clusterTable> <outDir>  // indexed d9
  *   graft.cli.Main split <tableDir> <clusterTable> <outDir>  // indexed d14
  *   graft.cli.Main maintain upsert|delete|diff <base> <other> <k1[,k2…]> <out>
  * }}}
  *
  * `<model>` ∈ lr, dt, rf, gbt, svc, nb, mlp. Inputs are header CSV (parity
  * with the reference) or parquet (preferred; detected by extension).
  * Outputs: parity CSVs via [[Sinks]].
  */
object Main {

  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  /** Format dispatch: a `.csv` path OR a Spark CSV output directory
    * (part-*.csv files) reads as header CSV — the reference passes CSV
    * directories between scripts, so `stats` must consume `clean`'s
    * own output. Everything else reads as parquet.
    *
    * Directory sniffing goes through the Hadoop `FileSystem` resolved
    * from the path itself, so `hdfs://`/`s3a://`/`file:` URIs all
    * dispatch correctly — `java.io.File` would silently misclassify
    * any object-store CSV directory as parquet.
    */
  private[graft] def read(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isCsvDir =
      try fs.getFileStatus(p).isDirectory &&
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(p, "*.csv")))
          .exists(_.nonEmpty)
      catch { case _: java.io.FileNotFoundException => false }
    if (path.endsWith(".csv") || isCsvDir) Sources.csvInferred(spark, path)
    else Sources.parquet(spark, path)
  }

  def run(spark: SparkSession, args: Seq[String]): Unit = args match {
    case Seq("clean", in, out) =>
      val raw = read(spark, in).persist()
      Sinks.csv(Cleaning.vizDataset(raw), s"$out/Flight_Data_Visualization",
        singleFile = true)
      Sinks.csv(Cleaning.cleaned(raw), s"$out/Full_Cleaned_Data", singleFile = true)

    case Seq("stats", in, out) =>
      val cleaned = read(spark, in).persist()
      val sel = Statistics.analyze(cleaned)
      Sinks.tinyCsv(Seq("selected_features"), sel.uniCat.map(Seq(_)),
        s"$out/univariate_categorical_feature_selection.csv")
      Sinks.tinyCsv(Seq("selected_features"), sel.uniNum.map(Seq(_)),
        s"$out/univariate_numerical_feature_selection.csv")
      Sinks.tinyCsv(Seq("selected_features"), sel.varNum.map(Seq(_)),
        s"$out/variance_feature_selection.csv")
      Sinks.tinyCsv(Seq("features", "pValue", "degreesOfFreedom", "statistics"),
        sel.chi.map(c => Seq(c._1, c._2, c._3, c._4)),
        s"$out/chi_square_statistic.csv")
      corrCsv(sel.corrBefore, s"$out/corr_data_before.csv")
      corrCsv(sel.corrAfter, s"$out/corr_data_after.csv")

    case Seq("train", model, in, out) => train(spark, model, in, out, cv = false)
    case Seq("train", model, in, out, "cv") => train(spark, model, in, out, cv = true)

    case Seq("viz", in, out) =>
      val viz = read(spark, in).persist()
      Sinks.csv(VizQueries.flightsPerMonth(viz),
        s"$out/Number_flights_vs_Months", singleFile = true)
      Sinks.csv(VizQueries.flightsPerWeekday(viz),
        s"$out/Number_flights_vs_Weeks", singleFile = true)
      Sinks.csv(VizQueries.distancePerYear(viz),
        s"$out/Distance_vs_Year", singleFile = true)
      Sinks.csv(VizQueries.flightsPerDelayGroup(viz),
        s"$out/Number_flights_vs_DelayGroup", singleFile = true)
      Sinks.csv(VizQueries.airlineDelayGroupCount(viz),
        s"$out/Airline_DelayGroup_Count", singleFile = true)

    case Seq("curate", in, out) => curate(spark, in, out, budget = 2000L)
    case Seq("curate", in, out, budget) => curate(spark, in, out, budget.toLong)

    // chunking + span dedup as batch jobs over a documents table dir
    case Seq("chunk", in, out) =>
      graft.llm.TextAnalysis.chunkDocs(spark, in)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("chunk", in, out, "tokens") =>
      graft.llm.TextAnalysis.chunkDocsTokens(spark, in)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    // BPE tokenizer lifecycle: `bpe train` learns the merge table over
    // the corpus (the t15 loop), `bpe count` applies it corpus-wide
    // LM lifecycle: train once (persisted model tables), score any doc
    // batch from the stored model — the CCNet perplexity filter's
    // production shape
    case Seq("lm", "train", in, model) =>
      graft.llm.LanguageModel.writeModel(spark, in, model)
    case Seq("lm", "score", model, in, out) =>
      graft.llm.LanguageModel.scoreFromModel(spark, model,
          read(spark, if (new java.io.File(s"$in/documents.parquet").exists())
            s"$in/documents.parquet" else in))
        .write.mode("overwrite").parquet(out)

    // DSIR lifecycle: estimate the hashed importance ratios once,
    // score any candidate batch from the stored table (c14's posture)
    case Seq("dsir", "train", in, model) =>
      graft.llm.Curation.writeDsirModel(spark, in, model)
    case Seq("dsir", "score", model, in, out) =>
      graft.llm.Curation.dsirScoreFromModel(spark, model,
          read(spark, if (new java.io.File(s"$in/documents.parquet").exists())
            s"$in/documents.parquet" else in))
        .write.mode("overwrite").parquet(out)

    case Seq("bpe", "train", in, model) =>
      graft.llm.TextAnalysis.writeBpeModel(spark, in, model)
    // 5-arg form: score a doc batch from the STORED merge table — no
    // training loop in the plan (the `lm score` posture)
    case Seq("bpe", "count", model, in, out) =>
      graft.llm.TextAnalysis.bpeCountsFromModel(spark, model,
          read(spark, if (new java.io.File(s"$in/documents.parquet").exists())
            s"$in/documents.parquet" else in))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("bpe", "count", in, out) =>
      graft.llm.TextAnalysis.bpeTokenCounts(spark, in)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("spans", in, out) =>
      graft.llm.Dedup.dupSpans(spark, in)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("spans", in, out, "cut") =>
      graft.llm.Dedup.spanDedupApply(spark, in)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    // leakage-free split assignment (d14): split routed by near-dup
    // cluster so no near-duplicate pair straddles train/val/test
    case Seq("split", in, out) =>
      graft.llm.Dedup.splitLeakfree(spark, in)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    // near-dup cluster index lifecycle: `cluster-index` runs the d8
    // resolution ONCE and stores (doc_id, cluster_id, keep) bucketed
    // by doc_id; the -indexed twins of apply/split then read the
    // stored table — no shingling, LSH, or iteration in their plans
    // APSS term-index lifecycle: `apss-index` materializes the full
    // per-(doc, term) TF-IDF state bucketed by term hash; `apss-join`
    // replays the exact similarity join from the stored table — no
    // tokenization, df aggregation, or window in the plan
    // perceptual-hash index lifecycle: `phash-index` decodes and
    // signs the corpus once (banded layout bucketed by band value);
    // `phash-check` routes a new batch's bands to the stored buckets
    // uniform index lifecycle over the graft.index registry: every
    // persisted index/model family builds and appends through one
    // surface (the family-specific commands below remain as typed
    // probes and back-compat spellings)
    case Seq("index", "list") =>
      println(graft.index.Indexes.describe())
    case Seq("index", "build", family, in, dest) =>
      graft.index.Indexes.build(spark, family, in, dest)
    case Seq("index", "append", family, in, dest) =>
      graft.index.Indexes.append(spark, family, read(spark, in), dest)

    case Seq("phash-index", in, table) =>
      graft.llm.Multimodal.writePhashIndex(spark, in, table)
    case Seq("phash-check", table, in, out) =>
      graft.llm.Multimodal.phashPairsFromIndex(spark, table,
          graft.llm.Multimodal.mediaTable(spark, in))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("apss-index", in, table) =>
      graft.llm.Dedup.writeApssIndex(spark, in, table)
    case Seq("apss-join", table, out) =>
      graft.llm.Dedup.apssFromIndex(spark, table)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("apss-sketch-join", table, out) =>
      graft.llm.Dedup.apssApproxFromIndex(spark, table)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    // BM25 inverted-index lifecycle: `bm25-index` materializes the
    // full postings (bucketed by term), doc lengths, and corpus stats
    // once; `bm25-search` scores a query from the stored tables with
    // no tokenization or corpus text scan in the plan
    case Seq("bm25-index", in, table) =>
      graft.llm.TextAnalysis.writeBm25Index(spark, in, table)
    case Seq("bm25-append", in, table) =>
      graft.llm.TextAnalysis.appendToBm25Index(spark, read(spark, in), table)
    case Seq("bm25-search", table, out) =>
      graft.llm.TextAnalysis.bm25FromIndex(spark, table)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("cluster-index", in, table) =>
      graft.llm.Dedup.writeClusterIndex(spark, in, table)
    case Seq("dedup-apply", in, table, out) =>
      graft.llm.Dedup.dedupApplyIndexed(spark, in, table)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("split", in, table, out) =>
      graft.llm.Dedup.splitLeakfreeIndexed(spark, in, table)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)

    // ANN index lifecycle as batch jobs: `index` is the once-per-
    // corpus write step (KMeans IVF cells + centroid table, or LSH
    // hyperplane buckets), `search` reads ONLY the persisted layout —
    // no fit, no re-bucketing in the plan (the spec-pinned property of
    // the *FromIndex paths). Results land as parquet (q_id, vec_id,
    // sim, rk).
    case Seq("index", "ivf", in, idx) =>
      graft.llm.Similarity.buildIvfIndex(spark, in, idx)
    case Seq("index", "ivf", in, idx, k) =>
      graft.llm.Similarity.buildIvfIndex(spark, in, idx, k.toInt)
    case Seq("index", "pq", in, idx) =>
      graft.llm.Similarity.buildPqIndex(spark, in, idx)
    case Seq("search", "pq", in, idx, out) =>
      graft.llm.Similarity.knnPqFromIndex(spark, in, idx)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("index", "lsh", in, idx) =>
      graft.llm.Similarity.buildLshIndex(spark, in, idx)
    case Seq("index", "lsh-append", in, idx) =>
      graft.llm.Similarity.appendToLshIndex(spark, read(spark, in), idx)
    case Seq("index", "ivf-append", in, idx) =>
      graft.llm.Similarity.appendToIvfIndex(spark, read(spark, in), idx)
    case Seq("search", "ivf", idx, out) =>
      graft.llm.Similarity.knnIvfFromIndex(spark, idx)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("search", "ivf", idx, out, nprobe) =>
      graft.llm.Similarity.knnIvfFromIndex(spark, idx, nprobe.toInt)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("search", "lsh", idx, out) =>
      graft.llm.Similarity.knnLshFromIndex(spark, idx)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)

    // streaming ingest as argv jobs, the reference's job-per-script
    // pattern: each run DRAINS what the watched directory holds right
    // now, commits its checkpoint, and exits (the Trigger.AvailableNow
    // posture — `processAllAvailable` then stop). Re-running with the
    // same checkpoint picks up only files that arrived since, so a
    // cron-style loop of these jobs IS the continuous pipeline, and a
    // file fed twice across runs is still processed exactly once.
    // `init-dedup` bootstraps the bucketed fingerprint index the dedup
    // ingest anti-joins against (point it at an empty-schema corpus to
    // start from nothing); the ANN ingest appends to an `index lsh`
    // layout. The watched directory must hold at least one parquet
    // file on the FIRST run — the stream's schema is read from it.
    case Seq("ingest", "init-dedup", in, table) =>
      graft.ops.Partitioning.writeBucketed(
        graft.llm.Dedup.fingerprintsOf(read(spark, in))
          .select("fp").distinct(),
        table, "fp", 8)
    case Seq("ingest", "dedup", watch, table, accepted, ck) =>
      val q = graft.streaming.IngestDedup.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), table, accepted, ck)
      try q.processAllAvailable() finally q.stop()
    // `curate`: the dedup ingest with the Gopher-rule quality gate in
    // front — rejected docs are dropped (never indexed), duplicates of
    // already-accepted docs anti-join away; the streaming form of the
    // batch curation pipeline's first stages
    case Seq("ingest", "curate", watch, table, accepted, ck) =>
      val q = graft.streaming.IngestDedup.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), table, accepted, ck,
        gate = graft.streaming.IngestDedup.qualityGate)
      try q.processAllAvailable() finally q.stop()
    // `init-neardup` bootstraps BOTH persisted sides of the near-dup
    // gate (band probe + shingle verify); `neardup` then drains the
    // watch dir through IngestNearDup — the streaming d2/d3 pipeline
    case Seq("ingest", "init-neardup", in, bands, hsets) =>
      val corpus = read(spark, in)
      graft.llm.Dedup.writeBandIndexOf(corpus, bands)
      graft.llm.Dedup.writeShingleIndexOf(corpus, hsets)
    case Seq("ingest", "neardup", watch, bands, hsets, accepted, ck) =>
      val q = graft.streaming.IngestNearDup.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), bands, hsets, accepted, ck)
      try q.processAllAvailable() finally q.stop()
    // drift: continuous embedding-drift monitoring vs a release
    // baseline (init writes the per-dim mean table from a corpus dir)
    case Seq("ingest", "init-drift", in, baseline) =>
      graft.streaming.IngestDrift.writeBaseline(spark, in, baseline)
    case Seq("ingest", "drift", watch, baseline, out, ck) =>
      val q = graft.streaming.IngestDrift.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), baseline, out, ck)
      try q.processAllAvailable() finally q.stop()
    // `benford`: continuous first-digit monitoring of an amounts feed
    // (q86's streaming twin — the expectation is arithmetic, no
    // baseline artifact)
    case Seq("ingest", "benford", watch, out, ck) =>
      val q = graft.streaming.IngestBenford.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), out, ck)
      try q.processAllAvailable() finally q.stop()
    case Seq("ingest", "ann", watch, idx, ck) =>
      val q = graft.streaming.IngestAnn.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), idx, ck)
      try q.processAllAvailable() finally q.stop()
    // `cms`: continuous count-min sketch maintenance — one grid per
    // micro-batch, summed at read time (t19's streaming twin)
    case Seq("ingest", "cms", watch, sketch, ck) =>
      val q = graft.streaming.IngestCms.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), sketch, ck)
      try q.processAllAvailable() finally q.stop()
    // `kmv`: live distinct-cardinality sketch — one k-min array per
    // micro-batch, the t20 estimator over the merged set at read time
    case Seq("ingest", "kmv", watch, sketch, ck) =>
      val q = graft.streaming.IngestKmv.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), sketch, ck)
      try q.processAllAvailable() finally q.stop()
    // `upsert`: CDC apply — the watched change stream merges into the
    // keyed state table per micro-batch (latest orderCol wins)
    case Seq("ingest", "upsert", watch, table, keys, orderCol, ck) =>
      val q = graft.streaming.IngestUpsert.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), table, keys.split(",").toSeq, orderCol, ck)
      try q.processAllAvailable() finally q.stop()
    // `scd2`: CDC apply WITH history — each change closes the key's
    // open interval and appends a new version (type-2 dimension)
    case Seq("ingest", "scd2", watch, table, keys, tsCol, ck) =>
      val q = graft.streaming.IngestScd2.run(
        spark.readStream.schema(Sources.parquet(spark, watch).schema)
          .parquet(watch), table, keys.split(",").toSeq, tsCol, ck)
      try q.processAllAvailable() finally q.stop()

    // data-layout maintenance jobs — the write-time half of the data-
    // skipping story ([[graft.ops.Partitioning]]); run once per table,
    // every later scan benefits
    case Seq("layout", "zorder", in, out, nFiles, cols) =>
      graft.ops.Partitioning.writeZOrdered(read(spark, in), out,
        nFiles.toInt, cols.split(",").toSeq)
    case Seq("layout", "sort", in, out, nFiles, cols) =>
      graft.ops.Partitioning.writeSorted(read(spark, in), out,
        nFiles.toInt, cols.split(",").toIndexedSeq: _*)
    // `manifest`: file-level min/max zone-map table over an existing
    // parquet layout — planning-time file pruning for range filters
    case Seq("layout", "manifest", in, out, cols) =>
      graft.ops.Partitioning.writeManifest(spark, in, out,
        cols.split(",").toSeq)
    case Seq("layout", "compact", in, out) =>
      graft.ops.Partitioning.writeCompacted(read(spark, in), out)
    case Seq("layout", "compact", in, out, mb) =>
      graft.ops.Partitioning.writeCompacted(read(spark, in), out,
        mb.toLong << 20)

    // table-maintenance jobs ([[graft.ops.Maintenance]]): MERGE-style
    // upsert, keyed erasure (takedown), and release diffing as the
    // same argv-job shape the layout/ingest families use. Keys are a
    // comma list for composite keys.
    case Seq("maintain", "upsert", base, updates, keys, out) =>
      graft.ops.Maintenance.upsertByKey(read(spark, base),
          read(spark, updates), keys.split(",").toSeq)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("maintain", "delete", base, victims, keys, out) =>
      graft.ops.Maintenance.deleteByKeys(read(spark, base),
          read(spark, victims), keys.split(",").toSeq)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    case Seq("maintain", "diff", oldT, newT, keys, out) =>
      graft.ops.Maintenance.snapshotDiff(read(spark, oldT),
          read(spark, newT), keys.split(",").toSeq)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)

    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      System.err.println(
        "usage: clean|stats|train|viz|curate|index|search|layout ... (see scaladoc)")
  }

  /** The c8 curation release flow as a batch job: every stage boundary
    * is a DURABLE parquet artifact under `<out>/` (`a_rules`,
    * `b_decontaminated`, `c_deduped`, `d_sampled`, final `shards`) and
    * each stage reads the previous stage's written table back from
    * disk — the real 100 TB posture (restartable from any boundary;
    * per-stage cost and size visible as files) that the library form's
    * in-memory checkpoints stand in for. `in` is the table directory
    * holding `documents.parquet`.
    */
  private def curate(spark: SparkSession, in: String, out: String,
      budget: Long): Unit = {
    val shards = graft.llm.Curation.curateFullStaged(spark, in, budget,
      (name, df) => {
        val path = s"$out/$name"
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
        Sources.parquet(spark, path)
      })
    shards.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$out/shards")
  }

  /** Reference output directory per model (`Scripts/3-10_...py` final
    * `to_csv` blocks).
    */
  private val modelDirs = Map(
    "lr" -> "Logistic_Regression", "dt" -> "Decision_Tree",
    "rf" -> "Random_Forest", "gbt" -> "Gradient_Boosted_Trees",
    "svc" -> "Linear_SVC", "nb" -> "Naive_Bayes",
    "mlp" -> "Multi_Layer_Perceptron")

  /** The gbt file name drops the plural "s" while its directory keeps
    * it — reference quirk (`Scripts/6_...py:117-119`), preserved.
    */
  private def fileBase(model: String): String =
    if (model == "gbt") "Gradient_Boosted_Tree" else modelDirs(model)

  private def metricRows(best: Seq[(String, Any)], m: Evaluate.Metrics)
      : Seq[Seq[Any]] =
    best.map { case (k, v) => Seq[Any](k, v) } ++ Seq(
      Seq("area_ROC", m.areaRoc), Seq("accuracy", m.accuracy),
      Seq("tpr", m.tpr), Seq("fpr", m.fpr),
      Seq("precision", m.precision), Seq("f1_score", m.f1))

  private def bestRows(best: Option[ParamMap]): Seq[(String, Any)] =
    best.toSeq.flatMap(_.toSeq.sortBy(_.param.name)
      .map(pp => pp.param.name -> pp.value))

  /** N×N correlation matrix as the reference's pandas dump — numbered
    * header `0..n-1`, no index column (`pd.DataFrame(r2).to_csv(
    * index=False)`, `Scripts/2_...py:63,87`).
    */
  private def corrCsv(m: org.apache.spark.ml.linalg.Matrix, path: String): Unit =
    Sinks.tinyCsv((0 until m.numCols).map(_.toString),
      m.rowIter.toSeq.map(_.toArray.toSeq), path)

  /** The reference's full per-script training surface: every model
    * trains ×3 feature sets (full / univariate / variance —
    * `Scripts/3_...py:85-87`) and writes one metric CSV per set.
    * lr additionally runs the no-grid arm (`reg == 0`,
    * `Scripts/3_...py:123-125`); mlp sweeps topologies and argmaxes
    * ROC-AUC (`Scripts/9_...py:83-110`); `cv` switches lr's search to
    * 10-fold CV (`Scripts/10_...py`).
    */
  private def train(spark: SparkSession, model: String, in: String,
      out: String, cv: Boolean): Unit = {
    val cleaned = read(spark, in).persist()
    val sets = TrainJob.featureSets(cleaned, Statistics.analyze(cleaned))
    val setNames = Map("full" -> "Full", "uni" -> "Uni", "var" -> "Var")
    model match {
      case "mlp" =>
        sets.foreach { case (sn, cat, num) =>
          val (layers, m) = TrainJob.runMlp(cleaned, cat, num)
          Sinks.tinyCsv(Seq("parameter", "values"),
            metricRows(Seq("layers" -> layers.mkString("[", ", ", "]")), m),
            s"$out/${modelDirs("mlp")}/${fileBase("mlp")}_${setNames(sn)}_Data_Metrics.csv")
        }
      case _ =>
        val (estimator, grid) = model match {
          case "lr"  => Models.logisticRegression()
          case "dt"  => Models.decisionTree()
          case "rf"  => Models.randomForest()
          case "gbt" => Models.gbt()
          case "svc" => Models.linearSvc()
          case "nb"  => Models.naiveBayes()
          case m => sys.error(s"unknown model $m (lr|dt|rf|gbt|svc|nb|mlp)")
        }
        val dir = (if (cv) "CV_" else "") + modelDirs(model)
        val base = (if (cv) "CV_" else "") + fileBase(model)
        val regTag = if (model == "lr") "Regularization_" else ""
        sets.foreach { case (sn, cat, num) =>
          val r = TrainJob.run(cleaned, cat, num, estimator, Some(grid),
            cvFolds = if (cv) Some(10) else None)
          Sinks.tinyCsv(Seq("parameter", "values"),
            metricRows(bestRows(r.best), r.metrics),
            s"$out/$dir/${base}_$regTag${setNames(sn)}_Data_Metrics.csv")
          if (model == "lr" && !cv) {
            val plain = TrainJob.run(cleaned, cat, num, estimator, None)
            Sinks.tinyCsv(Seq("parameter", "values"),
              metricRows(Nil, plain.metrics),
              s"$out/$dir/${base}_${setNames(sn)}_Data_Metrics.csv")
          }
        }
    }
  }
}
