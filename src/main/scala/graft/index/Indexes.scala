package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One persisted index family's LIFECYCLE: how a corpus release builds
  * it and how an incremental batch appends into it. Probing stays
  * family-typed (a KNN probe returns ranked neighbors, a phash probe
  * returns near-dup pairs, a model scores documents) — the facade
  * unifies what is genuinely uniform, not the query signatures.
  *
  * `build` takes (session, corpusDir, destination); `append` takes
  * (session, batchFrame, destination) and exists only for the families
  * whose layout supports O(batch) increments. `kind` names the storage
  * layout so operators know what a destination string means.
  */
final case class IndexFamily(
    name: String,
    kind: String, // "bucketed-table" | "parquet-layout" | "model-file"
    description: String,
    build: (SparkSession, String, String) => Unit,
    append: Option[(SparkSession, DataFrame, String) => Unit] = None)

/** The registry of every persisted index/model family (VERDICT r11
  * stretch #8): one place a new family registers its writer and
  * incremental reader, one uniform CLI surface (`index build|append`),
  * one spec that audits coverage. The per-family functions remain the
  * public API; the facade delegates, it does not wrap semantics.
  */
object Indexes {

  private def asMedia(df: DataFrame) = {
    val s = df.sparkSession
    import s.implicits._
    df.as[graft.llm.Multimodal.MediaRow]
  }

  val all: Seq[IndexFamily] = Seq(
    IndexFamily("fp", "bucketed-table",
      "exact-dedup content fingerprints, bucketed by fp",
      (s, in, t) => graft.llm.Dedup.writeFpIndex(s, in, t)),
    IndexFamily("shingle", "bucketed-table",
      "MinHash shingle sets, bucketed by doc_id",
      (s, in, t) => graft.llm.Dedup.writeShingleIndex(s, in, t),
      Some((s, b, t) => graft.llm.Dedup.appendToShingleIndex(s, b, t))),
    IndexFamily("band", "bucketed-table",
      "MinHash LSH bands (near-dup candidate probe side), bucketed " +
        "by band_key",
      (s, in, t) => graft.llm.Dedup.writeBandIndex(s, in, t),
      Some((s, b, t) => graft.llm.Dedup.appendToBandIndex(s, b, t))),
    IndexFamily("cluster", "bucketed-table",
      "near-dup cluster resolution (d8), bucketed by doc_id",
      (s, in, t) => graft.llm.Dedup.writeClusterIndex(s, in, t)),
    IndexFamily("apss", "bucketed-table",
      "per-(doc, term) TF-IDF state for the exact similarity join, " +
        "bucketed by term hash",
      (s, in, t) => graft.llm.Dedup.writeApssIndex(s, in, t)),
    IndexFamily("bm25", "bucketed-table",
      "inverted postings + doc lengths + corpus stats, bucketed by term",
      (s, in, t) => graft.llm.TextAnalysis.writeBm25Index(s, in, t),
      Some((s, b, t) => graft.llm.TextAnalysis.appendToBm25Index(s, b, t))),
    IndexFamily("phash", "bucketed-table",
      "banded perceptual signatures, bucketed by band value",
      (s, in, t) => graft.llm.Multimodal.writePhashIndex(s, in, t),
      Some((s, b, t) =>
        graft.llm.Multimodal.appendToPhashIndex(s, asMedia(b), t))),
    IndexFamily("ivf", "parquet-layout",
      "KMeans IVF cells + centroid table",
      (s, in, d) => graft.llm.Similarity.buildIvfIndex(s, in, d),
      Some((s, b, d) => graft.llm.Similarity.appendToIvfIndex(s, b, d))),
    IndexFamily("pq", "parquet-layout",
      "product-quantization codebooks + codes",
      (s, in, d) => graft.llm.Similarity.buildPqIndex(s, in, d)),
    IndexFamily("ivfpq", "parquet-layout",
      "coarse KMeans cells + residual-PQ codes per cell (inverted " +
        "lists) + centroids + codebooks",
      (s, in, d) => graft.llm.Similarity.buildIvfPqIndex(s, in, d),
      Some((s, b, d) => graft.llm.Similarity.appendToIvfPqIndex(s, b, d))),
    IndexFamily("lsh", "parquet-layout",
      "hyperplane LSH buckets + plane table",
      (s, in, d) => graft.llm.Similarity.buildLshIndex(s, in, d),
      Some((s, b, d) => graft.llm.Similarity.appendToLshIndex(s, b, d))),
    IndexFamily("bpe", "model-file",
      "learned BPE merge table",
      (s, in, m) => graft.llm.TextAnalysis.writeBpeModel(s, in, m)),
    IndexFamily("lm", "model-file",
      "bigram language model + unigram backoff",
      (s, in, m) => graft.llm.LanguageModel.writeModel(s, in, m)),
    IndexFamily("dsir", "model-file",
      "hashed n-gram importance-ratio table",
      (s, in, m) => graft.llm.Curation.writeDsirModel(s, in, m)))

  def get(name: String): IndexFamily =
    all.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"unknown index family '$name'; known: ${all.map(_.name).mkString(", ")}"))

  def build(s: SparkSession, family: String, corpusDir: String,
      dest: String): Unit =
    get(family).build(s, corpusDir, dest)

  def append(s: SparkSession, family: String, batch: DataFrame,
      dest: String): Unit =
    get(family).append.getOrElse(throw new IllegalArgumentException(
      s"index family '$family' has no incremental append; rebuild it " +
        s"(appendable: ${all.filter(_.append.isDefined).map(_.name).mkString(", ")})"))(
      s, batch, dest)

  def describe(): String =
    all.map(f => f"${f.name}%-8s ${f.kind}%-15s " +
      s"${if (f.append.isDefined) "append " else "rebuild"} ${f.description}")
      .mkString("\n")
}
