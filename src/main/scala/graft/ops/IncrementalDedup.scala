package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental deduplication: classify a NEW batch of documents against
  * an existing corpus index — the shape a production ingest runs daily,
  * where re-deduplicating 100 TB of history per batch is not an option.
  *
  * The index is two compact tables (both keyed by doc, both natural
  * warehouse artifacts, e.g. via [[graft.connect.ParquetWarehouse]]):
  *   - fingerprints: (doc_id, exact_fp)
  *   - signatures:   (doc_id, sgl, mh_0..mh_15)
  *
  * Classification is join-only against the index: new-batch exact
  * fingerprints probe the fingerprint table; new-batch LSH band keys
  * probe the banded signature table and candidates verify with exact
  * Jaccard against the stored shingle sets. Shuffle volume is
  * O(new batch), never O(corpus).
  */
object IncrementalDedup {

  final case class Index(fingerprints: DataFrame, signatures: DataFrame)

  /** Build the dedup index for a corpus of (doc_id, text). */
  def buildIndex(spark: SparkSession, corpus: DataFrame): Index =
    Index(
      fingerprints = Dedup.fingerprints(corpus),
      signatures = Dedup.signatures(spark, corpus))

  /** Classify each new document: `exact_dup` (same normalized content as
    * an indexed doc), `near_dup` (3-gram Jaccard ≥ 0.8 with an indexed
    * doc via LSH candidates), or `new`. `dup_of` is the lowest matching
    * indexed doc_id, null for `new`. */
  def classify(spark: SparkSession, newDocs: DataFrame, index: Index): DataFrame = {
    val newFps = Dedup.fingerprints(newDocs)
    val exact = newFps.join(
        index.fingerprints
          .withColumnRenamed("doc_id", "idx_doc_id"), Seq("exact_fp"))
      .groupBy(col("doc_id"))
      .agg(min(col("idx_doc_id")).as("exact_dup_of"))

    val newSig = Dedup.signatures(spark, newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idxSig = index.signatures
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = Dedup.bandKeysOf(newSig).as("n")
      .join(Dedup.bandKeysOf(idxSig).as("i"), Seq("band", "key"))
      .select(col("n.doc_id").as("doc_id"), col("i.doc_id").as("idx_doc_id"))
      .distinct()
    val near = cand
      .join(newSig.select(col("doc_id"), col("sgl").as("sgl_n")), Seq("doc_id"))
      .join(idxSig.select(col("doc_id").as("idx_doc_id"), col("sgl").as("sgl_i")),
            Seq("idx_doc_id"))
      .withColumn("inter", size(array_intersect(col("sgl_n"), col("sgl_i"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sgl_n")) + size(col("sgl_i")) - col("inter")))
      .filter(col("jaccard") >= 0.8)
      .groupBy(col("doc_id"))
      .agg(min(col("idx_doc_id")).as("near_dup_of"))

    newDocs.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_dup_of").isNotNull, "exact_dup")
          .when(col("near_dup_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("exact_dup_of"), col("near_dup_of")).as("dup_of"))
  }
}
