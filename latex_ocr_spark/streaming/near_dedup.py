"""Streaming NEAR-duplicate dedup — the MinHash-LSH batch path in
incremental form, with all-history scope.

``dedup_stream`` (streaming/dedup.py) removes EXACT re-arrivals via
the state store; a training-data ingest also needs near-duplicates of
*anything already accepted* dropped as data lands.  Cross-batch
near-dup state cannot live in the streaming state store (a doc's
candidates are discovered by band-key join, not by a pre-known key),
so the streaming form maintains a durable **survivor index** — the
incremental-ingest pattern production dedup systems use:

    <index>/shingles/    (id, shingle)         of every survivor
    <index>/signatures/  (id, s0…, n_shingles) of every survivor

Per micro-batch (inside ``foreachBatch``, single code path with the
oracle-checked batch operators):

1. in-batch near-dedup — ``lsh_verified_pairs`` → ``duplicate_clusters``
   → keep each cluster's canonical (min id);
2. history check — ``decontaminate`` with the BATCH as the (small,
   broadcast) eval side and the history index frames injected as the
   corpus side: the index is scanned, never re-shingled, and the
   per-batch quadratic work is bounded by cross-table band collisions.
   Exact shingle-Jaccard verify, identical measure to the batch path;
3. survivors append to the output AND to the index — both as
   batch_id-partitioned dynamic overwrites (streaming/sinks.py), so a
   replayed batch replaces its own output/index partitions:
   exactly-once end to end.

Survivor policy is FIRST-SEEN (earlier batches win; within a batch,
the cluster canonical).  With ingest-monotonic ids this equals the
batch pipeline's min-id-canonical policy whenever duplicate clusters
are cliques (near-dup groups typically are — every copy matches the
original); on chain-shaped clusters the streaming form may keep
chain-distant members, because each doc is compared against
*survivors* only — the standard incremental-dedup semantics.

Scale notes: index reads are pruned columnar scans growing linearly
with accepted data; the band join broadcasts only the batch side.  At
very large history, compact the index offline (bucket by id) without
changing this code path — the frames are injected by path.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from latex_ocr_spark.streaming.decontaminate import DOCS_STREAM_SCHEMA
from latex_ocr_spark.streaming.sinks import (
    BATCH_COL,
    assert_idempotent_layout,
    write_batch_idempotent,
)


def _index_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path)
        return True
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return False
        # a transient/real read failure (permissions, corrupt footer)
        # must FAIL the batch, not silently skip the all-history check
        # — skipping would admit near-dups of every prior survivor
        # into BOTH the output and the index, permanently
        raise


def start_near_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 8,
    band_size: int = 2,
    ngram: int = 3,
    max_bucket_size: Optional[int] = None,
    available_now: bool = True,
    _fail_batches: Optional[set] = None,
):
    """Continuously keep only documents that near-duplicate neither a
    previously accepted document nor an earlier doc of their own batch.

    ``_fail_batches`` injects a crash after the named batches' writes,
    before the checkpoint commit — the replay window the idempotent
    sinks exist for."""
    import json

    from latex_ocr_spark import cachepool
    from latex_ocr_spark.operators import dedup as D

    sh_path = os.path.join(index_dir, "shingles")
    sig_path = os.path.join(index_dir, "signatures")
    meta_path = os.path.join(index_dir, "_meta")

    # the survivor index is only comparable under the knobs that built
    # it: shingles depend on ngram, signatures on num_hashes, the drop
    # decision on threshold/band_size.  A restart with different knobs
    # would silently admit every near-dup (2-gram batch shingles never
    # intersect stored 3-gram shingles) — fingerprint and refuse, the
    # same contract plans/resumable.py applies to its checkpoint.
    cfg = json.dumps(
        {"threshold": threshold, "num_hashes": num_hashes,
         "band_size": band_size, "ngram": ngram},
        sort_keys=True,
    )
    try:
        existing = spark.read.text(meta_path).first()[0]
        if existing != cfg:
            raise RuntimeError(
                f"survivor index at {index_dir} was built under different "
                f"knobs ({existing}) than this stream ({cfg}) — near-dup "
                "checks across the two are meaningless; use a fresh index "
                "dir (or rebuild) to change knobs"
            )
    except AnalysisException as e:
        if not ("PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e)):
            raise
        spark.createDataFrame([(cfg,)], "cfg string").coalesce(1).write.mode(
            "overwrite"
        ).text(meta_path)

    assert_idempotent_layout(spark, output_dir)

    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA).format("parquet").load(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        with cachepool.scoped():
            batch = cachepool.track(batch_df.select("doc_id", "text"))

            # 1. in-batch near-dedup (cluster canonical survives)
            sh_b = cachepool.track(D.doc_shingles(batch, ngram=ngram))
            sig_b = cachepool.track(
                D.minhash_signatures(
                    batch, num_hashes, ngram=ngram,
                    _shingles=sh_b, include_size=True,
                )
            )
            pairs = D.lsh_verified_pairs(
                batch, threshold=threshold, num_hashes=num_hashes,
                band_size=band_size, ngram=ngram,
                max_bucket_size=max_bucket_size,
                _shingles=sh_b, _signatures=sig_b,
            )
            non_canonical = (
                D.duplicate_clusters(pairs)
                .filter(F.col("id") != F.col("cluster_id"))
                .select(F.col("id").alias("doc_id"))
            )
            survivors = batch.join(F.broadcast(non_canonical), "doc_id", "left_anti")

            # 2. all-history check: batch (small) broadcasts as the
            # eval side; the index frames ARE the corpus side — the
            # history is scanned, never re-shingled
            if _index_exists(spark, sig_path):
                # EXCLUDE this batch's own partitions: a replayed batch
                # must not see its previous (partial) attempt's index
                # rows, or it would flag every one of its docs as a
                # duplicate-of-history (jaccard 1.0 with itself) and
                # replace its output with an empty partition — data
                # loss.  batch_id is the partition column, so this is
                # partition pruning, not a scan-and-filter.  The same
                # filter also makes a cache-evicted RECOMPUTE of the
                # survivors frame safe after this function's own index
                # appends land: the new partitions carry this batch_id
                # and stay invisible to the re-read.
                hist_sh = spark.read.parquet(sh_path).filter(
                    F.col("batch_id") != batch_id
                )
                hist_sig = spark.read.parquet(sig_path).filter(
                    F.col("batch_id") != batch_id
                ).drop("batch_id")
                # corpus arg only seeds the (unused, lazy) cleaned
                # frame once shingles+signatures are injected
                hist_docs = hist_sig.select(F.col("id").alias("doc_id"))
                surv_small = cachepool.track(survivors)
                report, _unused_cleaned = D.decontaminate(
                    hist_docs.withColumn("text", F.lit(None).cast("string")),
                    surv_small,
                    threshold=threshold, num_hashes=num_hashes,
                    band_size=band_size, ngram=ngram,
                    max_bucket_size=max_bucket_size,
                    _corpus_shingles=hist_sh.select("id", "shingle"),
                    _corpus_signatures=hist_sig,
                )
                dup_of_history = report.select(
                    F.col("eval_id").alias("doc_id")
                ).distinct()
                survivors = surv_small.join(
                    F.broadcast(dup_of_history), "doc_id", "left_anti"
                )

            survivors = cachepool.track(survivors)
            surv_ids = survivors.select(F.col("doc_id").alias("id"))

            # 3. exactly-once writes: output + both index tables keyed
            # by batch_id so a replay REPLACES its own partitions
            write_batch_idempotent(survivors, batch_id, output_dir)
            write_batch_idempotent(
                sh_b.join(F.broadcast(surv_ids), "id", "left_semi"),
                batch_id, sh_path,
            )
            write_batch_idempotent(
                sig_b.join(F.broadcast(surv_ids), "id", "left_semi"),
                batch_id, sig_path,
            )
            if _fail_batches and batch_id in _fail_batches:
                raise RuntimeError(
                    f"injected crash after batch {batch_id} writes, "
                    "before checkpoint commit"
                )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_index(spark: SparkSession, index_dir: str, num_partitions: int = 32) -> dict:
    """Offline maintenance for the survivor index: fold the
    accumulated per-batch partitions into one ``batch_id=-1`` partition
    per table, dropping any duplicate rows (repeated compaction is
    idempotent).  Thousands of tiny batch partitions make every
    micro-batch's history scan open thousands of files; compaction
    restores O(num_partitions) files without changing the read path —
    the stream's ``batch_id != current`` filter keeps -1 partitions
    visible forever (real batch ids are never negative).

    CONTRACT: run only after a CLEAN stream shutdown (last batch's
    checkpoint committed).  Compacting while a crashed batch awaits
    replay would fold its partial rows into -1, and the replay would
    then re-add them under their own batch id — duplicate index rows
    double intersection counts and corrupt the verify Jaccard.

    Returns {"shingles": n_rows, "signatures": n_rows} after compaction.

    The swap uses local filesystem renames; on an object store run the
    same write-then-swap through the Hadoop FileSystem API (or compact
    into a NEW index dir and repoint the stream) — the read path is
    identical either way.
    """
    out = {}
    for sub, keys in (("shingles", ["id", "shingle"]), ("signatures", ["id"])):
        path = os.path.join(index_dir, sub)
        staging = os.path.join(index_dir, f"_compact_{sub}")
        compacted = (
            spark.read.parquet(path)
            .drop(BATCH_COL)
            .dropDuplicates(keys)
            .repartition(num_partitions)
            .withColumn(BATCH_COL, F.lit(-1))
        )
        # write-then-swap: the source partitions are read fully before
        # the staging write commits, and the swap is two renames — a
        # crash between them leaves either the old table or the staged
        # copy, never a half-table
        compacted.write.mode("overwrite").partitionBy(BATCH_COL).parquet(staging)
        out[sub] = spark.read.parquet(staging).count()
        import shutil as _shutil

        _shutil.rmtree(path)
        _shutil.move(staging, path)
    return out
