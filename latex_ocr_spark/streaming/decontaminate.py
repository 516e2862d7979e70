"""Streaming benchmark decontamination: the ingestion-time guard.

A curation pipeline that keeps acquiring documents needs contamination
checked as data LANDS, not in a later batch sweep.  Contamination is a
property of one document against a *static* eval/benchmark set —
there is no cross-batch state — so the streaming form is exactly the
batch operator applied per micro-batch inside ``foreachBatch``
(single code path, same oracle-checked semantics as the
``dedup_decontaminate`` registry query):

    readStream(documents dir)
      → foreachBatch: dedup.decontaminate(batch, evalset)
          → append contamination report
          → append cleaned documents

The eval set's shingle/signature frames are small (benchmarks are) and
broadcast inside every micro-batch join, so each batch costs one scan
of its own files plus the broadcast probes.

Delivery semantics: ``availableNow`` + checkpoint give exactly-once
*file progress* (a fully processed batch is never re-read), but the
two independent parquet appends inside ``foreachBatch`` make the
OUTPUT at-least-once — a batch that fails between or after the writes
is retried on restart and appends its rows again.  Readers that need
exactly-once results dedup on read: both outputs have natural keys
(``report`` on (corpus_id, eval_id); ``cleaned`` on doc_id), so a
``dropDuplicates`` over the key — or writing the consumer-side join
through one of this repo's exact-dedup operators — removes replay
copies.  (The alternative, idempotent batch_id-partitioned dynamic
overwrite, trades that read-side dedup for a partition-registry
commit; documented rather than imposed.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def start_decontamination_stream(
    spark: SparkSession,
    input_dir: str,
    evalset: DataFrame,
    report_dir: str,
    clean_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    ngram: int = 3,
    available_now: bool = True,
):
    """Continuously decontaminate documents as files land.

    ``evalset`` is a static (doc_id, text) frame; each micro-batch is
    checked independently against it and split into a contamination
    report (corpus_id, eval_id, jaccard) and a cleaned append stream.
    """
    from latex_ocr_spark import cachepool
    from latex_ocr_spark.operators.dedup import decontaminate

    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA).format("parquet").load(input_dir)
    )

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        # scoped, not release(): this runs on the stream's micro-batch
        # thread, and a global sweep here would unpersist frames a
        # concurrently running batch query or second stream still needs
        with cachepool.scoped():
            report, cleaned = decontaminate(
                batch_df, evalset, threshold=threshold, ngram=ngram
            )
            report.write.mode("append").parquet(report_dir)
            cleaned.write.mode("append").parquet(clean_dir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
