"""Query-boundary cache ownership (round-2 verdict #3): operators that
persist intermediates (dedup shingles, tf-idf tf, global-id ranges)
register them with cachepool; the queries() wrapper releases them at
the next query boundary, so a many-query session — the driver harness,
bench.py — holds at most one query's caches instead of accumulating
all of them."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import __spark_entry__ as entrymod

from latex_ocr_spark import cachepool

SF = "/root/testdata/sf0.001"


def _n_cached(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_many_query_session_holds_no_stale_caches(spark):
    spark.catalog.clearCache()
    cachepool.release()
    assert _n_cached(spark)

    qs = entrymod.queries()
    # three of the heaviest persisting queries back-to-back, the way
    # the driver runs them
    for name in ("dedup_lsh_jaccard", "text_tfidf", "w6_line_numbering"):
        rows = qs[name](spark, SF).collect()
        assert rows  # consumed while its own caches are live

    # the wrapper released earlier queries' frames at each boundary;
    # one explicit release drains the last query's
    cachepool.release()
    assert _n_cached(spark), "stale persisted frames survived the session"


def test_release_does_not_desync_global_ids(spark):
    """The ids frame must stay pinned until ITS query's result is
    consumed; releasing it afterwards and re-running must still give
    contiguous 1..N ids (a desync shows up as duplicates/gaps)."""
    qs = entrymod.queries()
    for _run in range(2):
        ids = sorted(r.eq_id for r in qs["w6_line_numbering"](spark, SF).collect())
        assert ids == list(range(1, len(ids) + 1))
    cachepool.release()


def test_track_release_roundtrip(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS y")
    cachepool.track(df)
    df.count()
    assert not _n_cached(spark)
    assert cachepool.release() >= 1
    assert _n_cached(spark)


def test_deferred_consumption_after_release_keeps_ids_consistent(spark):
    """A consumer may build query N's DataFrame, let query N+1 trigger
    the boundary release, and only THEN collect query N (normal lazy-
    Spark usage).  The recompute must reproduce identical partition
    membership (the sortWithinPartitions determinism belt in ids.py) —
    ids stay contiguous and unique instead of silently desyncing."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    deferred = qs["corpus_build"](spark, SF)       # ids frame tracked
    qs["text_tfidf"](spark, SF).collect()          # boundary: releases it
    rows = deferred.collect()                      # forces recompute
    ids = sorted(r.eq_id for r in rows)
    assert ids == list(range(1, len(ids) + 1)), "global ids desynced after release"
    cachepool.release()
