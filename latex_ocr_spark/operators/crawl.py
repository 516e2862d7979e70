r"""Offline frontier search — the reference's recursive crawl loop
(scraping.py:24-66 ``recursive_search``) re-created over a *table* of
pages instead of live HTTP.

Reference semantics preserved:

- round d processes every link discovered by round d-1 that is not yet
  visited (the visited-set anti-join, scraping.py:46);
- a page contributes new links only if it yielded math
  (scraping.py:52-57 — "if not math, terminate the tree");
- links are processed whether or not the target page exists (a fetch
  failure still marks the url visited);
- ``depth`` counts processing rounds: seeds are round 0, and links
  discovered by the final round are NOT processed (the reference never
  parses them).

Spark-first differences: the per-round frontier is a DataFrame, the
visited check is a broadcast-friendly anti-join, and each round
``localCheckpoint``-s to keep the iterative plan flat.  No randomized
iteration order (the reference shuffles for politeness to web hosts —
meaningless offline) — results are the deterministic min-depth BFS,
which is what the reference's round-synchronized loop computes anyway.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WIKI_LINK_PATTERN = r'href="/wiki/(.*?)"'  # scraping.py:14


def page_links(pages: DataFrame, id_col: str = "page_id", text_col: str = "text") -> DataFrame:
    """(src, dst) edge table: wiki links from pages that contain math.

    The math gate is the reference's tree-pruning rule; the colon
    filter drops namespaced pages (parse_wiki, scraping.py:78)."""
    has_math = F.col(text_col).contains("$")
    links = F.regexp_extract_all(F.col(text_col), F.lit(WIKI_LINK_PATTERN), 1)
    return (
        pages.filter(has_math)
        .select(F.col(id_col).alias("src"), F.explode(links).alias("dst"))
        .filter(~F.col("dst").contains(":"))
        .distinct()
    )


def frontier_search(
    spark: SparkSession,
    pages: DataFrame,
    seeds: Sequence[str],
    depth: int = 3,
    id_col: str = "page_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, first_depth) — every page id processed within ``depth``
    rounds of BFS from ``seeds``, tagged with the round that first
    reached it."""
    if depth < 1:
        raise ValueError(f"depth counts processing rounds and must be >= 1, got {depth}")
    edges = page_links(pages, id_col, text_col).persist()
    seed_frame = spark.createDataFrame(
        [(s, 0) for s in seeds], "id string, first_depth int"
    ).localCheckpoint()
    # each round's frame is checkpointed once; `visited` is a lazy
    # union of those checkpointed frames (re-checkpointing the whole
    # growing set every round would re-store O(V·depth) rows)
    rounds = [seed_frame]
    visited = seed_frame
    frontier = seed_frame.select("id")
    for d in range(1, depth):
        new = (
            edges.join(frontier, edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("first_depth", F.lit(d))
            .localCheckpoint()
        )
        if new.isEmpty():
            break
        rounds.append(new)
        visited = visited.unionByName(new)
        frontier = new.select("id")
    edges.unpersist(blocking=False)
    out = rounds[0]
    for fr in rounds[1:]:
        out = out.unionByName(fr)
    return out
