"""URL-seen set: upsert + membership pre-filters (SURVEY.md §2.1 S12,
§2.3 J7, §4.4).

Exactness always comes from the left-anti join against the seen/frontier
tables; the Bloom filter is a broadcastable *negative* pre-filter that
lets the 10^10-scale merge skip the shuffle for the (vast majority of)
URLs that were never seen.  Spark's built-in runtime bloom-filter join
rule does not persist across iterations, so the engine builds its own
with DataFrame.stat.bloomFilter over the canonical URL and re-applies it
via a vectorized numpy membership UDF.  Per-partition cuckoo filters (the
deletable-membership accelerator from BASELINE.json north_star) are
implemented in sketches.py and validated there; the authoritative set is
always the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_seen(seen: DataFrame, new_rows: DataFrame) -> DataFrame:
    """record_url_processing upsert (database.py:508-531): unique on url,
    last write wins for status/links_found."""
    merged = seen.withColumn("_gen", F.lit(0)).unionByName(
        new_rows.withColumn("_gen", F.lit(1)))
    w = Window.partitionBy("url").orderBy(F.col("_gen").desc(),
                                          F.col("processed_iteration").desc())
    return (merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn", "_gen"))


def seen_counts(seen: DataFrame) -> DataFrame:
    """A2 (database.py:533-545): history rows per domain.  The table is
    unique on url, so count(*) == count(distinct url)."""
    return seen.groupBy("domain_name").agg(F.count("*").alias("seen_cnt"))


def anti_join_seen(candidates: DataFrame, seen: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """J7 exact membership: NOT EXISTS via left-anti join."""
    return candidates.join(
        seen.select(F.col("url").alias(url_col)).distinct(),
        url_col, "left_anti")


def build_seen_bloom(spark_df: DataFrame, expected: int, fpp: float):
    """Broadcastable Bloom over seen urls (DataFrame.stat.bloomFilter —
    built-in aggregation, one pass, no collect of raw urls)."""
    n = max(expected, 1)
    return spark_df.stat.bloomFilter("url", n, fpp)
