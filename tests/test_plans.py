"""Physical-plan hygiene (SURVEY.md §4): the properties that make the
100 TB story real must be visible in the optimized plan, not just
claimed — filter/column pushdown into the parquet scan, broadcast of
dimension sides, distributed top-k for the claim, no cartesian products
on the hot paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestPushdown:
    def test_pricing_filter_reaches_scan(self, spark):
        plan = plan_of(E.q_pricing_summary(spark, SF))
        assert "PushedFilters" in plan
        assert "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]

    def test_column_pruning(self, spark):
        # Q1 touches 6 lineitem columns; the wide ones must not be read
        plan = plan_of(E.q_pricing_summary(spark, SF))
        read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read_schema and "l_comment" not in read_schema[0]
        assert "l_partkey" not in read_schema[0]


class TestJoins:
    def test_dimension_join_broadcasts(self, spark):
        plan = plan_of(E.q_revenue_by_nation(spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_minhash_verify_join_not_cartesian(self, spark):
        plan = plan_of(E.q_minhash_lsh(spark, SF))
        assert "CartesianProduct" not in plan


class TestClaim:
    def test_claim_is_distributed_topk(self, spark):
        """W1: the frontier claim must compile to TakeOrderedAndProject
        (per-partition local top-k + k-row merge), NEVER a single-task
        global sort window (SURVEY.md §4.5)."""
        from map_the_net_crawler_spark.config import CrawlConfig
        from map_the_net_crawler_spark.operators.frontier import claim_batch
        f = spark.createDataFrame(
            [(f"http://d{i}.com", f"d{i}.com", None, 1, "pending", i, None,
              0, None, None) for i in range(100)],
            "url string, domain_name string, source_domain string, "
            "priority int, status string, discovery_seq long, "
            "discovery_ts timestamp, depth int, error_message string, "
            "processed_iteration int")
        plan = plan_of(claim_batch(f, CrawlConfig(max_items=10)))
        assert "TakeOrderedAndProject" in plan


class TestSkew:
    def test_salted_claim_splits_hub_domain(self, spark):
        """§4.2 hub-domain skew: with salt_buckets>1 the per-domain rank
        window partitions by (domain, salt), so one hub domain holding
        90% of pending URLs cannot collapse the window stage into a
        single task — pinned both in the plan (the salt expression is
        part of the window partition spec) and behaviorally (per-salt
        sub-quota bound, budget respected after the union)."""
        from map_the_net_crawler_spark.config import CrawlConfig
        from map_the_net_crawler_spark.operators.frontier import claim_batch
        rows = [(f"http://hub.com/p{i}", "hub.com", None, 1, "pending", i,
                 None, 0, None, None) for i in range(900)]
        rows += [(f"http://d{i}.com", f"d{i}.com", None, 1, "pending",
                  900 + i, None, 0, None, None) for i in range(100)]
        f = spark.createDataFrame(
            rows,
            "url string, domain_name string, source_domain string, "
            "priority int, status string, discovery_seq long, "
            "discovery_ts timestamp, depth int, error_message string, "
            "processed_iteration int")
        cfg = CrawlConfig(max_items=200)
        out = claim_batch(f, cfg, politeness_budget=64, salt_buckets=16)
        plan = plan_of(out)
        assert "pmod" in plan and "xxhash64" in plan  # salted partition key
        got = out.collect()
        hub = [r for r in got if r.domain_name == "hub.com"]
        # sub-quota = ceil(64/16) = 4 per (domain, salt): the hub's rows
        # come from ≤16 independent window groups of ≤4 rows each
        assert 0 < len(hub) <= 64
        # claim stays a distributed top-k after the salting
        assert "TakeOrderedAndProject" in plan


class TestSketchPath:
    def test_sure_new_rows_bypass_join(self, spark):
        """anti_join_with_sketch: the provably-new branch must contain no
        join at all — only the might-contain branch joins."""
        import numpy as np
        import pandas as pd

        from map_the_net_crawler_spark.operators.seen import \
            anti_join_with_sketch
        from map_the_net_crawler_spark.sketches import (BloomSketch,
                                                        bloom_probe_udf)
        sk = BloomSketch.empty(100, 0.01)
        sk.add_batch(np.array(["http://a.com"], dtype=object))
        probe = bloom_probe_udf(spark, sk)
        cand = spark.createDataFrame(pd.DataFrame(
            {"clean_url": [f"http://x{i}.com" for i in range(10)]}))
        keys = spark.createDataFrame(pd.DataFrame(
            {"clean_url": ["http://a.com"]}))
        out = anti_join_with_sketch(cand, keys, "clean_url", probe)
        plan = plan_of(out)
        # exactly one join (the maybe-branch anti join), one union
        assert plan.count("Join") >= 1 and "Union" in plan
        assert out.count() == 10
