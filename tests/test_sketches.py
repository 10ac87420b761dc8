"""Membership sketches (sketches.py): Bloom + partitioned cuckoo.

Contract under test (SURVEY.md §4.4): NO false negatives ever (that is
what makes the pre-filtered anti-join bit-exact), bounded false
positives, lossless serde, distributed build == local build, and cuckoo
deletability."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from map_the_net_crawler_spark.sketches import (BloomSketch, CuckooFilter,
                                                PartitionedCuckoo,
                                                bloom_probe_udf, build_bloom,
                                                build_partitioned_cuckoo,
                                                cuckoo_probe_udf)

MEMBERS = np.array([f"http://d{i}.com/p{i}" for i in range(5000)],
                   dtype=object)
OUTSIDERS = np.array([f"http://x{i}.org/q{i}" for i in range(5000)],
                     dtype=object)


class TestBloom:
    def test_no_false_negatives_and_bounded_fpp(self):
        sk = BloomSketch.empty(len(MEMBERS), 0.01)
        sk.add_batch(MEMBERS)
        assert sk.contains_batch(MEMBERS).all()          # hard guarantee
        fpp = sk.contains_batch(OUTSIDERS).mean()
        assert fpp < 0.05                                # ~0.01 nominal

    def test_serde_roundtrip(self):
        sk = BloomSketch.empty(1000, 0.01)
        sk.add_batch(MEMBERS[:1000])
        rt = BloomSketch.from_bytes(sk.to_bytes())
        assert (rt.m, rt.k) == (sk.m, sk.k)
        assert np.array_equal(rt.bits, sk.bits)
        assert rt.contains_batch(MEMBERS[:1000]).all()

    def test_distributed_build_matches_local(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"url": MEMBERS})) \
            .repartition(7)
        dist = build_bloom(df, "url", len(MEMBERS), 0.01)
        local = BloomSketch.empty(len(MEMBERS), 0.01)
        local.add_batch(MEMBERS)
        assert np.array_equal(dist.bits, local.bits)     # OR-merge lossless

    def test_probe_udf(self, spark):
        sk = BloomSketch.empty(len(MEMBERS), 0.01)
        sk.add_batch(MEMBERS)
        probe = bloom_probe_udf(spark, sk)
        df = spark.createDataFrame(pd.DataFrame({"url": MEMBERS[:100]}))
        assert all(r["m"] for r in
                   df.select(probe(F.col("url")).alias("m")).collect())


class TestCuckoo:
    def test_insert_contains_delete(self):
        f = CuckooFilter(capacity=2000)
        for k in MEMBERS[:2000]:
            f.insert(k)
        assert all(f.contains(k) for k in MEMBERS[:2000])  # no FN
        fpp = sum(f.contains(k) for k in OUTSIDERS[:2000]) / 2000
        assert fpp < 0.05
        # delete restores non-membership (the property Bloom lacks)
        assert f.delete(MEMBERS[0])
        assert not f.contains(MEMBERS[0])
        assert f.contains(MEMBERS[1])
        assert not f.delete("http://never-inserted.example/")

    def test_overflow_keeps_no_false_negative(self):
        # overload far past capacity: kicked-out fingerprints land in the
        # exact overflow set, membership never lost
        f = CuckooFilter(capacity=64, bucket_size=2)
        for k in MEMBERS[:1000]:
            f.insert(k)
        assert all(f.contains(k) for k in MEMBERS[:1000])

    def test_serde_roundtrip(self):
        f = CuckooFilter(capacity=256)
        for k in MEMBERS[:300]:
            f.insert(k)
        rt = CuckooFilter.from_bytes(f.to_bytes())
        assert all(rt.contains(k) for k in MEMBERS[:300])
        assert np.array_equal(rt.table, f.table)
        assert rt.overflow == f.overflow

    def test_partitioned_build_and_probe(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"url": MEMBERS[:2000]})) \
            .repartition(5)
        pc = build_partitioned_cuckoo(df, "url", n_parts=8,
                                      capacity_per_part=512)
        assert pc.contains_batch(MEMBERS[:2000]).all()
        assert pc.contains_batch(OUTSIDERS[:500]).mean() < 0.05
        rt = PartitionedCuckoo.from_bytes(pc.to_bytes())
        assert rt.contains_batch(MEMBERS[:2000]).all()
        probe = cuckoo_probe_udf(spark, pc)
        out = spark.createDataFrame(pd.DataFrame({"url": MEMBERS[:50]})) \
            .select(probe(F.col("url")).alias("m")).collect()
        assert all(r["m"] for r in out)
        # route-local delete
        assert pc.delete(MEMBERS[0])
        assert not pc.contains_batch(MEMBERS[:1])[0]


class TestShardedBloom:
    def test_cogroup_probe_matches_exact(self, spark):
        """The 10^10-scale layout: route-sharded Bloom table + cogroup
        probe — no false negatives, bounded FPs, candidates keep their
        columns; missing shards mean definitely-new."""
        from map_the_net_crawler_spark.sketches import (build_sharded_blooms,
                                                        cogroup_probe)
        frontier = spark.createDataFrame(
            pd.DataFrame({"url": MEMBERS})).repartition(6)
        shards = build_sharded_blooms(frontier, "url", n_parts=8,
                                      expected_total=len(MEMBERS))
        assert shards.count() == 8
        cand = spark.createDataFrame(pd.DataFrame({
            "clean_url": np.concatenate([MEMBERS[:500], OUTSIDERS[:1500]]),
            "tag": np.arange(2000)}))
        shards_k = shards
        out = cogroup_probe(
            cand.withColumnRenamed("clean_url", "url"), shards_k,
            "url", n_parts=8).toPandas()
        member = out[out.url.isin(set(MEMBERS[:500]))]
        outsider = out[~out.url.isin(set(MEMBERS[:500]))]
        assert member["_maybe"].all()              # no false negatives
        assert outsider["_maybe"].mean() < 0.05    # fpp bound
        assert set(out.columns) == {"url", "tag", "_maybe"}
