"""Membership sketches: broadcast Bloom + per-partition cuckoo filters
(SURVEY.md §4.4; BASELINE.json north_rule; reference analogue: the
UNIQUE-url in-queue probe, database.py:494-506).

Exactness ALWAYS comes from the left-anti join against the frontier/seen
table; a sketch is a *negative* pre-filter with no false negatives, so

    definitely_new = candidates where NOT might_contain(url)
    maybe          = candidates where might_contain(url)   (FP rate fpp)
    new            = definitely_new ∪ (maybe ANTI JOIN table)

is bit-identical to the plain anti-join while shrinking the anti-join
shuffle to ``|candidates| × (hit_rate + fpp)`` — at the 10^10-row seen
set the north rule targets, the vast majority of discovered URLs are
new and never enter the shuffle at all.

Two sketch families:

- ``BloomSketch`` — classic double-hashed Bloom bitmap, built
  distributed (one numpy bitmap per partition via ``mapInPandas``,
  OR-merged on the driver — bitmaps OR losslessly, unlike cuckoo
  tables), shipped to executors as a broadcast variable, probed by an
  Arrow-vectorized pandas UDF.
- ``CuckooFilter`` / ``PartitionedCuckoo`` — deletable membership
  (fingerprint + two candidate buckets, partial-key cuckoo hashing,
  Fan et al. 2014, public paper).  Cuckoo tables do not merge, so the
  distributed form keeps ONE filter per key-routed partition
  (``groupBy(route) → applyInPandas``) and probes route-locally — the
  per-partition layout the north rule names.  Deletions (e.g. UGC
  purges removing frontier rows) update the owning partition's filter
  only.

Hashing is ``pandas.util.hash_array`` (SipHash-derived, C-speed,
vectorized) with fixed 16-byte keys — deterministic within a runtime.
Sketches are rebuilt from the authoritative table per iteration (and
snapshotted via TableIO blobs), never treated as a source of truth, so
cross-version hash stability is not load-bearing.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

_KEY1 = "mtn-bloom-hash-1"  # exactly 16 bytes, pandas hash_array keys
_KEY2 = "mtn-bloom-hash-2"
_KEY_ROUTE = "mtn-cuckoo-route"
_KEY_FP = "mtn-cuckoo-fingr"
_KEY_IDX = "mtn-cuckoo-index"


def _hash(keys: np.ndarray, hash_key: str) -> np.ndarray:
    return pd.util.hash_array(keys.astype(object), hash_key=hash_key)


# ----------------------------------------------------------------------
# Bloom
# ----------------------------------------------------------------------

class BloomSketch:
    """Double-hashed Bloom bitmap (Kirsch–Mitzenmacher: position_i =
    h1 + i·h2 mod m), vectorized over numpy arrays of keys."""

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None,
                 cap: int = 0):
        self.m = int(m_bits)
        self.k = int(k)
        # capacity the bitmap was sized for — lets an incremental caller
        # decide when accumulated inserts warrant a resize-rebuild
        self.cap = int(cap)
        self.bits = bits if bits is not None else \
            np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @staticmethod
    def params_for(expected: int, fpp: float) -> tuple[int, int]:
        n = max(int(expected), 1)
        m = max(1024, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return m, min(k, 16)

    @classmethod
    def empty(cls, expected: int, fpp: float) -> "BloomSketch":
        return cls(*cls.params_for(expected, fpp), cap=expected)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = _hash(keys, _KEY1)
        h2 = _hash(keys, _KEY2) | np.uint64(1)      # odd => full-period step
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add_batch(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (pos & np.uint64(7)).astype(np.uint8)))

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)                     # (k, n)
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = (pos & np.uint64(7)).astype(np.uint8)
        hit = (self.bits[byte] >> bit) & 1
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomSketch") -> "BloomSketch":
        assert (self.m, self.k) == (other.m, other.k)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        header = json.dumps({"m": self.m, "k": self.k,
                             "cap": self.cap}).encode()
        return len(header).to_bytes(4, "big") + header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomSketch":
        hlen = int.from_bytes(blob[:4], "big")
        meta = json.loads(blob[4:4 + hlen])
        bits = np.frombuffer(blob[4 + hlen:], dtype=np.uint8).copy()
        return cls(meta["m"], meta["k"], bits, cap=meta.get("cap", 0))


def build_bloom(df: DataFrame, col: str, expected: int,
                fpp: float = 0.01) -> BloomSketch:
    """Distributed build: one bitmap per partition (mapInPandas), lossless
    OR-merge on the driver.  One pass over the key column, nothing but
    fixed-size bitmaps cross the wire."""
    m, k = BloomSketch.params_for(expected, fpp)

    def build(batches):
        sk = BloomSketch(m, k)
        seen_any = False
        for pdf in batches:
            if not pdf.empty:
                seen_any = True
                sk.add_batch(pdf[col].to_numpy())
        if seen_any:
            yield pd.DataFrame({"blob": [sk.to_bytes()]})

    parts = df.select(col).mapInPandas(build, "blob binary").collect()
    out = BloomSketch(m, k, cap=expected)
    for row in parts:
        out.merge(BloomSketch.from_bytes(bytes(row["blob"])))
    return out


def bloom_probe_udf(spark, sketch: BloomSketch):
    """Arrow-vectorized might_contain(key) probe; the bitmap ships once
    per executor as a broadcast variable."""
    bc = spark.sparkContext.broadcast(sketch.to_bytes())
    holder: dict = {}

    @pandas_udf(BooleanType())
    def might_contain(s: pd.Series) -> pd.Series:
        sk = holder.get("sk")
        if sk is None:
            sk = holder["sk"] = BloomSketch.from_bytes(bc.value)
        return pd.Series(sk.contains_batch(s.to_numpy()))

    return might_contain


# ----------------------------------------------------------------------
# Cuckoo
# ----------------------------------------------------------------------

class CuckooFilter:
    """Partial-key cuckoo filter: 16-bit fingerprints, bucket_size slots,
    two candidate buckets i1 = h(key), i2 = i1 XOR h(fp).  Supports
    delete() — the property Bloom lacks.  Inserts that exhaust the kick
    chain fall back to an exact overflow set, preserving the no-false-
    negative contract at any load factor."""

    MAX_KICKS = 500

    def __init__(self, capacity: int, bucket_size: int = 4):
        n_buckets = 1
        while n_buckets * bucket_size < max(capacity, bucket_size) * 1.05:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.overflow: set = set()
        self._rng_state = 0x9E3779B97F4A7C15  # deterministic kick picks

    def _fp_and_index(self, key) -> tuple[int, int]:
        arr = np.array([key], dtype=object)
        fp = int(_hash(arr, _KEY_FP)[0] % np.uint64(65535)) + 1  # 1..65535
        i1 = int(_hash(arr, _KEY_IDX)[0] % np.uint64(self.n_buckets))
        return fp, i1

    def _alt(self, i: int, fp: int) -> int:
        h = pd.util.hash_array(np.array([fp], dtype=np.uint64),
                               hash_key=_KEY_IDX)[0]
        return (i ^ int(h)) % self.n_buckets

    def _next_rand(self) -> int:
        # xorshift64* — deterministic eviction slot choice, no RNG state
        x = self._rng_state
        x ^= (x >> 12) & 0xFFFFFFFFFFFFFFFF
        x ^= (x << 25) & 0xFFFFFFFFFFFFFFFF
        x ^= (x >> 27) & 0xFFFFFFFFFFFFFFFF
        self._rng_state = x & 0xFFFFFFFFFFFFFFFF
        return (x * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF

    def _try_place(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def insert(self, key) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt(i1, fp)
        if self._try_place(i1, fp) or self._try_place(i2, fp):
            return True
        i = i1 if self._next_rand() & 1 else i2
        for _ in range(self.MAX_KICKS):
            slot = self._next_rand() % self.bucket_size
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt(i, fp)
            if self._try_place(i, fp):
                return True
        # table saturated: exact fallback keeps the no-false-negative
        # contract (standard practice; Fan et al. treat this as resize)
        self.overflow.add((i, fp))
        return False

    def contains(self, key) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt(i1, fp)
        if fp in self.table[i1] or fp in self.table[i2]:
            return True
        return (i1, fp) in self.overflow or (i2, fp) in self.overflow

    def delete(self, key) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt(i1, fp)):
            slots = np.flatnonzero(self.table[i] == fp)
            if len(slots):
                self.table[i, slots[0]] = 0
                return True
            if (i, fp) in self.overflow:
                self.overflow.discard((i, fp))
                return True
        return False

    def to_bytes(self) -> bytes:
        header = json.dumps({
            "n_buckets": self.n_buckets, "bucket_size": self.bucket_size,
            "overflow": sorted(list(self.overflow))}).encode()
        return len(header).to_bytes(4, "big") + header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        hlen = int.from_bytes(blob[:4], "big")
        meta = json.loads(blob[4:4 + hlen])
        out = cls.__new__(cls)
        out.n_buckets = meta["n_buckets"]
        out.bucket_size = meta["bucket_size"]
        out.overflow = {tuple(x) for x in meta["overflow"]}
        out.table = np.frombuffer(blob[4 + hlen:], dtype=np.uint16) \
            .reshape(out.n_buckets, out.bucket_size).copy()
        out._rng_state = 0x9E3779B97F4A7C15
        return out


def route_of(keys: np.ndarray, n_parts: int) -> np.ndarray:
    return (_hash(keys, _KEY_ROUTE) % np.uint64(n_parts)).astype(np.int64)


class PartitionedCuckoo:
    """One cuckoo filter per key-routed partition; a probe touches only
    the owning partition's filter (the distributed layout: each executor
    holds its partitions' filters; here they ride one broadcast list)."""

    def __init__(self, filters: dict[int, CuckooFilter], n_parts: int):
        self.filters = filters
        self.n_parts = n_parts

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        routes = route_of(keys, self.n_parts)
        out = np.zeros(len(keys), dtype=bool)
        for r in np.unique(routes):
            f = self.filters.get(int(r))
            if f is None:
                continue
            idx = np.flatnonzero(routes == r)
            out[idx] = [f.contains(keys[i]) for i in idx]
        return out

    def insert_batch(self, keys) -> None:
        """Route-local inserts — the incremental maintenance path (a
        crawl iteration adds its bounded new-URL set instead of
        rebuilding from the whole frontier)."""
        arr = np.array(list(keys), dtype=object)
        routes = route_of(arr, self.n_parts)
        for r in np.unique(routes):
            f = self.filters.get(int(r))
            if f is None:
                f = self.filters[int(r)] = CuckooFilter(64)
            for i in np.flatnonzero(routes == r):
                f.insert(arr[i])

    def delete(self, key) -> bool:
        f = self.filters.get(int(route_of(np.array([key], object),
                                          self.n_parts)[0]))
        return f.delete(key) if f is not None else False

    def delete_batch(self, keys) -> int:
        """Deletions update only the owning partitions' filters (the
        UGC-purge path, SURVEY.md §4.4) — returns how many were found."""
        return sum(1 for k in keys if self.delete(k))

    @property
    def capacity(self) -> int:
        return sum(f.n_buckets * f.bucket_size for f in self.filters.values())

    def to_bytes(self) -> bytes:
        parts = {str(r): f.to_bytes().hex() for r, f in self.filters.items()}
        return json.dumps({"n_parts": self.n_parts, "parts": parts}).encode()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PartitionedCuckoo":
        meta = json.loads(blob)
        return cls({int(r): CuckooFilter.from_bytes(bytes.fromhex(h))
                    for r, h in meta["parts"].items()}, meta["n_parts"])


def build_partitioned_cuckoo(df: DataFrame, col: str, n_parts: int,
                             capacity_per_part: int) -> PartitionedCuckoo:
    """groupBy(route) → one filter per route group (cuckoo tables don't
    merge, so the build is routed, not OR-combined like Bloom)."""
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        f = CuckooFilter(max(capacity_per_part, len(pdf)))
        for key in pdf[col].to_numpy():
            f.insert(key)
        return pd.DataFrame({"route": [int(pdf["route"].iloc[0])],
                             "blob": [f.to_bytes()]})

    @pandas_udf("long")
    def route_udf(s: pd.Series) -> pd.Series:
        return pd.Series(route_of(s.to_numpy(), n_parts))

    rows = (df.select(col).withColumn("route", route_udf(F.col(col)))
            .groupBy("route").applyInPandas(build, "route long, blob binary")
            .collect())
    return PartitionedCuckoo(
        {int(r["route"]): CuckooFilter.from_bytes(bytes(r["blob"]))
         for r in rows}, n_parts)


def cuckoo_probe_udf(spark, pc: PartitionedCuckoo):
    bc = spark.sparkContext.broadcast(pc.to_bytes())
    holder: dict = {}

    @pandas_udf(BooleanType())
    def might_contain(s: pd.Series) -> pd.Series:
        f = holder.get("pc")
        if f is None:
            f = holder["pc"] = PartitionedCuckoo.from_bytes(bc.value)
        return pd.Series(f.contains_batch(s.to_numpy()))

    return might_contain


# ----------------------------------------------------------------------
# Route-sharded sketch table + cogroup probe — the 10^10-key layout.
#
# A single broadcast Bloom for a 10^10-row frontier at 1% fpp is ~12 GB
# — too big to ship to every executor.  At that scale the sketch lives
# as a route-keyed TABLE of shard blobs (~12 MB per 1000 routes), and
# the probe is a COGROUP: candidates repartition by route and each task
# receives one route's candidates plus that route's blob ONLY, so
# per-executor memory is one shard, not the whole sketch.  The
# broadcast path above stays the right call for <=10^8 keys.
# ----------------------------------------------------------------------

def build_sharded_blooms(df: DataFrame, col: str, n_parts: int,
                         expected_total: int, fpp: float = 0.01) -> DataFrame:
    """(route, blob) table: one Bloom shard per key route."""
    expected_per_part = max(1024, expected_total // max(n_parts, 1))

    @pandas_udf("long")
    def route_udf(s: pd.Series) -> pd.Series:
        return pd.Series(route_of(s.to_numpy(), n_parts))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = BloomSketch.empty(max(expected_per_part, len(pdf)), fpp)
        sk.add_batch(pdf[col].to_numpy())
        return pd.DataFrame({"route": [int(pdf["route"].iloc[0])],
                             "blob": [sk.to_bytes()]})

    return (df.select(col).withColumn("route", route_udf(F.col(col)))
            .groupBy("route").applyInPandas(build, "route long, blob binary"))


def update_sharded_blooms_delta(shards: DataFrame, new_keys: DataFrame,
                                col: str, n_parts: int,
                                fpp: float = 0.01) -> DataFrame:
    """The TOUCHED-route rows only — the O(touched routes) MERGE delta
    for a state-table shard commit (TableIO.merge_state on
    'frontier_sketch_shards').  ADVICE r4: a full snapshot write copied
    every untouched blob through each iteration — O(total sketch bytes,
    ~12 GB at the 10^10-URL scale) — while only routes owning a new key
    actually change; under the manifest layout the untouched blobs now
    chain by reference.

    Only the routes owning a new key are cogrouped and rewritten (one
    task = one touched route's keys + that route's blob, OR-ed executor-
    side — blobs never touch the driver).  A key routing to a shard the
    original build never created (its route group was empty) gets a
    fresh appropriately-sized shard.  The no-false-negative contract is
    preserved by induction: the input table covers the old key set, and
    every new key is OR-ed into its owning shard."""

    @pandas_udf("long")
    def route_udf(s: pd.Series) -> pd.Series:
        return pd.Series(route_of(s.to_numpy(), n_parts))

    routed = (new_keys.select(F.col(col).alias("_key"))
              .withColumn("route", route_udf(F.col("_key"))))
    touched = routed.select("route").distinct()

    def upd(bpdf: pd.DataFrame, kpdf: pd.DataFrame) -> pd.DataFrame:
        if kpdf.empty:
            return bpdf[["route", "blob"]]
        if bpdf.empty:
            sk = BloomSketch.empty(max(1024, 4 * len(kpdf)), fpp)
            route = int(kpdf["route"].iloc[0])
        else:
            sk = BloomSketch.from_bytes(bytes(bpdf["blob"].iloc[0]))
            route = int(bpdf["route"].iloc[0])
        sk.add_batch(kpdf["_key"].to_numpy())
        return pd.DataFrame({"route": [route], "blob": [sk.to_bytes()]})

    return (shards.join(F.broadcast(touched), "route", "left_semi")
            .groupby("route")
            .cogroup(routed.groupby("route"))
            .applyInPandas(upd, "route long, blob binary"))


def update_sharded_blooms(shards: DataFrame, new_keys: DataFrame, col: str,
                          n_parts: int, fpp: float = 0.01) -> DataFrame:
    """Full updated shard table: the untouched rows unioned with the
    ``update_sharded_blooms_delta`` rewrite (kept for whole-table
    consumers and the bit-identity tests; per-iteration commits use the
    delta + MERGE instead)."""

    @pandas_udf("long")
    def route_udf(s: pd.Series) -> pd.Series:
        return pd.Series(route_of(s.to_numpy(), n_parts))

    touched = (new_keys.select(F.col(col).alias("_key"))
               .withColumn("route", route_udf(F.col("_key")))
               .select("route").distinct())
    updated = update_sharded_blooms_delta(shards, new_keys, col,
                                          n_parts, fpp)
    untouched = shards.join(F.broadcast(touched), "route", "left_anti")
    return untouched.unionByName(updated)


class ShardedBloomProbe:
    """DataFrame-level membership probe over a route-sharded Bloom table
    — the at-scale replacement for the broadcast ``bloom_probe_udf``
    (which ``anti_join_with_sketch`` detects by the absence of this
    class's ``flag`` method).  Holds only the (route, blob) DataFrame
    handle; no sketch bytes ever touch the driver."""

    def __init__(self, shard_blobs: DataFrame, n_parts: int):
        self.shard_blobs = shard_blobs
        self.n_parts = n_parts

    def flag(self, candidates: DataFrame, key_col: str) -> DataFrame:
        """Returns ``candidates`` + boolean ``_maybe`` via cogroup — one
        task sees one route's candidates plus that route's shard only."""
        return cogroup_probe(candidates, self.shard_blobs, key_col,
                             self.n_parts)


def cogroup_probe(candidates: DataFrame, shard_blobs: DataFrame,
                  key_col: str, n_parts: int) -> DataFrame:
    """Adds ``_maybe`` (might_contain) to ``candidates`` by cogrouping
    them with the route-sharded sketch table: one task = one route's
    candidates + that route's blob.  Missing shard => definitely new."""
    from pyspark.sql import types as T

    @pandas_udf("long")
    def route_udf(s: pd.Series) -> pd.Series:
        return pd.Series(route_of(s.to_numpy(), n_parts))

    routed = candidates.withColumn("_route", route_udf(F.col(key_col)))
    out_schema = T.StructType(routed.schema.fields
                              + [T.StructField("_maybe", T.BooleanType())])

    def probe(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if cpdf.empty:
            return cpdf.assign(_maybe=pd.Series([], dtype=bool))
        if bpdf.empty:
            return cpdf.assign(_maybe=False)
        sk = BloomSketch.from_bytes(bytes(bpdf["blob"].iloc[0]))
        return cpdf.assign(_maybe=sk.contains_batch(
            cpdf[key_col].to_numpy()))

    return (routed.groupby("_route")
            .cogroup(shard_blobs.groupby("route"))
            .applyInPandas(probe, out_schema)
            .drop("_route"))
