"""URL-seen set operators (F8/F12) — exact anti-joins fronted by a
partitioned bloom-filter prefilter, with a cuckoo-filter variant for
workloads that need deletion (e.g. runtime blocklist removals
re-admitting URLs).

The reference's seen sets are Redis hashes probed O(1) per candidate
(redis_utils.py:86-127). Distributed, the exact check is a left_anti
join hash-partitioned by key. The bloom prefilter splits candidates
into *definitely-new* (bloom-negative — skip the join entirely) and
*maybe-seen* (bloom-positive — joined exactly), cutting the shuffled
volume by the novelty rate. Correctness never depends on the filter:
every admitted row still passed the exact anti-join
(tests assert bloom on == bloom off).

Shards are keyed by ``crc32(key) % n_shards`` so each shard's bitset
stays broadcast-sized; at 10^10 keys the shard count scales up and the
probe becomes a co-partitioned shard join instead of a broadcast —
same algebra, bigger constant.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BooleanType


def _hash2(key: str):
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class BloomFilter:
    """Plain bitset bloom; k derived from fpp, m from expected n."""

    def __init__(self, n_items: int, fpp: float = 0.01):
        n_items = max(n_items, 1)
        m = int(-n_items * np.log(fpp) / (np.log(2) ** 2)) + 1
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / n_items * np.log(2))))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def add(self, key: str):
        h1, h2 = _hash2(key)
        for i in range(self.k):
            p = (h1 + i * h2) % self.m
            self.bits[p >> 3] |= 1 << (p & 7)

    def __contains__(self, key: str) -> bool:
        h1, h2 = _hash2(key)
        for i in range(self.k):
            p = (h1 + i * h2) % self.m
            if not (self.bits[p >> 3] >> (p & 7)) & 1:
                return False
        return True

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @staticmethod
    def from_bytes(data: bytes, m: int, k: int) -> "BloomFilter":
        b = BloomFilter.__new__(BloomFilter)
        b.m, b.k = m, k
        b.bits = np.frombuffer(data, dtype=np.uint8).copy()
        return b


class CuckooFilter:
    """Bucketized cuckoo filter with 4-slot buckets and 16-bit
    fingerprints — supports deletion, unlike bloom (SURVEY.md §4:
    needed only where the seen set must forget, e.g. a runtime
    blocklist removal re-admitting URLs)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nb = 1
        while nb * self.SLOTS < capacity * 1.3:
            nb <<= 1
        self.n_buckets = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)
        self._rng_state = 0x9E3779B9

    def _fp_and_index(self, key: str):
        h1, h2 = _hash2(key)
        fp = (h1 & 0xFFFF) or 1
        i1 = h2 % self.n_buckets
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        # standard partial-key cuckoo: alt = i xor hash(fp)
        fp_hash = zlib.crc32(fp.to_bytes(2, "little")) & 0xFFFFFFFF
        return (i ^ fp_hash) % self.n_buckets

    def _insert_at(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.where(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def add(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        if self._insert_at(i1, fp) or self._insert_at(i2, fp):
            return True
        # evict (deterministic pseudo-random walk)
        i = i1
        for _ in range(self.MAX_KICKS):
            self._rng_state = (self._rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = self._rng_state % self.SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt_index(i, fp)
            if self._insert_at(i, fp):
                return True
        return False  # table full

    def __contains__(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt_index(i1, fp)):
            idx = np.where(self.table[i] == fp)[0]
            if len(idx):
                self.table[i][idx[0]] = 0
                return True
        return False


def build_bloom_shards(seen: DataFrame, key_col: str, shards: int, fpp: float):
    """Build per-shard blooms distributed (applyInPandas per shard),
    return {shard: (bytes, m, k)} collected to the driver for
    broadcast-probing."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("shard", IntegerType()),
            StructField("bits", BinaryType()),
            StructField("m", LongType()),
            StructField("k", IntegerType()),
        ]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(len(pdf), fpp)
        for key in pdf[key_col]:
            bf.add(key)
        return pd.DataFrame(
            {
                "shard": [int(pdf["_shard"].iloc[0])],
                "bits": [bf.to_bytes()],
                "m": [bf.m],
                "k": [bf.k],
            }
        )

    sharded = seen.withColumn(
        "_shard", F.abs(F.crc32(F.col(key_col).cast("string"))) % shards
    )
    rows = sharded.groupBy("_shard").applyInPandas(build, out_schema).collect()
    return {r["shard"]: (bytes(r["bits"]), r["m"], r["k"]) for r in rows}


def anti_join_seen_copart(
    cands: DataFrame,
    seen: DataFrame,
    key_col: str,
    host_col: str,
    partitions: int,
    salt_buckets: int | None = None,
    bucket_out: str = "_salt_b",
) -> DataFrame:
    """Host-co-partitioned exact anti-join: both sides are hash
    exchanged on ``host_col`` and joined on ``(host_col, key_col)``.

    Because the host determines the join partition, the join inserts no
    further exchange — and neither does anything downstream keyed by
    host (the admission fold's groupBy/windows). One shuffle of the
    candidate stream covers seen-dedupe + budget + politeness.

    ``salt_buckets``: the skew path (north_rule: host-bucket salting
    for hot domains). Both sides gain bucket = xxhash64(key) % S and
    are partitioned AND joined on (host, bucket, key) — still no extra
    exchange (the bucket is a pure function of the key, so the join is
    unchanged semantically), but a hot host's rows spread over S
    partitions. The bucket column is kept on the output (``bucket_out``)
    so the salted admission fold reuses the partitioning exchange-free;
    the caller drops it after.

    ``seen`` must carry ``host_col`` too (persisted alongside the key —
    see sources/state.py seen_scanned schema).
    """
    if salt_buckets:
        b = F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
        c = cands.withColumn(bucket_out, b).repartition(
            partitions, host_col, bucket_out
        )
        s = (
            seen.select(host_col, key_col)
            .withColumn(bucket_out, b)
            .repartition(partitions, host_col, bucket_out)
        )
        return c.join(
            s.hint("shuffle_hash"), [host_col, bucket_out, key_col], "left_anti"
        )
    c = cands.repartition(partitions, host_col)
    s = seen.select(host_col, key_col).repartition(partitions, host_col)
    # shuffle-hash hint: the per-partition seen slice is the build side —
    # avoids a sort-merge join sorting the candidate stream on a key
    # order the downstream windows can't reuse
    return c.join(s.hint("shuffle_hash"), [host_col, key_col], "left_anti")


def anti_join_seen(
    cands: DataFrame,
    seen: DataFrame,
    key_col: str,
    use_bloom: bool = False,
    shards: int = 8,
    fpp: float = 0.01,
) -> DataFrame:
    """Rows of ``cands`` whose ``key_col`` is NOT in ``seen``.
    Optionally prefilter with broadcast bloom shards: bloom-negative
    rows bypass the exact anti-join shuffle entirely."""
    if not use_bloom or seen.isEmpty():
        return cands.join(seen.select(key_col).distinct(), key_col, "left_anti")

    blooms = build_bloom_shards(seen, key_col, shards, fpp)
    spark = cands.sparkSession
    bc = spark.sparkContext.broadcast(blooms)

    @pandas_udf(BooleanType())
    def maybe_seen(s: pd.Series) -> pd.Series:
        local = {
            sh: BloomFilter.from_bytes(b, m, k)
            for sh, (b, m, k) in bc.value.items()
        }
        def probe(key):
            sh = zlib.crc32(str(key).encode()) % shards
            bf = local.get(sh)
            return bf is not None and key in bf
        return s.map(probe)

    flagged = cands.withColumn("_maybe", maybe_seen(F.col(key_col)))
    definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    checked = maybe.join(seen.select(key_col).distinct(), key_col, "left_anti")
    return definite_new.unionByName(checked)
