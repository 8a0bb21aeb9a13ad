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


# 16-byte siphash keys for pandas' vectorized string hasher — two
# independent 64-bit hash streams per key, ~100 ns/key in C instead of
# a per-key Python blake2b call
_BLOOM_HK1 = "tspider.bloom.h1"
_BLOOM_HK2 = "tspider.bloom.h2"


def _hash2_batch(keys) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(keys, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_BLOOM_HK1).astype(np.uint64)
    h2 = pd.util.hash_array(arr, hash_key=_BLOOM_HK2).astype(np.uint64)
    return h1, h2


class BloomFilter:
    """Plain bitset bloom; k derived from fpp, m from expected n.
    add/probe are numpy-batch operations (double hashing: p_i =
    (h1 + i*h2) mod m); the scalar forms exist for tests only."""

    def __init__(self, n_items: int, fpp: float = 0.01):
        n_items = max(n_items, 1)
        m = int(-n_items * np.log(fpp) / (np.log(2) ** 2)) + 1
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / n_items * np.log(2))))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _positions(self, keys) -> np.ndarray:
        h1, h2 = _hash2_batch(keys)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(
            np.int64
        )  # shape (k, n)

    def add_batch(self, keys):
        p = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, p >> 3, (1 << (p & 7)).astype(np.uint8))

    def contains_batch(self, keys) -> np.ndarray:
        p = self._positions(keys)
        hit = (self.bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def add(self, key: str):
        self.add_batch([key])

    def __contains__(self, key: str) -> bool:
        return bool(self.contains_batch([key])[0])

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


def _shard_col(key_col: str, shards: int):
    return (F.abs(F.crc32(F.col(key_col).cast("string"))) % shards).cast("int")


_BLOOM_SHARD_SCHEMA = (
    "shard int, bits binary, m long, k int"
)


def build_bloom_shard_df(
    seen: DataFrame, key_col: str, shards: int, fpp: float
) -> DataFrame:
    """Per-shard blooms built distributed (applyInPandas per shard,
    numpy-batch adds — no per-key Python) as a DataFrame
    (shard, bits, m, k). Callers either collect+broadcast it (small
    aggregate bloom) or co-partition-join it (10^10-key regime, where
    the aggregate bloom no longer fits per executor)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(len(pdf), fpp)
        bf.add_batch(pdf[key_col].to_numpy())
        return pd.DataFrame(
            {
                "shard": [int(pdf["_shard"].iloc[0])],
                "bits": [bf.to_bytes()],
                "m": [bf.m],
                "k": [bf.k],
            }
        )

    sharded = seen.withColumn("_shard", _shard_col(key_col, shards))
    return sharded.groupBy("_shard").applyInPandas(build, _BLOOM_SHARD_SCHEMA)


def build_bloom_shards(seen: DataFrame, key_col: str, shards: int, fpp: float):
    """Collected {shard: (bytes, m, k)} form for broadcast-probing."""
    rows = build_bloom_shard_df(seen, key_col, shards, fpp).collect()
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


def _flag_maybe_broadcast(
    cands: DataFrame, seen: DataFrame, key_col: str, shards: int, fpp: float
) -> DataFrame:
    """_maybe column via driver-collected, broadcast bloom shards —
    right while the aggregate bloom fits per executor (~1.2 GB at 10^9
    keys / 1% fpp). Probe is numpy-batched per Arrow batch."""
    blooms = build_bloom_shards(seen, key_col, shards, fpp)
    spark = cands.sparkSession
    bc = spark.sparkContext.broadcast(blooms)

    @pandas_udf(BooleanType())
    def maybe_seen(s: pd.Series, sh_of: pd.Series) -> pd.Series:
        local = {
            sh: BloomFilter.from_bytes(b, m, k)
            for sh, (b, m, k) in bc.value.items()
        }
        shard_arr = sh_of.to_numpy()
        out = np.zeros(len(s), dtype=bool)
        karr = s.to_numpy(dtype=object)
        for sh, bf in local.items():
            mask = shard_arr == sh
            if mask.any():
                out[mask] = bf.contains_batch(karr[mask])
        return pd.Series(out)

    # shard id computed JVM-side (same crc32 the build uses) so the
    # python side is pure numpy batch work
    return cands.withColumn(
        "_maybe", maybe_seen(F.col(key_col), _shard_col(key_col, shards))
    )


def _flag_maybe_copart(
    cands: DataFrame, seen: DataFrame, key_col: str, shards: int, fpp: float
) -> DataFrame:
    """_maybe column via a co-partitioned shard join (cogrouped
    applyInPandas): candidates hash to their shard, each task probes
    ONE shard's bitset — per-executor memory stays one-shard-sized no
    matter how many keys the seen set holds. This is the 10^10-key
    regime; raise ``shards`` with the key count so a shard's bitset
    stays ~100 MB. Probe is numpy-batched; candidate rows ride one
    Arrow round-trip."""
    shard_df = build_bloom_shard_df(seen, key_col, shards, fpp)
    cands2 = cands.withColumn("_shard", _shard_col(key_col, shards))
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in cands2.schema.fields
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return left.assign(_maybe=pd.Series([], dtype=bool))
        if not len(right):
            return left.assign(_maybe=False)
        bf = BloomFilter.from_bytes(
            bytes(right["bits"].iloc[0]), int(right["m"].iloc[0]), int(right["k"].iloc[0])
        )
        return left.assign(
            _maybe=bf.contains_batch(left[key_col].to_numpy(dtype=object))
        )

    return (
        cands2.groupBy("_shard")
        .cogroup(shard_df.groupBy("shard"))
        .applyInPandas(probe, f"{out_fields}, _maybe boolean")
        .drop("_shard")
    )


def anti_join_seen(
    cands: DataFrame,
    seen: DataFrame,
    key_col: str,
    use_bloom: bool = False,
    shards: int = 8,
    fpp: float = 0.01,
    probe: str = "broadcast",
) -> DataFrame:
    """Rows of ``cands`` whose ``key_col`` is NOT in ``seen``.
    Optionally prefilter with bloom shards: bloom-negative rows bypass
    the exact anti-join shuffle entirely. ``probe``: "broadcast"
    (driver-collected shards, small seen sets) or "copart"
    (co-partitioned shard join — the 10^10 path; nothing is ever
    collected to the driver or fully replicated to executors)."""
    if not use_bloom or seen.isEmpty():
        return cands.join(seen.select(key_col).distinct(), key_col, "left_anti")

    if probe == "copart":
        flagged = _flag_maybe_copart(cands, seen, key_col, shards, fpp)
    else:
        flagged = _flag_maybe_broadcast(cands, seen, key_col, shards, fpp)
    definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    checked = maybe.join(seen.select(key_col).distinct(), key_col, "left_anti")
    return definite_new.unionByName(checked)
