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

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BooleanType


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
    needed where the seen set must forget, e.g. a runtime blocklist
    removal re-admitting URLs — the inverse of the reference's
    tools/block_domain.py, whose Redis seen set never forgets).

    Deletion safety (why the definite-new bypass stays exact): every
    insert stores its own fingerprint copy (duplicates occupy separate
    slots), so deleting a key that WAS inserted removes exactly one
    copy and every other inserted key keeps at least one — no false
    negatives for still-inserted keys. The engine only ever deletes
    keys it previously inserted (the forgotten blocked-task keys).

    Hashing is the same vectorized pandas string hasher the bloom
    uses, so batch ops are numpy end-to-end except the (inherently
    sequential) eviction walk of add."""

    SLOTS = 4
    MAX_KICKS = 500
    _FP_ALT = None  # lazy 65536-entry table: crc32 of each fingerprint

    def __init__(self, capacity: int):
        nb = 1
        while nb * self.SLOTS < capacity * 1.3:
            nb <<= 1
        self.n_buckets = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)
        self._rng_state = 0x9E3779B9

    @classmethod
    def _fp_alt_table(cls) -> np.ndarray:
        if cls._FP_ALT is None:
            cls._FP_ALT = np.array(
                [zlib.crc32(i.to_bytes(2, "little")) for i in range(1 << 16)],
                dtype=np.int64,
            )
        return cls._FP_ALT

    def _fp_i1_batch(self, keys) -> tuple[np.ndarray, np.ndarray]:
        h1, h2 = _hash2_batch(keys)
        fp = (h1 & np.uint64(0xFFFF)).astype(np.int64)
        fp[fp == 0] = 1
        i1 = (h2 % np.uint64(self.n_buckets)).astype(np.int64)
        return fp, i1

    def _alt_batch(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # standard partial-key cuckoo: alt = i xor hash(fp)
        return (i ^ self._fp_alt_table()[fp]) % self.n_buckets

    def _fp_and_index(self, key: str):
        fp, i1 = self._fp_i1_batch([key])
        return int(fp[0]), int(i1[0])

    def _alt_index(self, i: int, fp: int) -> int:
        return int((i ^ self._fp_alt_table()[fp]) % self.n_buckets)

    def _insert_at(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.where(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def _add_hashed(self, fp: int, i1: int, i2: int) -> bool:
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

    def add(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        return self._add_hashed(fp, i1, self._alt_index(i1, fp))

    def add_batch(self, keys) -> int:
        """Insert all keys; returns how many FAILED (0 = all in).
        Hashing is one vectorized pass; only slot placement loops."""
        if not len(keys):
            return 0
        fp, i1 = self._fp_i1_batch(keys)
        i2 = self._alt_batch(i1, fp)
        failed = 0
        for j in range(len(fp)):
            if not self._add_hashed(int(fp[j]), int(i1[j]), int(i2[j])):
                failed += 1
        return failed

    def contains_batch(self, keys) -> np.ndarray:
        if not len(keys):
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_i1_batch(keys)
        i2 = self._alt_batch(i1, fp)
        fpc = fp.astype(np.uint16)[:, None]
        return (self.table[i1] == fpc).any(axis=1) | (
            self.table[i2] == fpc
        ).any(axis=1)

    def __contains__(self, key: str) -> bool:
        return bool(self.contains_batch([key])[0])

    def delete(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt_index(i1, fp)):
            idx = np.where(self.table[i] == fp)[0]
            if len(idx):
                self.table[i][idx[0]] = 0
                return True
        return False

    def delete_batch(self, keys) -> int:
        """Delete one stored copy per key; returns how many keys had
        no copy to delete (0 = all found)."""
        if not len(keys):
            return 0
        fp, i1 = self._fp_i1_batch(keys)
        i2 = self._alt_batch(i1, fp)
        missing = 0
        for j in range(len(fp)):
            f = int(fp[j])
            hit = False
            for i in (int(i1[j]), int(i2[j])):
                idx = np.where(self.table[i] == f)[0]
                if len(idx):
                    self.table[i][idx[0]] = 0
                    hit = True
                    break
            if not hit:
                missing += 1
        return missing

    @property
    def occupancy(self) -> int:
        return int(np.count_nonzero(self.table))

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @staticmethod
    def from_bytes(data: bytes, n_buckets: int) -> "CuckooFilter":
        cf = CuckooFilter.__new__(CuckooFilter)
        cf.n_buckets = int(n_buckets)
        cf.table = (
            np.frombuffer(data, dtype=np.uint16)
            .reshape(cf.n_buckets, CuckooFilter.SLOTS)
            .copy()
        )
        cf._rng_state = 0x9E3779B9
        return cf


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
    code_col: str | None = None,
) -> DataFrame:
    """Exact seen anti-join on ``(host_col, key_col)``, leaving every
    exchange decision to the planner.

    REWRITTEN round 4 after a measured plan audit. The old shape
    pre-repartitioned both sides on ``host_col`` and hinted
    shuffle_hash, on the theory that the join and the downstream
    admission fold would share the one host exchange. Spark (4.1)
    does not accept subset co-partitioning for shuffled joins — the
    join ALWAYS re-exchanges both sides on the full (host, key) —
    so the pre-repartitions only STACKED a wasted full-stream shuffle
    on top: measured 2764 MB shuffled per 24M-candidate wave vs
    1907 MB without (+45%). The right shape is no explicit exchange
    at all:

    - small seen (most waves early in a crawl, and every prefilter
      verify): the planner broadcasts the seen side — the candidate
      stream is not exchanged here at all, and the admission fold's
      windows insert the single host exchange where it is needed;
    - big seen (10^10 regime): EnsureRequirements inserts exactly one
      (host, key) exchange per side for the sort-merge join, and the
      fold re-exchanges the (budget-bounded survivors of the) stream
      on host — two candidate exchanges, the Spark-4.1 minimum for an
      exact big-seen anti-join followed by a host-keyed fold. A
      seen-side stored layout BUCKETED BY (host, key) removes the
      seen exchange entirely — no parameter needed, the bucketed
      scan's partitioning satisfies the join through
      EnsureRequirements (TSPIDER_BENCH_SEEN_BUCKETED demonstrates).

    Plan shape pinned by tests/test_plan_pins.py::
    test_copart_anti_join_adds_no_stacked_exchange.

    ``partitions`` is kept for signature stability; the fold's own
    ``partitions=N`` (or the window's ENSURE exchange) sets the width.

    ``salt_buckets``: the skew path (north_rule: host-bucket salting
    for hot domains). Both sides gain bucket = xxhash64(key) % S and
    the join keys become (host, bucket, key): a hot host's rows
    spread over S partitions in the join exchange and in the salted
    fold (whose windows key on (host, bucket) and insert their own
    exchange). The bucket column is kept on the output
    (``bucket_out``); the caller drops it after.

    ``seen`` must carry ``host_col`` too (persisted alongside the key —
    see sources/state.py seen_scanned schema).

    ``code_col``: dictionary-code the fold — both sides gain
    code = xxhash64(host) as a leading join key (host stays a key
    too, so a 64-bit collision can never merge two hosts), and
    downstream windows keyed (code, host) sort by the long first,
    touching the string only on ties. The kept code column lets
    admit_wave reuse it.
    """
    if code_col:
        code = F.xxhash64(F.col(host_col))
        c = cands.withColumn(code_col, code)
        s = seen.select(host_col, key_col).withColumn(code_col, code)
        return c.join(s, [code_col, host_col, key_col], "left_anti")
    if salt_buckets:
        b = F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
        c = cands.withColumn(bucket_out, b)
        s = seen.select(host_col, key_col).withColumn(bucket_out, b)
        return c.join(s, [host_col, bucket_out, key_col], "left_anti")
    s = seen.select(host_col, key_col)
    return cands.join(s, [host_col, key_col], "left_anti")


def _flag_maybe_broadcast(
    cands: DataFrame, seen: DataFrame, key_col: str, shards: int, fpp: float
) -> DataFrame:
    """_maybe column via driver-collected, broadcast bloom shards —
    right while the aggregate bloom fits per executor (~1.2 GB at 10^9
    keys / 1% fpp). Probe is numpy-batched per Arrow batch."""
    blooms = build_bloom_shards(seen, key_col, shards, fpp)
    spark = cands.sparkSession
    bc = spark.sparkContext.broadcast(blooms)
    memo = {}  # per-task filter reconstruction (not per Arrow batch)

    @pandas_udf(BooleanType())
    def maybe_seen(s: pd.Series, sh_of: pd.Series) -> pd.Series:
        local = memo.get("f")
        if local is None:
            local = memo["f"] = {
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


# ---------------------------------------------------------------------------
# Persistent (incrementally maintained) cuckoo seen-filter shards.
#
# The bloom prefilter above is REBUILT from the full seen table every
# wave — a full-scan cost that grows with the accumulated key count
# (fine at 10^8, a per-wave tax at 10^10). The cuckoo shard table is
# the stateful alternative: it lives in the state store, each wave
# merges ONLY the wave's admitted keys into it (O(delta), cap-bounded),
# and — uniquely — it supports deletion, which the blocklist-removal
# re-admission path needs (CrawlEngine.remove_blocklist). Same
# maybe/definite-new split as the bloom: false positives fall through
# to the exact anti-join; false negatives can't happen for inserted
# keys (see CuckooFilter docstring), so the bypass stays exact.

_CUCKOO_SHARD_SCHEMA = "shard int, tbl binary, n_buckets long"


def build_cuckoo_shard_df(
    seen: DataFrame, key_col: str, shards: int, capacity_per_shard: int
) -> DataFrame:
    """Bootstrap: per-shard cuckoo filters built distributed from the
    full seen table (one-time; afterwards maintenance is per-delta).
    Each shard's table is ~2.6 bytes/key of capacity — size ``shards``
    so one shard stays ~100 MB at the target key count."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(max(capacity_per_shard, int(len(pdf) * 1.5) + 8))
        failed = cf.add_batch(pdf[key_col].to_numpy(dtype=object))
        if failed:
            raise RuntimeError(
                f"cuckoo shard overflow ({failed} keys homeless) — "
                "raise capacity_per_shard or the shard count"
            )
        return pd.DataFrame(
            {
                "shard": [int(pdf["_shard"].iloc[0])],
                "tbl": [cf.to_bytes()],
                "n_buckets": [cf.n_buckets],
            }
        )

    sharded = seen.select(key_col).withColumn(
        "_shard", _shard_col(key_col, shards)
    )
    return sharded.groupBy("_shard").applyInPandas(build, _CUCKOO_SHARD_SCHEMA)


def apply_cuckoo_delta(
    shard_df: DataFrame,
    delta: DataFrame,
    key_col: str,
    shards: int,
    capacity_per_shard: int,
    op: str = "add",
) -> DataFrame:
    """O(delta) filter maintenance: cogroup the persisted shards with
    the delta keys and add/delete per shard. Shards without a delta
    pass through byte-identical; delta keys for a shard that doesn't
    exist yet get a fresh filter. ``op="delete"`` must only be fed
    keys that were previously inserted (deletion-safety contract)."""
    if op not in ("add", "delete"):
        raise ValueError(f"op must be add|delete, got {op!r}")

    def merge(old: pd.DataFrame, d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return old[["shard", "tbl", "n_buckets"]]
        if len(old) > 1:
            raise RuntimeError(
                f"cuckoo shard {int(old['shard'].iloc[0])} has "
                f"{len(old)} persisted rows (expected <= 1) — refuse to "
                "merge a delta into an ambiguous filter state"
            )
        if len(old):
            cf = CuckooFilter.from_bytes(
                bytes(old["tbl"].iloc[0]), int(old["n_buckets"].iloc[0])
            )
            sh = int(old["shard"].iloc[0])
        else:
            cf = CuckooFilter(capacity_per_shard)
            sh = int(d["_shard"].iloc[0])
        keys = d[key_col].to_numpy(dtype=object)
        if op == "add":
            failed = cf.add_batch(keys)
            if failed:
                raise RuntimeError(
                    f"cuckoo shard {sh} overflow ({failed} keys homeless) "
                    "— raise cuckoo_capacity"
                )
        else:
            cf.delete_batch(keys)
        return pd.DataFrame(
            {"shard": [sh], "tbl": [cf.to_bytes()], "n_buckets": [cf.n_buckets]}
        )

    d2 = delta.select(key_col).withColumn("_shard", _shard_col(key_col, shards))
    return (
        shard_df.groupBy("shard")
        .cogroup(d2.groupBy("_shard"))
        .applyInPandas(merge, _CUCKOO_SHARD_SCHEMA)
    )


def _flag_maybe_cuckoo_copart(
    cands: DataFrame, shard_df: DataFrame, key_col: str, shards: int
) -> DataFrame:
    """_maybe column via a co-partitioned cuckoo shard join (cogrouped
    applyInPandas) — the cuckoo twin of :func:`_flag_maybe_copart`:
    candidates hash to their shard, each task deserializes ONE shard's
    table, so per-executor memory stays one-shard-sized no matter how
    big the persisted filter grows (~26 GB at 10^10 keys — the regime
    where the broadcast probe's per-wave driver collect is the
    scale-killer). Probe is numpy-batched; candidate rows ride one
    Arrow round-trip."""
    cands2 = cands.withColumn("_shard", _shard_col(key_col, shards))
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in cands2.schema.fields
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return left.assign(_maybe=pd.Series([], dtype=bool))
        if not len(right):
            return left.assign(_maybe=False)
        if len(right) != 1:
            # Duplicate rows for one shard mean the persisted filter
            # was appended instead of replaced (or re-sharded mid-
            # crawl): probing only one of them would yield false
            # negatives that BYPASS the exact anti-join and re-admit
            # crawled URLs. Fail loudly instead.
            raise RuntimeError(
                f"cuckoo shard {int(right['shard'].iloc[0])} has "
                f"{len(right)} persisted rows (expected 1) — seen_filter "
                "was appended instead of replaced, or bloom_shards "
                "changed mid-crawl"
            )
        cf = CuckooFilter.from_bytes(
            bytes(right["tbl"].iloc[0]), int(right["n_buckets"].iloc[0])
        )
        return left.assign(
            _maybe=cf.contains_batch(left[key_col].to_numpy(dtype=object))
        )

    return (
        cands2.groupBy("_shard")
        .cogroup(shard_df.groupBy("shard"))
        .applyInPandas(probe, f"{out_fields}, _maybe boolean")
        .drop("_shard")
    )


def anti_join_seen_cuckoo(
    cands: DataFrame,
    seen: DataFrame,
    key_col: str,
    filt_rows: list | None,
    shards: int,
    shard_df: DataFrame | None = None,
    host_col: str | None = None,
    seen_delta: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``cands`` not in ``seen`` (∪ ``seen_delta``),
    prefiltered by the persistent cuckoo shard table. Two probe
    regimes, same maybe/definite-new split (false positives fall
    through to the exact anti-join; false negatives can't happen for
    inserted keys, so the bypass is exact):

    - ``shard_df`` given: co-partitioned cogroup probe
      (:func:`_flag_maybe_cuckoo_copart`) — the filter NEVER leaves
      the executors; the 10^10-key regime.
    - else ``filt_rows`` (collected seen_filter rows): broadcast
      probe, mirroring _flag_maybe_broadcast — fine while the whole
      filter fits driver/executor memory.

    ``host_col`` (r5, bucketed seen layout): verify-join on
    ``(host_col, key_col)`` instead of the key alone — semantically
    identical (the hostname is a pure function of the scan key), but
    it makes the join keys EQUAL the persisted snapshot's bucket keys,
    so a (hostname, scan_key)-bucketed ``seen`` scan satisfies the
    join's required distribution straight off storage and the
    accumulated state is never exchanged. The ``.distinct()`` is
    dropped in this mode: an anti-join's result is unchanged by
    right-side duplicates, and the distinct's hash aggregate would
    re-shuffle the very scan the bucketing keeps in place.
    ``seen_delta``: rows appended since the bucketed snapshot
    (broadcast-sized between compactions) — verified with a second,
    planner-broadcast anti-join.
    """
    verify_keys = ([host_col] if host_col else []) + [key_col]

    def _verify(df: DataFrame) -> DataFrame:
        if host_col:
            checked = df.join(
                seen.select(*verify_keys), verify_keys, "left_anti"
            )
        else:
            checked = df.join(
                seen.select(key_col).distinct(), key_col, "left_anti"
            )
        if seen_delta is not None:
            checked = checked.join(
                seen_delta.select(*verify_keys), verify_keys, "left_anti"
            )
        return checked

    if shard_df is not None:
        flagged = _flag_maybe_cuckoo_copart(cands, shard_df, key_col, shards)
        definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
        maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
        return definite_new.unionByName(_verify(maybe))
    if not filt_rows:
        return _verify(cands)
    spark = cands.sparkSession
    payload = {
        int(r["shard"]): (bytes(r["tbl"]), int(r["n_buckets"]))
        for r in filt_rows
    }
    bc = spark.sparkContext.broadcast(payload)
    memo = {}  # per-task filter reconstruction (not per Arrow batch)

    @pandas_udf(BooleanType())
    def maybe_seen(s: pd.Series, sh_of: pd.Series) -> pd.Series:
        local = memo.get("f")
        if local is None:
            local = memo["f"] = {
                sh: CuckooFilter.from_bytes(b, nb)
                for sh, (b, nb) in bc.value.items()
            }
        shard_arr = sh_of.to_numpy()
        karr = s.to_numpy(dtype=object)
        out = np.zeros(len(s), dtype=bool)
        for sh, cf in local.items():
            mask = shard_arr == sh
            if mask.any():
                out[mask] = cf.contains_batch(karr[mask])
        return pd.Series(out)

    flagged = cands.withColumn(
        "_maybe", maybe_seen(F.col(key_col), _shard_col(key_col, shards))
    )
    definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    return definite_new.unionByName(_verify(maybe))


def bloom_fpr_eval(
    seen: DataFrame,
    probe: DataFrame,
    key_col: str = "scan_key",
    m: int = 1 << 15,
    k: int = 3,
) -> DataFrame:
    """Measured vs theoretical bloom false-positive rate — the
    "measure, don't guess" harness for sizing the seen-set prefilter
    before a 10^10-URL run (the analytic (1−e^{−kn/m})^k assumes
    ideal hashes; this measures YOUR key distribution).

    Declarative bloom, set semantics instead of a bit array: the
    filter is the DISTINCT position set of the seen keys' k
    double-hashed probes (p_i = (h1 + i·h2) mod m, the same scheme the
    engine's BloomFilter runs), and a probe key false-positives when
    all k of its positions hit. Hashing here is the portable md5
    60-bit family (the engine's fast path uses pandas siphash — same
    uniformity class, this one is DuckDB-replayable so the WHOLE eval
    is oracle-pinned).

    Probe keys already present in ``seen`` are excluded (those are
    true positives, not errors). fpr_theory uses the MEASURED fill
    ratio: (bits_set / m)^k — exact double math on integer counts.

    One row: (n_seen, n_probe, m, k, bits_set, n_fp, fpr, fpr_theory).
    """
    def h(col, salt):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10
        ).cast("long")

    def positions(df):
        i = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("i")
        d = df.select(F.col(key_col).alias("_k")).select(
            "_k", h(F.col("_k"), "bf1:").alias("_h1"),
            h(F.col("_k"), "bf2:").alias("_h2"), i,
        )
        return d.select(
            "_k", F.pmod(F.col("_h1") + F.col("i") * F.col("_h2"), F.lit(m)).alias("p")
        )

    seen_k = seen.select(key_col).distinct()
    probe_k = probe.select(key_col).distinct().join(
        seen_k, key_col, "left_anti"
    )
    bits = positions(seen_k).select("p").distinct()
    hits = (
        positions(probe_k)
        .join(bits, "p", "left_semi")
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_nh"))
        .filter(F.col("_nh") == k)
    )
    a_seen = seen_k.agg(F.count(F.lit(1)).cast("long").alias("n_seen"))
    a_probe = probe_k.agg(F.count(F.lit(1)).cast("long").alias("n_probe"))
    a_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))
    a_fp = hits.agg(F.count(F.lit(1)).cast("long").alias("n_fp"))
    return (
        a_seen.crossJoin(F.broadcast(a_probe))
        .crossJoin(F.broadcast(a_bits))
        .crossJoin(F.broadcast(a_fp))
        .select(
            "n_seen",
            "n_probe",
            F.lit(int(m)).alias("m"),
            F.lit(int(k)).alias("k"),
            "bits_set",
            "n_fp",
            F.when(
                F.col("n_probe") > 0, F.col("n_fp") / F.col("n_probe")
            ).alias("fpr"),
            F.round(
                F.pow(F.col("bits_set") / F.lit(float(m)), F.lit(float(k))), 8
            ).alias("fpr_theory"),
        )
    )


def bloom_fpr_oracle_sql(
    seen_cte: str,
    probe_cte: str,
    key_col: str = "scan_key",
    m: int = 1 << 15,
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`bloom_fpr_eval`; the CTEs must define
    ``seen(<key_col>)`` and ``probe(<key_col>)``."""
    def h(salt):
        return (
            f"('0x' || substring(md5('{salt}' || {key_col}), 1, 15))::BIGINT"
        )

    return f"""
 with {seen_cte},
 {probe_cte},
 sk as (select distinct {key_col} from seen),
 pk as (select distinct {key_col} from probe
        where {key_col} not in (select {key_col} from sk)),
 spos as (
   select distinct ({h('bf1:')} + i * {h('bf2:')}) % {m} as p
   from sk cross join (select unnest(range(0, {k})) as i)
 ),
 ppos as (
   select {key_col} as kk, ({h('bf1:')} + i * {h('bf2:')}) % {m} as p
   from pk cross join (select unnest(range(0, {k})) as i)
 ),
 fp as (
   select kk from ppos join spos using (p) group by kk
   having count(*) = {k}
 ),
 c as (select (select count(*) from sk)::BIGINT as n_seen,
              (select count(*) from pk)::BIGINT as n_probe,
              (select count(*) from spos)::BIGINT as bits_set,
              (select count(*) from fp)::BIGINT as n_fp)
 select n_seen, n_probe, {int(m)} as m, {int(k)} as k, bits_set, n_fp,
        case when n_probe > 0 then n_fp / n_probe end as fpr,
        round(power(bits_set / cast({float(m)} as double),
                    cast({float(k)} as double)), 8) as fpr_theory
 from c"""
