"""Plan-fingerprint cache: content-addressed memoization of
intermediate frames (the reference's ``Pool`` — ``src/pool.rs:25-94``,
key derivation ``src/dataframe.rs:181-229``).

Where the reference memoizes per-column blocks under deterministic
hashes, this cache memoizes whole ``Df`` subplans: looking up a
fingerprint returns the previously ``persist()``-ed Spark DataFrame, so
a re-submitted plan (even rebuilt from scratch by a new caller) reuses
the in-memory/disk-cached partitions instead of recomputing. LRU
eviction unpersists.

Scale note: entries persist with MEMORY_AND_DISK (spills instead of
OOM-ing executors); the cache holds *references*, the data itself lives
distributed in executor block managers.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from ..frame import Df


class PlanCache:
    """Thread-safe: the server handles ``/call`` on a
    ``ThreadingHTTPServer``, so concurrent hits/misses on the same
    fingerprint race without a lock (a hit's ``move_to_end`` vs an
    eviction's ``popitem`` can raise KeyError; duplicate misses would
    orphan a persisted DataFrame). All map mutations happen under one
    lock; ``persist()`` is lazy (metadata-only), so holding the lock
    across it costs nothing — the actual compute happens at action time
    outside the lock."""

    def __init__(self, capacity: int = 32,
                 storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> None:
        self.capacity = capacity
        self.storage_level = storage_level
        self._entries: "OrderedDict[str, DataFrame]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def get(self, df: Df) -> Df:
        """Return a cached equivalent of ``df`` if one exists, else
        persist ``df`` and register it. The returned Df is always backed
        by the persisted plan."""
        fp = df.fingerprint
        with self._lock:
            if fp in self._entries:
                self.hits += 1
                self._entries.move_to_end(fp)
                return Df(self._entries[fp], fingerprint=fp)
            self.misses += 1
            sdf = df.to_spark().persist(self.storage_level)
            self._entries[fp] = sdf
            evicted = []
            while len(self._entries) > self.capacity:
                evicted.append(self._entries.popitem(last=False)[1])
        for old in evicted:
            old.unpersist()
        return Df(sdf, fingerprint=fp)

    def contains(self, df: Df) -> bool:
        with self._lock:
            return df.fingerprint in self._entries

    def clear(self) -> None:
        with self._lock:
            entries = list(self._entries.values())
            self._entries.clear()
        for sdf in entries:
            sdf.unpersist()
