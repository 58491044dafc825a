"""Shared band index for incremental MinHash — actor-sharded key→ids map.

``minhash_incremental`` (``stages/dedup.py``) persists LSH band rows as
parquet state deltas; its original per-call cost re-READ every historical
band row (16 B × num_bands per historical doc) to find delta collisions —
the self-documented limit of round 4.  This module is the named extension:
a set of session-lived Ray actors, each holding ONE hash shard of the
(band_key → doc ids) map as sorted int64 arrays, so a delta's collision
probe is ``O(delta_bands × log(history_bands))`` searchsorted lookups and
history files are read at most ONCE per process lifetime (and not at all
for deltas ingested in-session — the common daily-crawl loop).

Scale accounting (100-TB story): index memory is 16 B per band row =
``16 × num_bands`` B per historical doc (256 B/doc at the default 16
bands) spread across shards — ~2.5 TB per 10^10 docs, i.e. ~10 GB/node on
a 256-node cluster, which is why the shard count is configurable and the
shards are plain named actors (placement spreads them).  The parquet state
remains the source of truth: a fresh process lazily loads each published
delta directory once (every shard scans the files and keeps its own hash
shard — n_shards× read amplification on the cold load, amortized over the
session), and crash-recovery needs nothing beyond the existing atomic
single-rename delta publish.

Consistency contract: lookups may return duplicate (band_key, id) rows
(per-block routing can probe the same key twice; a torn ingest re-loaded
from files can double rows) — the pair-emission kernel dedups ids per band
group, so duplicates are harmless by construction, and a 64-bit collision
only ever ADDS a candidate that the signature verify rejects.
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import ray

__all__ = [
    "band_index_actors",
    "band_index_sync",
    "band_index_lookup",
    "band_index_ingest",
    "band_index_stats",
    "band_index_reset",
]

_NAMESPACE = "mbr_band_index"
_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)


def _n_shards() -> int:
    return max(1, int(os.environ.get("GRAFT_BAND_INDEX_SHARDS", "8")))


def _shard_of(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard router — must be identical everywhere a key is routed."""
    return (keys.view(np.uint64) * _SEED_MIX % np.uint64(n_shards)).astype(np.int64)


def _actor_name(state_dir: str, i: int) -> str:
    h = hashlib.sha1(os.path.abspath(state_dir).encode()).hexdigest()[:12]
    return f"bandidx_{h}_{i:03d}"


def _empty(id_col: str) -> pa.Table:
    return pa.table(
        {
            "band_key": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "is_new": pa.array([], pa.int64()),
        }
    )


@ray.remote(num_cpus=0)
class _BandIndexShard:
    """One hash shard of the band index: (keys, ids) kept sorted by key.

    ``num_cpus=0`` — shards are memory holders with short vectorized
    lookups; they must not occupy scheduler slots the pipeline needs."""

    def __init__(self) -> None:
        self._keys = np.zeros(0, dtype=np.int64)
        self._ids = np.zeros(0, dtype=np.int64)
        self._loaded: set[str] = set()
        self._files_read = 0
        self._cfg: tuple[int, int] | None = None

    def configure(self, idx: int, n_shards: int) -> None:
        if self._cfg is None:
            self._cfg = (idx, n_shards)
        elif self._cfg != (idx, n_shards):
            raise ValueError(
                f"band index shard already configured as {self._cfg}, got "
                f"({idx}, {n_shards}) — the shard count is fixed per state_dir "
                "per session (band_index_reset() to change it)"
            )

    def stats(self) -> dict:
        return {
            "rows": int(len(self._keys)),
            "files_read": self._files_read,
            "loaded": sorted(self._loaded),
        }

    def _absorb(self, keys: np.ndarray, ids: np.ndarray) -> None:
        if len(keys) == 0:
            return
        k = np.concatenate([self._keys, keys.astype(np.int64, copy=False)])
        i = np.concatenate([self._ids, ids.astype(np.int64, copy=False)])
        order = np.argsort(k, kind="stable")
        self._keys, self._ids = k[order], i[order]

    def load_files(self, delta_name: str, files: list[str], id_col: str) -> int:
        """Load this shard's rows of one published state delta; idempotent
        per delta_name.  Returns files actually read (0 when skipped)."""
        if delta_name in self._loaded:
            return 0
        if self._cfg is None:
            raise RuntimeError("configure() must run before load_files()")
        idx, n = self._cfg
        ks, ds = [], []
        for f in files:
            import pyarrow.parquet as pq

            t = pq.read_table(f, columns=["band_key", id_col])
            self._files_read += 1
            k = np.asarray(t["band_key"], dtype=np.int64)
            m = _shard_of(k, n) == idx
            ks.append(k[m])
            ds.append(np.asarray(t[id_col], dtype=np.int64)[m])
        if ks:
            self._absorb(np.concatenate(ks), np.concatenate(ds))
        self._loaded.add(delta_name)
        return len(files)

    def append_rows(self, keys: np.ndarray, ids: np.ndarray) -> None:
        """Direct in-session ingest of pre-routed delta rows (no file read)."""
        self._absorb(keys, ids)

    def mark_loaded(self, delta_name: str) -> None:
        self._loaded.add(delta_name)

    def lookup(self, query_keys: np.ndarray, id_col: str) -> pa.Table:
        """History rows whose band_key ∈ ``query_keys`` (sorted unique) —
        O(len(query) × log(shard rows)) + output size, never a shard scan."""
        if len(query_keys) == 0 or len(self._keys) == 0:
            return _empty(id_col)
        left = np.searchsorted(self._keys, query_keys, side="left")
        right = np.searchsorted(self._keys, query_keys, side="right")
        counts = right - left
        total = int(counts.sum())
        if total == 0:
            return _empty(id_col)
        base = np.repeat(left, counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        sel = base + offs
        return pa.table(
            {
                "band_key": pa.array(self._keys[sel]),
                id_col: pa.array(self._ids[sel]),
                "is_new": pa.array(np.zeros(total, dtype=np.int64)),
            }
        )


@ray.remote
def _route_lookup(block: pa.Table, shards: list, n_shards: int, id_col: str) -> pa.Table:
    """Per-block collision probe: unique keys → the owning shards → one
    concatenated history-collision table.  Runs as a task so block bytes
    never touch the driver."""
    if block.num_rows == 0:
        return _empty(id_col)
    k = np.unique(np.asarray(block["band_key"], dtype=np.int64))  # sorted
    s = _shard_of(k, n_shards)
    futs = [
        shards[i].lookup.remote(k[s == i], id_col)
        for i in range(n_shards)
        if (s == i).any()
    ]
    tabs = [t for t in ray.get(futs) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else _empty(id_col)


@ray.remote
def _route_ingest(block: pa.Table, shards: list, n_shards: int, id_col: str) -> int:
    if block.num_rows == 0:
        return 0
    k = np.asarray(block["band_key"], dtype=np.int64)
    i_ = np.asarray(block[id_col], dtype=np.int64)
    s = _shard_of(k, n_shards)
    ray.get(
        [
            shards[j].append_rows.remote(k[s == j], i_[s == j])
            for j in range(n_shards)
            if (s == j).any()
        ]
    )
    return block.num_rows


# Named non-detached actors are reference-counted: if no handle survives
# the call, the shards die between deltas and every call re-loads history —
# defeating the index.  The cache pins one handle per shard for the DRIVER
# process lifetime, so the index lives exactly as long as the session (and
# is torn down automatically at process exit — no leaked actors).  A
# multi-job production cluster would pass lifetime="detached" instead and
# own the teardown explicitly.
_HANDLES: dict[tuple[str, int], list] = {}


def band_index_actors(state_dir: str) -> list:
    """Get-or-create the named shard actors for one state_dir."""
    n = _n_shards()
    key = (os.path.abspath(state_dir), n)
    if key not in _HANDLES:
        _HANDLES[key] = [
            _BandIndexShard.options(
                name=_actor_name(state_dir, i),
                namespace=_NAMESPACE,
                get_if_exists=True,
                num_cpus=0,
            ).remote()
            for i in range(n)
        ]
    return _HANDLES[key]


def band_index_sync(shards: list, state_dir: str, delta_dirs: list[str], id_col: str) -> None:
    """Bring every shard up to date with the published parquet state —
    each delta directory loads at most once per shard per session."""
    n = len(shards)
    ray.get([shards[i].configure.remote(i, n) for i in range(n)])
    for name in delta_dirs:
        files = sorted(glob.glob(os.path.join(state_dir, name, "bands", "*.parquet")))
        if files:
            ray.get([s.load_files.remote(name, files, id_col) for s in shards])
        else:
            ray.get([s.mark_loaded.remote(name) for s in shards])


def band_index_lookup(shards: list, delta_bands, id_col: str):
    """History rows colliding with ANY delta band key, as a Dataset with
    ``is_new = 0`` — refs only, nothing table-sized on the driver."""
    import ray.data as rd_

    refs = delta_bands.select_columns(["band_key", id_col]).to_arrow_refs()
    if not refs:
        return rd_.from_arrow(_empty(id_col))
    n = len(shards)
    out = [_route_lookup.remote(r, shards, n, id_col) for r in refs]
    return rd_.from_arrow_refs(out)


def band_index_ingest(shards: list, delta_bands, delta_name: str, id_col: str) -> None:
    """Ingest a just-published delta directly (no read-back of its files),
    then mark it loaded so sync never re-reads it this session."""
    refs = delta_bands.select_columns(["band_key", id_col]).to_arrow_refs()
    n = len(shards)
    ray.get([_route_ingest.remote(r, shards, n, id_col) for r in refs])
    ray.get([s.mark_loaded.remote(delta_name) for s in shards])


def band_index_stats(state_dir: str) -> list[dict]:
    """Per-shard {rows, files_read, loaded} — the observability hook the
    not-fully-re-read test asserts on."""
    return ray.get([s.stats.remote() for s in band_index_actors(state_dir)])


def band_index_reset(state_dir: str) -> None:
    """Kill this state_dir's shard actors (tests / shard-count changes);
    the next call rebuilds them lazily from the parquet state."""
    abspath = os.path.abspath(state_dir)
    for key in [k for k in _HANDLES if k[0] == abspath]:
        del _HANDLES[key]
    for i in range(_n_shards()):
        try:
            ray.kill(ray.get_actor(_actor_name(state_dir, i), namespace=_NAMESPACE))
        except ValueError:
            pass
