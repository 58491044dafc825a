"""Per-partition lineage manifests + resumable stage outputs.

The north rule requires "per-partition lineage manifests + stage metrics so
any block's scoring can be resumed from the last completed checkpoint".  The
reference has nothing at pipeline granularity (only HF Trainer checkpoints,
``mix_blink/cli/train.py:102-106``); this is the engine's batch-pipeline
equivalent:

- a stage writes each partition (a deterministic shard of the key space,
  default ``shard = crc-hash(conv_id) % n``) to its own directory
  ``{out}/shard={s}/`` ATOMICALLY (temp dir + rename),
- next to it a manifest ``{out}/_manifest/shard={s}.json`` recording the
  input fingerprint, row count, and wall time,
- on restart, shards whose manifest matches the current input fingerprint are
  SKIPPED (their parquet is reused); only missing/stale shards recompute.

Fingerprints are content hashes of the *input* partition (order-insensitive
XOR of row hashes), so a resume after a crash — or after an input change —
does the right thing without trusting mtimes.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import flat_utf8, hash_strings

__all__ = ["shard_of", "input_fingerprint", "ShardedStageWriter", "completed_shards"]


def shard_of(key_col: pa.Array | pa.ChunkedArray, n_shards: int) -> np.ndarray:
    """Deterministic shard id per row from a string key column."""
    h = hash_strings(*flat_utf8(key_col))
    return (h % np.uint64(n_shards)).astype(np.int32)


def input_fingerprint(table: pa.Table, key_cols: tuple[str, ...]) -> str:
    """Order-insensitive content fingerprint (XOR of per-row key hashes)."""
    acc = np.uint64(0)
    mix = np.uint64(0x9E3779B97F4A7C15)
    for i, col in enumerate(key_cols):
        h = hash_strings(*flat_utf8(pa.compute.cast(table[col], pa.string())))
        acc ^= np.bitwise_xor.reduce(h * (mix + np.uint64(i))) if len(h) else np.uint64(0)
    return f"{int(acc):016x}"


def completed_shards(out_dir: str, fingerprints: dict[int, str]) -> set[int]:
    """Shards whose manifest exists AND matches the current input fingerprint."""
    done = set()
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return done
    for shard, fp in fingerprints.items():
        path = os.path.join(mdir, f"shard={shard}.json")
        if os.path.exists(path):
            try:
                meta = json.load(open(path))
            except (json.JSONDecodeError, OSError):
                continue
            if meta.get("input_fingerprint") == fp and os.path.isdir(
                os.path.join(out_dir, f"shard={shard}")
            ):
                done.add(shard)
    return done


class ShardedStageWriter:
    """Writes one stage's output as ``{out}/shard={s}/part.parquet`` + manifest.

    Usage::

        w = ShardedStageWriter(out_dir)
        for shard, table, fp in ...:
            w.write_shard(shard, table, fp, metrics={...})
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    def write_shard(self, shard: int, table: pa.Table, input_fp: str, metrics: dict | None = None) -> None:
        t0 = time.time()
        final = os.path.join(self.out_dir, f"shard={shard}")
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        manifest = {
            "shard": shard,
            "input_fingerprint": input_fp,
            "rows": table.num_rows,
            "wall_sec": round(time.time() - t0, 4),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "metrics": metrics or {},
        }
        mpath = os.path.join(self.out_dir, "_manifest", f"shard={shard}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)

    def read_all(self) -> pa.Table:
        parts = []
        for name in sorted(os.listdir(self.out_dir)):
            if name.startswith("shard="):
                d = os.path.join(self.out_dir, name)
                for f in sorted(os.listdir(d)):
                    if f.endswith(".parquet"):
                        parts.append(pq.read_table(os.path.join(d, f)))
        return pa.concat_tables(parts) if parts else pa.table({})
