"""Single-process NumPy/pandas oracle for the full linkage pipeline.

Independently re-implements every piece of ORCHESTRATION — extraction (regex,
not the flat-buffer state machine), normalization (Python string ops), dense
top-k (argsort, not tiled argpartition), blocking group-and-pair (dict
buckets, not groupby shuffle), clustering (Python union-find, not label
propagation) — while sharing only the pure *kernels* (encoder, Jaro-Winkler)
whose correctness is pinned by their own textbook-reference unit tests.

The parity gate (BASELINE.md): the distributed pipeline must match this
oracle EXACTLY (same pred_id, same cluster partition ⇒ pairwise F1 = 1.0 ≥
0.99), which catches ordering, join, dedup, and salting bugs in the Ray path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.encoder import HashNgramEncoder
from ..functions.hashing import char_ngram_hashes, flat_utf8, hash_strings, lsh_band_keys, minhash_signatures
from ..functions.strings import jaro_winkler_pairs, pad_codes
from ..sources.synth import NIL_ID
from .linkage import E_PREFIX, LinkageConfig, M_PREFIX

__all__ = ["oracle_linkage"]

_MENTION_RE = re.compile(r"(?<![A-Za-z0-9])[A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*")


def _norm(s: str) -> str:
    return " ".join(s.lower().split())


def _jw(queries: list[str], names: list[str]) -> np.ndarray:
    qm, ql = pad_codes(pa.array(queries, pa.string()))
    nm, nl = pad_codes(pa.array(names, pa.string()))
    L = max(qm.shape[1], nm.shape[1], 1)

    def pad(m):
        out = np.zeros((m.shape[0], L), np.uint8)
        out[:, : m.shape[1]] = m
        return out

    return jaro_winkler_pairs(pad(qm), ql, pad(nm), nl)


def oracle_linkage(transcripts: pa.Table, catalog: pa.Table, cfg: LinkageConfig) -> dict:
    """Returns {"mentions": pandas df (mention_uid, surface, norm_text,
    pred_id, cluster_id), "entity_edges": set[(src, dst)]}."""
    sc = cfg.scoring
    enc = HashNgramEncoder(dim=sc.encoder_dim)

    # ── extraction (regex) ───────────────────────────────────────────────────
    uids, surfaces = [], []
    for conv_id, turn_idx, text in zip(
        transcripts["conv_id"].to_pylist(),
        transcripts["turn_idx"].to_pylist(),
        transcripts["text"].to_pylist(),
    ):
        for match in _MENTION_RE.finditer(text):
            if match.end() - match.start() >= 2:
                uids.append(f"{conv_id}:{turn_idx}:{match.start()}")
                surfaces.append(match.group())
    norm_texts = [_norm(s) for s in surfaces]

    # ── catalog index (sorted by entity_id, like the pipeline) ───────────────
    order = np.argsort(np.asarray(catalog["entity_id"].to_pylist(), dtype=object), kind="stable")
    ent_ids = np.asarray(catalog["entity_id"].to_pylist(), dtype=object)[order]
    ent_names = [_norm(n) for n in np.asarray(catalog["name"].to_pylist(), dtype=object)[order]]
    E = enc.encode(pa.array(ent_names, pa.string()))

    # ── per distinct surface: dense top-k, jw rerank, NIL threshold ─────────
    distinct = sorted(set(norm_texts))
    Q = enc.encode(pa.array(distinct, pa.string()))
    S = Q @ E.T
    k = min(sc.top_k + sc.extra_k, len(ent_ids))
    pred_of: dict[str, str] = {}
    rk = min(sc.rerank_k, k)
    for i, surf in enumerate(distinct):
        idx = np.lexsort((np.arange(len(ent_ids)), -S[i]))[:k]
        idx_r = idx[:rk]
        jw = _jw([surf] * rk, [ent_names[j] for j in idx_r])
        w = (sc.jw_weight + 0.15) if len(surf.encode()) < 8 else sc.jw_weight
        # float32/float64 arithmetic order identical to the pipeline's comb
        comb = ((1.0 - w) * S[i, idx_r] + w * jw).astype(np.float64)
        best_local = int(np.lexsort((np.arange(rk), -comb))[0])
        score = comb[best_local]
        pred_of[surf] = ent_ids[idx_r[best_local]] if score >= sc.tau_nil else NIL_ID

    # ── entity-entity duplicate edges (same blocking semantics, brute dicts) ─
    from collections import defaultdict

    name_arr = pa.array(ent_names, pa.string())
    data, off = flat_utf8(name_arr)
    grams, rows = char_ngram_hashes(data, off, n=cfg.blocking.ngram)
    sig = minhash_signatures(grams, rows, len(ent_names), num_perms=cfg.blocking.num_perms, seed=cfg.blocking.seed)
    keys = lsh_band_keys(sig, cfg.blocking.num_bands)
    exact = hash_strings(data, off)
    buckets: dict[int, list[int]] = defaultdict(list)
    for i in range(len(ent_names)):
        for b in range(cfg.blocking.num_bands):
            buckets[int(keys[i, b])].append(i)
        buckets[hash(("exact", int(exact[i])))].append(i)
    cand_pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                i, j = ms[x], ms[y]
                est = float((sig[i] == sig[j]).mean())
                if est >= sc.tau_pair_jaccard or ent_names[i] == ent_names[j]:
                    a, b = (i, j) if ent_ids[i] < ent_ids[j] else (j, i)
                    cand_pairs.add((a, b))
    ent_edges: set[tuple[str, str]] = set()
    if cand_pairs:
        pairs = sorted(cand_pairs)
        ea = enc.encode(pa.array([ent_names[i] for i, _ in pairs], pa.string()))
        eb = enc.encode(pa.array([ent_names[j] for _, j in pairs], pa.string()))
        cos = (ea * eb).sum(axis=1)
        jw = _jw([ent_names[i] for i, _ in pairs], [ent_names[j] for _, j in pairs])
        for (i, j), c, w in zip(pairs, cos, jw):
            if c >= sc.tau_edge_entity or (w >= sc.tau_jw and c >= sc.tau_nil):
                ent_edges.add((E_PREFIX + ent_ids[i], E_PREFIX + ent_ids[j]))

    # ── union-find over mention→entity + entity↔entity edges ────────────────
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    all_nodes = [M_PREFIX + u for u in uids] + [E_PREFIX + e for e in ent_ids]
    for n in all_nodes:
        parent.setdefault(n, n)
    for u, s in zip(uids, norm_texts):
        p = pred_of[s]
        if p != NIL_ID:
            union(M_PREFIX + u, E_PREFIX + p)
    for a, b in sorted(ent_edges):
        union(a, b)

    import pandas as pd

    mentions = pd.DataFrame(
        {
            "mention_uid": uids,
            "surface": surfaces,
            "norm_text": norm_texts,
            "pred_id": [pred_of[s] for s in norm_texts],
            "cluster_id": [find(M_PREFIX + u) for u in uids],
        }
    )
    return {"mentions": mentions, "entity_edges": ent_edges}
