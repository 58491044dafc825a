"""Deterministic synthetic transcript corpus generator (FIXTURES.md).

Generates the engine's test/bench corpus at any scale with zero external data:

- ``entity_catalog`` — analog of the reference's dictionary
  (``tests/test_data/dictionary_toy.jsonl``, ``README.md:37-44``): canonical
  names, descriptions (some empty → default-composition path,
  ``mix_blink/data/dictionary.py:101``), duplicate-id entities (same canonical
  name under two ids → multi-label golds, the analog of
  ``dataset_toy.jsonl:3``'s multi-label mention), and near-collision name
  pairs ("Applet" vs "Apple") to exercise prefilters/hard negatives.
- ``transcripts`` — the exact ``input_hint`` shape
  ``(conv_id, turn_idx, role, text, tool, ts)``.  Turn text is lowercase
  template filler with 0–3 planted *capitalized* mention surfaces (canonical
  name, casing variant, seeded typo with edit distance ≤ 2, or word-drop
  alias), including zero-mention turns (analog ``dataset_toy.jsonl:5``),
  multi-mention turns (``:4``), NIL surfaces not in the catalog
  (``dataset_toy.jsonl:3-4``'s Sony/Toyota), and a canned repeated sentence as
  the hot-block skew driver.
- ``mentions_gold`` — ground truth: offsets (half-open, reference convention
  ``mix_blink/data/dataset.py:13-16``), multi-label ``gold_ids`` (may include
  the NIL sentinel ``-1``), and 3 gold-excluded ``hard_negative_ids``
  (reference hard-negative semantics ``mix_blink/retriever/dense.py:113-120``).

Everything derives from ``(seed, conv_id, turn_idx)`` via crc32 so any subset
regenerates identically (FIXTURES.md "Determinism requirements").  Only the
engine's mention-extraction contract is assumed: a mention is a maximal run of
Capitalized words in otherwise-lowercase text.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass, field, replace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NIL_ID = "-1"

_SYLLABLES = [
    "zor", "mak", "lin", "tav", "ben", "dor", "fel", "gar", "hul", "jin",
    "kel", "mir", "nov", "pex", "quil", "ras", "sil", "tor", "ul", "vex",
    "wal", "xan", "yor", "zeb", "cro", "dal", "erm", "fos", "gri", "hem",
    "bol", "cam", "dun", "eth", "fir", "gol", "hap", "ido", "jup", "kor",
    "lum", "mon", "nur", "ost", "pin", "qar", "rud", "sal", "tem", "urb",
    "vin", "wex", "yel", "zam", "sna", "cla", "dre", "eko", "fli", "gno",
    "hio", "ivo", "jar", "kep",
]
# NIL surfaces draw from a disjoint syllable pool so they stay dissimilar from
# every catalog name (keeps the NIL-threshold margin testable).
_NIL_SYLLABLES = [
    "ach", "bru", "cht", "dwo", "eep", "fyu", "ghy", "iwo", "jqu", "kshi",
    "lmo", "nph", "ock", "pyt", "rrh", "sst", "ttw", "uvv", "wyx", "zzy",
]
_SUFFIXES = ["Systems", "Labs", "Corp", "Group", "Tech", "Industries", "Networks", "Dynamics"]
_TOOLS = ["search", "db", "crm", "mail"]
_DOMAINS = ["logistics", "analytics", "payments", "storage", "imaging", "staffing"]
_REGIONS = ["the northern region", "three markets", "the pilot program", "overseas accounts"]

# Templates: "{m}" slots are replaced by planted mention surfaces.  ALL other
# words must stay lowercase — the extraction contract.
_TEMPLATES: dict[int, list[str]] = {
    0: [
        "the shipment was delayed because of weather and rerouted twice",
        "let me check the latest status and get back to you shortly",
        "that invoice was already paid last month according to the ledger",
        "no updates yet, the queue is still processing earlier requests",
    ],
    1: [
        "the order from {m} was delayed because of a customs hold",
        "we met with {m} about the renewal terms yesterday",
        "support says {m} reported the outage first",
        "the contract with {m} expires at the end of the quarter",
        "billing flagged {m} for a duplicate charge last week",
    ],
    2: [
        "both {m} and {m} submitted bids before the deadline",
        "we migrated {m} off the legacy stack while {m} stayed on it",
        "the audit compared invoices from {m} against {m} totals",
    ],
    3: [
        "the shortlist includes {m} and {m} but not {m} this time",
    ],
}
_TOOL_TEMPLATES = [
    "lookup result: account for {m} is active with two open tickets",
    "query returned 3 rows for {m} in the billing table",
    "status check: {m} endpoint responded in 120 ms",
]
# The hot-block skew driver: byte-identical text repeated across conversations.
_HOT_SENTENCE = "please check {m} for updates before the close"


@dataclass(frozen=True)
class SynthConfig:
    n_convs: int = 200
    min_turns: int = 8
    max_turns: int = 24
    n_entities: int = 120
    n_dup_entities: int = 6          # duplicate-id entities (multi-label golds)
    n_near_collisions: int = 4       # "Applet" vs "Apple" pairs
    n_nil_names: int = 20
    frac_empty_description: float = 0.15
    p_num_mentions: tuple[float, ...] = (0.30, 0.42, 0.20, 0.08)
    p_nil_mention: float = 0.10      # mention surface from NIL pool
    p_hot_sentence: float = 0.06     # repeated identical turn text
    p_multilabel_nil: float = 0.03   # gold gets NIL appended (annotation doubt)
    # surface variant mix for regular entities: exact / casing / typo / word-drop
    p_variant: tuple[float, ...] = (0.45, 0.20, 0.25, 0.10)
    seed: int = 42


def _rng(seed: int, *parts: object) -> np.random.RandomState:
    key = ":".join(str(p) for p in (seed, *parts))
    return np.random.RandomState(zlib.crc32(key.encode()) & 0x7FFFFFFF)


def _make_word(rng: np.random.RandomState, pool: list[str], n_syll: int) -> str:
    w = "".join(pool[rng.randint(len(pool))] for _ in range(n_syll))
    return w.capitalize()


def _typo(rng: np.random.RandomState, surface: str) -> str:
    """Edit-distance ≤ 2 typo that never touches a word's first character
    (keeps the surface extractable as a Capitalized run).  Edits scale with
    word length — 1 for short words, up to 2 for ≥ 9 chars — so the typo'd
    surface stays n-gram-recoverable (realistic fat-finger noise, not
    adversarial corruption)."""
    words = surface.split(" ")
    wi = int(rng.randint(len(words)))
    w = words[wi]
    if len(w) < 7:
        return surface
    n_edits = 1 + int(len(w) >= 9 and rng.rand() < 0.4)
    for _ in range(n_edits):
        pos = int(rng.randint(1, len(w) - 1))
        op = rng.randint(4)
        c = "abcdefghijklmnopqrstuvwxyz"[rng.randint(26)]
        if op == 0:  # substitute
            w = w[:pos] + c + w[pos + 1 :]
        elif op == 1:  # delete
            w = w[:pos] + w[pos + 1 :]
        elif op == 2:  # insert
            w = w[:pos] + c + w[pos:]
        else:  # transpose
            w = w[:pos] + w[pos + 1] + w[pos] + w[pos + 2 :] if pos + 2 <= len(w) else w
    words[wi] = w
    return " ".join(words)


def make_catalog(cfg: SynthConfig) -> pa.Table:
    """entity_catalog: entity_id, name, description, aliases, dup_of, fragile."""
    rng = _rng(cfg.seed, "catalog")
    names: list[str] = []
    first_words: set[str] = set()
    first_words6: set[str] = set()
    first_prefixes: set[str] = set()

    def first_word_ok(w: str) -> bool:
        """Distinct entities get first words that are prefix-free AND unique in
        their first 6 chars — the first word alone identifies the entity (what
        makes word-drop aliases and mild typos unambiguous; real catalogs
        disambiguate the same way)."""
        wl = w.lower()
        if wl in first_prefixes or wl[:6] in first_words6:
            return False
        return all(wl[: i + 1] not in first_words for i in range(len(wl)))

    def register(w: str) -> None:
        wl = w.lower()
        first_words.add(wl)
        first_words6.add(wl[:6])
        for i in range(1, len(wl) + 1):
            first_prefixes.add(wl[:i])

    attempts = 0
    while len(names) < cfg.n_entities:
        attempts += 1
        if attempts > 500 * cfg.n_entities:
            raise RuntimeError(
                f"cannot generate {cfg.n_entities} prefix-distinct entity names "
                f"from the syllable pool; lower n_entities"
            )
        w1 = _make_word(rng, _SYLLABLES, 2 + int(rng.rand() < 0.3))
        if not first_word_ok(w1):
            continue
        name = w1 if rng.rand() < 0.35 else f"{w1} {_SUFFIXES[rng.randint(len(_SUFFIXES))]}"
        register(w1)
        names.append(name)

    fragile = [False] * cfg.n_entities
    # Near-collision pairs: mutate one interior char of an existing first word.
    for i in range(cfg.n_near_collisions):
        base_idx = int(rng.randint(cfg.n_entities))
        base = names[base_idx].split(" ")[0]
        pos = int(rng.randint(1, len(base)))
        mutated = base[:pos] + ("x" if base[pos : pos + 1] != "x" else "q") + base[pos + 1 :]
        if not first_word_ok(mutated):
            continue
        register(mutated)
        names.append(mutated)
        fragile.append(True)
        fragile[base_idx] = True

    ids = [f"{i:06d}" for i in range(len(names))]
    dup_of: list[str | None] = [None] * len(names)

    # Duplicate-id entities: same canonical name, different id+description.
    dup_sources = [i for i in range(cfg.n_entities) if not fragile[i]]
    rng.shuffle(dup_sources)
    for i in dup_sources[: cfg.n_dup_entities]:
        ids.append(f"{len(ids):06d}")
        names.append(names[i])
        fragile.append(False)
        dup_of.append(ids[i])

    descriptions = []
    for i, name in enumerate(names):
        r = _rng(cfg.seed, "desc", ids[i])
        if r.rand() < cfg.frac_empty_description:
            descriptions.append("")
        else:
            descriptions.append(
                f"{name.lower()} is a {_DOMAINS[r.randint(len(_DOMAINS))]} provider "
                f"serving {_REGIONS[r.randint(len(_REGIONS))]}."
            )

    aliases = []
    for i, name in enumerate(names):
        r = _rng(cfg.seed, "alias", ids[i])
        al = {name.split(" ")[0]} if " " in name else set()
        al.add(name.split(" ")[0].upper() + name[len(name.split(" ")[0]) :])
        aliases.append(sorted(al))

    return pa.table(
        {
            "entity_id": pa.array(ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "description": pa.array(descriptions, pa.string()),
            "aliases": pa.array(aliases, pa.list_(pa.string())),
            "dup_of": pa.array(dup_of, pa.string()),
            "fragile": pa.array(fragile, pa.bool_()),
        }
    )


def make_nil_names(cfg: SynthConfig) -> list[str]:
    rng = _rng(cfg.seed, "nil")
    out, seen = [], set()
    while len(out) < cfg.n_nil_names:
        w = _make_word(rng, _NIL_SYLLABLES, 2 + int(rng.rand() < 0.4))
        if rng.rand() < 0.3:
            w = f"{w} {_make_word(rng, _NIL_SYLLABLES, 2)}"
        if w.lower() not in seen:
            seen.add(w.lower())
            out.append(w)
    return out


def _surface_and_gold(
    rng: np.random.RandomState,
    cat: dict,
    nil_names: list[str],
    cfg: SynthConfig,
) -> tuple[str, list[str]]:
    """Pick a mention surface + its gold id set."""
    if rng.rand() < cfg.p_nil_mention:
        return nil_names[rng.randint(len(nil_names))], [NIL_ID]
    idx = int(rng.randint(len(cat["primary_idx"])))
    row = cat["primary_idx"][idx]
    name: str = cat["name"][row]
    gold = list(cat["gold_by_name"][name.lower()])
    if cat["fragile"][row]:
        surface = name  # near-collision entities: exact surfaces only
    else:
        v = rng.choice(4, p=cfg.p_variant)
        if v == 0:
            surface = name
        elif v == 1:  # casing variant (first word upper)
            first = name.split(" ")[0]
            surface = first.upper() + name[len(first):]
        elif v == 2:
            surface = _typo(rng, name)
        else:  # word-drop alias
            surface = name.split(" ")[0]
    if rng.rand() < cfg.p_multilabel_nil:
        gold = gold + [NIL_ID]
    return surface, gold


def make_transcripts(
    cfg: SynthConfig, catalog: pa.Table, conv_lo: int = 0, conv_hi: int | None = None
) -> tuple[pa.Table, pa.Table]:
    """Returns ``(transcripts, mentions_gold)`` pyarrow tables for the conv
    range ``[conv_lo, conv_hi)`` (full corpus by default).  Per-conv seeding
    makes any chunking produce byte-identical rows — the parallel generation
    path relies on this."""
    names = catalog["name"].to_pylist()
    ids = catalog["entity_id"].to_pylist()
    fragile = catalog["fragile"].to_pylist()
    dup_of = catalog["dup_of"].to_pylist()
    gold_by_name: dict[str, list[str]] = {}
    for eid, name in zip(ids, names):
        gold_by_name.setdefault(name.lower(), []).append(eid)
    cat = {
        "name": names,
        "fragile": fragile,
        "gold_by_name": gold_by_name,
        # plant mentions only for primary entities (dup ids share the name)
        "primary_idx": [i for i in range(len(ids)) if dup_of[i] is None],
    }
    nil_names = make_nil_names(cfg)
    all_ids_arr = np.array(ids)

    t_conv, t_turn, t_role, t_text, t_tool, t_ts = [], [], [], [], [], []
    m_uid, m_conv, m_turn, m_start, m_end, m_surface, m_gold, m_hneg = [], [], [], [], [], [], [], []

    base_ts = np.datetime64("2026-01-01T00:00:00", "us")
    roles = ["user", "assistant", "tool"]

    if conv_hi is None:
        conv_hi = cfg.n_convs
    for ci in range(conv_lo, conv_hi):
        conv_id = f"conv-{ci:06d}"
        crng = _rng(cfg.seed, "conv", conv_id)
        n_turns = int(crng.randint(cfg.min_turns, cfg.max_turns + 1))
        for ti in range(n_turns):
            rng = _rng(cfg.seed, "turn", conv_id, ti)
            role = roles[rng.choice(3, p=[0.4, 0.4, 0.2])]
            tool = _TOOLS[rng.randint(len(_TOOLS))] if role == "tool" else ""

            if rng.rand() < cfg.p_hot_sentence:
                template, n_slots = _HOT_SENTENCE, 1
                # hot sentence always mentions entity 0 exactly → mega-block
                planted = [(names[0], list(gold_by_name[names[0].lower()]))]
            else:
                if role == "tool":
                    template = _TOOL_TEMPLATES[rng.randint(len(_TOOL_TEMPLATES))]
                    n_slots = template.count("{m}")
                else:
                    n_slots = int(rng.choice(len(cfg.p_num_mentions), p=cfg.p_num_mentions))
                    choices = _TEMPLATES[n_slots]
                    template = choices[rng.randint(len(choices))]
                planted = [_surface_and_gold(rng, cat, nil_names, cfg) for _ in range(n_slots)]

            # Assemble text, tracking char offsets of each planted surface.
            parts = template.split("{m}")
            text = parts[0]
            for (surface, gold), nxt in zip(planted, parts[1:]):
                start = len(text)
                text += surface
                end = len(text)
                text += nxt
                uid = f"{conv_id}:{ti}:{start}"
                m_uid.append(uid)
                m_conv.append(conv_id)
                m_turn.append(ti)
                m_start.append(start)
                m_end.append(end)
                m_surface.append(surface)
                m_gold.append(gold)
                hn_rng = _rng(cfg.seed, "hneg", uid)
                pool = all_ids_arr[~np.isin(all_ids_arr, gold)]
                m_hneg.append(list(pool[hn_rng.choice(len(pool), size=3, replace=False)]))

            t_conv.append(conv_id)
            t_turn.append(ti)
            t_role.append(role)
            t_text.append(text)
            t_tool.append(tool)
            t_ts.append(base_ts + np.timedelta64(ci * 3600 + ti * 7, "s"))

    transcripts = pa.table(
        {
            "conv_id": pa.array(t_conv, pa.string()),
            "turn_idx": pa.array(t_turn, pa.int32()),
            "role": pa.array(t_role, pa.string()),
            "text": pa.array(t_text, pa.string()),
            "tool": pa.array(t_tool, pa.string()),
            "ts": pa.array(t_ts, pa.timestamp("us")),
        }
    )
    mentions_gold = pa.table(
        {
            "mention_uid": pa.array(m_uid, pa.string()),
            "conv_id": pa.array(m_conv, pa.string()),
            "turn_idx": pa.array(m_turn, pa.int32()),
            "start": pa.array(m_start, pa.int32()),
            "end": pa.array(m_end, pa.int32()),
            "surface": pa.array(m_surface, pa.string()),
            "gold_ids": pa.array(m_gold, pa.list_(pa.string())),
            "hard_negative_ids": pa.array(m_hneg, pa.list_(pa.string())),
        }
    )
    return transcripts, mentions_gold


def generate(cfg: SynthConfig) -> dict[str, pa.Table]:
    catalog = make_catalog(cfg)
    transcripts, mentions_gold = make_transcripts(cfg, catalog)
    return {"catalog": catalog, "transcripts": transcripts, "mentions_gold": mentions_gold}


_ROW_GROUP_SIZE = 4096  # small row groups ⇒ parallel Parquet scan tasks
_GEN_CHUNK_CONVS = 1000


def generate_cached(cfg: SynthConfig, cache_root: str = "/tmp/mbr_synth") -> dict[str, str]:
    """Generate (or reuse) the corpus as Parquet; returns name → path.

    ``transcripts`` / ``mentions_gold`` are DIRECTORIES of part files (one per
    1000-conv chunk) with small row groups, so Ray's Parquet scan
    parallelizes; generation itself fans out as Ray tasks when a Ray session
    exists and the corpus is big (per-conv seeding ⇒ chunking changes nothing).
    Cache key = generator version + full config repr.
    """
    gen_version = 4  # bump when generator internals (e.g. syllable pool) change
    key = f"{zlib.crc32(f'v{gen_version}:{cfg!r}'.encode()):08x}"
    out_dir = os.path.join(cache_root, key)
    paths = {
        "catalog": os.path.join(out_dir, "catalog.parquet"),
        "transcripts": os.path.join(out_dir, "transcripts"),
        "mentions_gold": os.path.join(out_dir, "mentions_gold"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    catalog = make_catalog(cfg)
    tmp_root = out_dir + ".tmp"
    if os.path.exists(tmp_root):
        import shutil

        shutil.rmtree(tmp_root)
    os.makedirs(os.path.join(tmp_root, "transcripts"))
    os.makedirs(os.path.join(tmp_root, "mentions_gold"))

    chunks = [
        (lo, min(lo + _GEN_CHUNK_CONVS, cfg.n_convs))
        for lo in range(0, cfg.n_convs, _GEN_CHUNK_CONVS)
    ]

    def write_chunk(i: int, tr: pa.Table, mg: pa.Table) -> None:
        pq.write_table(
            tr, os.path.join(tmp_root, "transcripts", f"part-{i:05d}.parquet"),
            row_group_size=_ROW_GROUP_SIZE,
        )
        pq.write_table(
            mg, os.path.join(tmp_root, "mentions_gold", f"part-{i:05d}.parquet"),
            row_group_size=_ROW_GROUP_SIZE,
        )

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(chunks) > 2
    except ImportError:  # pragma: no cover
        pass

    if use_ray:
        import ray

        @ray.remote
        def gen_chunk(cfg_: SynthConfig, catalog_ref, i: int, lo: int, hi: int, root: str) -> int:
            # Workers write their own part files (single-node shared /tmp):
            # gathering thousands of chunk tables to the driver serializes
            # the write and holds the whole corpus in the object store.
            tr, mg = make_transcripts(cfg_, catalog_ref, lo, hi)
            pq.write_table(
                tr, os.path.join(root, "transcripts", f"part-{i:05d}.parquet"),
                row_group_size=_ROW_GROUP_SIZE,
            )
            pq.write_table(
                mg, os.path.join(root, "mentions_gold", f"part-{i:05d}.parquet"),
                row_group_size=_ROW_GROUP_SIZE,
            )
            return tr.num_rows

        cat_ref = ray.put(catalog)
        futs = [
            gen_chunk.remote(cfg, cat_ref, i, lo, hi, tmp_root)
            for i, (lo, hi) in enumerate(chunks)
        ]
        ray.get(futs)
    else:
        for i, (lo, hi) in enumerate(chunks):
            tr, mg = make_transcripts(cfg, catalog, lo, hi)
            write_chunk(i, tr, mg)

    pq.write_table(catalog, os.path.join(tmp_root, "catalog.parquet"))
    os.makedirs(cache_root, exist_ok=True)
    os.replace(tmp_root, out_dir)
    return paths


def config_for_scale(n_turns_target: int, seed: int = 42) -> SynthConfig:
    """Scale the corpus by conversation count (~16 turns/conv average).
    Entity count capped by the syllable pool's distinct-6-char-prefix budget
    (64² pairs ≫ 1500)."""
    n_convs = max(8, n_turns_target // 16)
    n_entities = max(120, min(1500, n_turns_target // 50))
    return SynthConfig(n_convs=n_convs, n_entities=n_entities, seed=seed)
