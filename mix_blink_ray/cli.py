"""CLI entry points — the engine analog of the reference's console scripts
(``pyproject.toml:30-34``: get_candidate / build_index / blink_train /
blink_eval), re-cut along the engine's stage boundaries:

    python -m mix_blink_ray.cli synth   --turns 64000 --out /tmp/corpus
    python -m mix_blink_ray.cli ingest  --conll file.conll --out /tmp/corpus
    python -m mix_blink_ray.cli link    --transcripts DIR --catalog FILE --out DIR
    python -m mix_blink_ray.cli eval    --transcripts DIR --catalog FILE --gold FILE
    python -m mix_blink_ray.cli bench   (alias of bench.py)

Only this module (and bench.py / the test fixture) owns a Ray session; the
library never calls ray.init.  Submit via ``ray job submit -- python -m
mix_blink_ray.cli link ...`` on a real cluster.
"""

from __future__ import annotations

import argparse
import json


def _fresh_dir(path: str) -> str:
    """CLI output dirs are replaced wholesale: Dataset.write_parquet APPENDS
    part files into an existing directory, which silently duplicates rows on
    a rerun — exactly the surprise a CLI must not have."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    return path


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_synth(args) -> None:
    from .sources.synth import config_for_scale, generate_cached

    if args.num_cpus:
        _ray_session(args.num_cpus)
    paths = generate_cached(config_for_scale(args.turns, seed=args.seed), cache_root=args.out)
    print(json.dumps(paths))


def cmd_ingest(args) -> None:
    import os

    import pyarrow.parquet as pq

    from .sources.conll import conll_to_tables

    with open(args.conll) as f:
        transcripts, spans = conll_to_tables(f.read().splitlines())
    os.makedirs(args.out, exist_ok=True)
    pq.write_table(transcripts, os.path.join(args.out, "transcripts.parquet"))
    pq.write_table(spans, os.path.join(args.out, "spans.parquet"))
    print(json.dumps({"turns": transcripts.num_rows, "spans": spans.num_rows, "out": args.out}))


def cmd_link(args) -> None:
    import pyarrow.parquet as pq

    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.linkage import LinkageConfig, run_linkage

    cfg = LinkageConfig(work_dir=args.work_dir, scoring_strategy=args.strategy)
    res = run_linkage(rd.read_parquet(args.transcripts), pq.read_table(args.catalog), cfg)
    res.mentions.write_parquet(_fresh_dir(args.out))
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"mentions": n, "out": args.out}))
    ray.shutdown()


def cmd_ingest_jsonl(args) -> None:
    """Reference-format JSONL dataset → flattened mention parquet
    (read_json → flatten → resolve labels; see sources/jsonl.py)."""
    ray = _ray_session(args.num_cpus)

    from .sources.jsonl import mixblink_mentions

    labels = open(args.labels).read().split() if args.labels else []
    # Reference coupling (tests/test_dataset.py:44): remove_nil goes with a
    # dictionary built WITHOUT the NIL row; keeping NIL adds the sentinel id.
    if not args.remove_nil and args.nil_id:
        labels.append(args.nil_id)
    ds = mixblink_mentions(args.jsonl, labels, remove_nil=args.remove_nil)
    ds.write_parquet(_fresh_dir(args.out))
    import ray.data as rd

    print(json.dumps({"mentions": rd.read_parquet(args.out).count(), "out": args.out}))
    ray.shutdown()


def cmd_dedup(args) -> None:
    """Corpus dedup: kept docs + drop list with reasons (stages/dedup.py)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.dedup import DedupConfig, dedup_corpus

    docs = rd.read_parquet(args.docs)
    kept, dropped, metrics = dedup_corpus(
        docs, DedupConfig(jaccard_threshold=args.threshold), verify_threshold=args.threshold
    )
    kept.write_parquet(_fresh_dir(args.out_kept))
    dropped.write_parquet(_fresh_dir(args.out_dropped))
    print(json.dumps({**metrics, "out_kept": args.out_kept, "out_dropped": args.out_dropped}))
    ray.shutdown()


def cmd_link_incremental(args) -> None:
    """Delta-batch linkage against a persisted surface-prediction state:
    only surfaces never seen in prior runs are scored (the daily-increment
    shape — see run_linkage_incremental)."""
    import pyarrow.parquet as pq

    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.linkage import LinkageConfig, run_linkage_incremental

    cfg = LinkageConfig()
    labeled, metrics = run_linkage_incremental(
        rd.read_parquet(args.transcripts), pq.read_table(args.catalog), cfg, args.state_dir
    )
    labeled.write_parquet(_fresh_dir(args.out))
    print(json.dumps({**metrics, "out": args.out}))
    ray.shutdown()


def cmd_build_index(args) -> None:
    """Reference ``build_index`` console script analog: entity dictionary →
    persisted catalog-embedding artifact (one parquet table; see
    stages/scoring.py save_catalog_index).  Accepts the engine's catalog
    parquet or the reference's dictionary JSONL ({id, name, description})."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .stages.scoring import ScoringConfig, build_catalog_index

    if args.catalog.endswith((".jsonl", ".json")):
        from pyarrow import json as pa_json

        tbl = pa_json.read_json(args.catalog)
        names = {"id": "entity_id"}
        tbl = tbl.rename_columns([names.get(c, c) for c in tbl.column_names])
        if "description" not in tbl.column_names:
            tbl = tbl.append_column("description", pa.nulls(tbl.num_rows, pa.string()))
    else:
        tbl = pq.read_table(args.catalog)
    cfg = ScoringConfig(measure=args.measure, nil_sentinel=args.nil)
    index = build_catalog_index(tbl, cfg=cfg, cache_path=args.out)
    print(json.dumps({"entities": len(index.entity_ids), "dim": int(index.emb.shape[1]), "out": args.out}))


def cmd_ann_index(args) -> None:
    """Build and persist the IVF ANN index over an embeddings parquet table:
    distributed k-means centroids + vec_id→cluster assignments (see
    stages/ann.py save_ann_index).  A later ``knn_ivf(...,
    centroids=load_ann_index(dir).centroids)`` query skips every k-means
    round — the reference's serialized-retriever round-trip
    (``mix_blink/retriever/dense.py:124-151``) for the embedding corpus."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.ann import AnnConfig, kmeans_centroids, save_ann_index

    cfg = AnnConfig(n_clusters=args.clusters, kmeans_iters=args.iters)
    ds = rd.read_parquet(args.embeddings)
    cents = kmeans_centroids(ds, cfg)
    save_ann_index(args.out, cents, embeddings=ds, cfg=cfg)
    print(json.dumps({"n_clusters": len(cents), "dim": int(cents.shape[1]), "out": args.out}))
    ray.shutdown()


def cmd_candidates(args) -> None:
    """Reference ``get_candidate`` workflow (cli/get_candidates.py): per
    mention, top-k candidates + gold-excluded hard negatives, written as a
    sharded JSONL directory."""
    import pyarrow.parquet as pq

    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.linkage import LinkageConfig, run_linkage
    from .stages.attach import attach_list_column
    from .stages.scoring import split_candidates_hard_negatives

    catalog = pq.read_table(args.catalog)
    res = run_linkage(rd.read_parquet(args.transcripts), catalog, LinkageConfig())

    m = res.mentions.select_columns(["mention_uid", "norm_text"])
    joined = attach_list_column(
        attach_list_column(m, args.gold, "mention_uid", "gold_ids"),
        res.surface_preds,
        "norm_text",
        "candidates",
    )
    out_ds = joined.map_batches(
        lambda b: split_candidates_hard_negatives(b, top_k=args.top_k), batch_format="pyarrow"
    ).select_columns(["mention_uid", "candidates", "hard_negatives"])
    out_ds.write_json(_fresh_dir(args.out))
    print(json.dumps({"mentions": rd.read_json(args.out).count(), "out": args.out}))
    ray.shutdown()


def cmd_sample(args) -> None:
    """Deterministic corpus sampling (stages/sampling.py): rate mode keeps
    ~1/mod of rows by Lehmer hash; stratified mode keeps the k smallest-hash
    rows per stratum.  Reproducible under Ray task retry — the sample is a
    pure function of the key column."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.sampling import hash_sample, stratified_sample

    ds = rd.read_parquet(args.docs)
    if args.stratum:
        out = stratified_sample(ds, args.key, args.stratum, args.k)
    else:
        out = hash_sample(ds, args.key, args.mod, args.residue)
    out.write_parquet(_fresh_dir(args.out))
    print(json.dumps({"rows": rd.read_parquet(args.out).count(), "out": args.out}))
    ray.shutdown()


def cmd_vocab(args) -> None:
    """Corpus vocabulary artifacts (stages/vocab.py): global token counts
    (map-side combined), doc frequencies, or the inverted index."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.vocab import doc_frequencies, inverted_index, token_counts

    ds = rd.read_parquet(args.docs)
    fn = {"counts": token_counts, "df": doc_frequencies, "index": inverted_index}[args.mode]
    out = fn(ds, text_col=args.text_col)
    out.write_parquet(_fresh_dir(args.out))
    print(json.dumps({"rows": rd.read_parquet(args.out).count(), "mode": args.mode, "out": args.out}))
    ray.shutdown()


def cmd_bpe_train(args) -> None:
    """Learn BPE tokenizer merges from a documents parquet (stages/bpe.py):
    one corpus pass builds the word-frequency table, K rounds of
    pair-count→argmax→merge over the vocabulary-sized table; the merge
    table (rank, left, right, merged, pair_count) writes as parquet —
    the artifact `bpe-encode`-style segmentation applies."""
    ray = _ray_session(args.num_cpus)
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from .stages.bpe import bpe_train
    from .stages.vocab import token_counts

    ds = rd.read_parquet(args.docs)
    merges = bpe_train(
        token_counts(ds, text_col=args.text_col),
        n_merges=args.n_merges,
        min_count=args.min_count,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    pq.write_table(merges, args.out)
    print(json.dumps({"merges": merges.num_rows, "out": args.out}))
    ray.shutdown()


def cmd_dedup_incremental(args) -> None:
    """Delta-batch exact dedup against persisted fingerprint state
    (stages/dedup.dedup_incremental): keep only never-seen documents and
    append their fingerprints to the state."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.dedup import dedup_incremental

    ds = rd.read_parquet(args.docs)
    novel = dedup_incremental(ds, args.state_dir)
    out = None
    if args.out:
        kept_ids = novel.select_columns([args.id_col])
        docs = rd.read_parquet(args.docs)
        kept = docs.join(
            kept_ids, join_type="left_semi", num_partitions=8, on=(args.id_col,)
        )
        kept.write_parquet(_fresh_dir(args.out))
        out = args.out
    print(json.dumps({"novel": novel.count(), "state_dir": args.state_dir, "out": out}))
    ray.shutdown()


def cmd_minhash_incremental(args) -> None:
    """Delta-batch MinHash near-dup against persisted LSH band/signature
    state (stages/dedup.minhash_incremental): report verified near-dup pairs
    within the delta AND against all previously ingested documents, then
    append the delta's bands + signatures to the state."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.dedup import DedupConfig, minhash_incremental

    ds = rd.read_parquet(args.docs)
    pairs = minhash_incremental(
        ds,
        args.state_dir,
        cfg=DedupConfig(jaccard_threshold=args.threshold),
        id_col=args.id_col,
        text_col=args.text_col,
    )
    pairs.write_parquet(_fresh_dir(args.out))
    print(json.dumps({"pairs": pairs.count(), "state_dir": args.state_dir, "out": args.out}))
    ray.shutdown()


def cmd_curate(args) -> None:
    """One-command corpus curation — the composed end-to-end training-data
    pipeline, each stage the repo's documented operator:

      1. quality gate (C4/Gopher-family heuristic score ≥ --min-quality);
      1b. optional CCNet-style perplexity gate
          (--lm-perplexity-percentile): keep docs at or below the given
          avg-bigram-NLL percentile under the corpus-trained LM
          (stages/lm.bigram_lm_scores; exact quantized-cell threshold);
      2. exact + verified near-dup dedup with transitive closure
         (stages/dedup.dedup_corpus — drop ledger with reasons);
      3. benchmark n-gram decontamination (stages/contamination) — flagged
         docs drop;
      3b. optional DSIR importance weights (--dsir-target): a ``log_w``
          column attached alongside the split (stages/lm.dsir_log_importance
          against the target-domain corpus; never changes membership);
      4. deterministic 8/1/1 train/val/test split by Lehmer hash of doc id —
         leakage-safe BY CONSTRUCTION here, because step 2 already collapsed
         every verified near-dup pair (the standalone leakage-safe split via
         cluster hashing exists for pipelines that keep near-dups).

    Writes the curated corpus (with a ``split`` column), the drop ledger,
    and a per-stage metrics manifest JSON."""
    ray = _ray_session(args.num_cpus)
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .stages.contamination import decontaminate
    from .stages.dedup import DedupConfig, dedup_corpus
    from .stages.text_analysis import quality_scores

    id_col, text_col = args.id_col, args.text_col
    docs = rd.read_parquet(args.docs)
    metrics = {"input_docs": docs.count()}

    def gate(b: pa.Table) -> pa.Table:
        q = quality_scores(b, text_col=text_col, id_col=id_col)
        return b.filter(pc.greater_equal(q["quality_score"], pa.scalar(args.min_quality)))

    survivors = docs.map_batches(gate, batch_format="pyarrow").materialize()
    metrics["after_quality"] = survivors.count()

    if args.lm_perplexity_percentile > 0:
        # CCNet-style fluency gate (stages/lm.bigram_lm_scores), AFTER the
        # heuristic gate: train the bigram LM on the heuristic survivors,
        # keep docs at or below the requested avg-NLL percentile.  The
        # threshold is an exact distributed quantile over cent-quantized
        # NLL cells (stages/quantiles) — shuffle ∝ distinct cells, and the
        # gate compares in the same quantized space so the kept set is
        # exactly "rank ≤ ceil(q·n)" plus cell ties.  Docs with < 2 tokens
        # have no bigram evidence and drop (cannot certify fluency).
        from .stages.clustering import clamped_partitions
        from .stages.lm import bigram_lm_scores
        from .stages.quantiles import grouped_exact_quantiles

        scores = bigram_lm_scores(
            survivors, text_col=text_col, id_col=id_col
        ).materialize()
        q = args.lm_perplexity_percentile / 100.0
        qt = grouped_exact_quantiles(
            scores.map_batches(
                lambda b: b.append_column(
                    "g", pa.array(np.zeros(b.num_rows, dtype=np.int64))
                ),
                batch_format="pyarrow",
            ),
            "g",
            "avg_nll",
            [q],
        )
        thresh_cell = int(np.rint(qt.column(1)[0].as_py() * 100.0))
        passing = scores.map_batches(
            lambda b, tc=thresh_cell: pa.table({"lid": b[id_col]}).filter(
                pa.array(
                    np.rint(np.asarray(b["avg_nll"], dtype=np.float64) * 100.0) <= tc
                )
            ),
            batch_format="pyarrow",
        ).materialize()
        lp = clamped_partitions(max(passing.count(), 1), 16)
        survivors = survivors.join(
            passing, join_type="left_semi", num_partitions=lp, on=(id_col,), right_on=("lid",)
        ).materialize()
        metrics["lm_nll_threshold"] = thresh_cell / 100.0
        metrics["after_lm_perplexity"] = survivors.count()

    kept, dropped, ddm = dedup_corpus(
        survivors, DedupConfig(jaccard_threshold=args.threshold)
    )
    kept = kept.materialize()
    metrics.update({f"dedup_{k}": int(v) for k, v in ddm.items()})
    metrics["after_dedup"] = kept.count()

    if args.bench_mod > 0:
        flags = decontaminate(
            kept, id_col=id_col, text_col=text_col, n=args.ngram, bench_mod=args.bench_mod
        )
        clean = flags.map_batches(
            lambda b: pa.table({"cid": b[id_col]}).filter(
                pc.invert(pc.cast(b["flagged"], pa.bool_()))
            ),
            batch_format="pyarrow",
        ).materialize()
        from .stages.clustering import clamped_partitions

        kp = clamped_partitions(max(clean.count(), 1), 16)
        kept = kept.join(
            clean, join_type="left_semi", num_partitions=kp, on=(id_col,), right_on=("cid",)
        ).materialize()
        metrics["after_decontamination"] = kept.count()

    def assign_split(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        r = (ids % 2147483647) * 48271 % 2147483647 % 10
        split = np.where(r < 8, "train", np.where(r == 8, "val", "test"))
        return b.append_column("split", pa.array(split.astype(object), pa.string()))

    curated = kept.map_batches(assign_split, batch_format="pyarrow")

    if args.dsir_target:
        # DSIR importance weights (stages/lm.dsir_log_importance) against
        # the target-domain corpus, written ALONGSIDE the split column:
        # left-outer attach so the weight never changes corpus membership
        # (docs with < 2 tokens carry a null log_w — honest, not imputed).
        from .stages.clustering import clamped_partitions
        from .stages.lm import dsir_log_importance

        curated = curated.materialize()
        weights = dsir_log_importance(
            curated,
            rd.read_parquet(args.dsir_target),
            text_col=text_col,
            id_col=id_col,
        ).map_batches(
            lambda b: pa.table({"wid": b[id_col], "log_w": b["log_w"]}),
            batch_format="pyarrow",
        ).materialize()
        curated = curated.join(
            weights,
            join_type="left_outer",
            num_partitions=clamped_partitions(max(weights.count(), 1), 16),
            on=(id_col,),
            right_on=("wid",),
        )
        metrics["dsir_weighted_docs"] = weights.count()

    if args.epoch_seed >= 0:
        # Deterministic epoch shuffle (stages/sampling.epoch_shuffle) as the
        # FINAL stage: stamp each curated doc's exact 1-based position in the
        # seed's epoch order, so the written shards are a ready-to-stream,
        # resumable training order (epoch e+1 = re-run with seed+1; membership
        # and split never change — ordering only).
        from .stages.sampling import epoch_shuffle

        curated = epoch_shuffle(curated, id_col, seed=args.epoch_seed)
        metrics["epoch_seed"] = args.epoch_seed

    curated.write_parquet(_fresh_dir(args.out))
    dropped.write_parquet(_fresh_dir(args.out_dropped))
    metrics["curated_docs"] = rd.read_parquet(args.out).count()
    os.makedirs(os.path.dirname(args.manifest) or ".", exist_ok=True)
    with open(args.manifest, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps({**metrics, "out": args.out, "manifest": args.manifest}))
    ray.shutdown()


def cmd_simjoin(args) -> None:
    """Exact set-similarity join (stages/simjoin.ppjoin_pairs): all document
    pairs with token-set Jaccard >= threshold, zero misses."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.simjoin import ppjoin_pairs

    ds = rd.read_parquet(args.docs)
    pairs = ppjoin_pairs(
        ds, args.threshold, id_col=args.id_col, text_col=args.text_col
    )
    pairs.write_parquet(_fresh_dir(args.out))
    # count from the written files — pairs.count() would re-run joins+verify
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"pairs": n, "threshold": args.threshold, "out": args.out}))
    ray.shutdown()


def cmd_pack(args) -> None:
    """Next-fit sequence packing (stages/text_analysis.pack_next_fit):
    per-group token-budget bins for training-shard assembly."""
    ray = _ray_session(args.num_cpus)
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .stages.text_analysis import pack_next_fit

    ds = rd.read_parquet(args.docs)
    budget, group, idc, tc = args.budget, args.group, args.id_col, args.text_col

    def lens(b: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(b[tc])
        b = b.filter(pc.not_equal(trimmed, ""))
        n = pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b[tc])))
        return pa.table({group: b[group], idc: b[idc], "n": pc.cast(n, pa.int64())})

    def pack(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(idc, "ascending")]))
        bins = pack_next_fit(np.asarray(g["n"], dtype=np.int64), budget)
        return g.append_column("bin_idx", pa.array(bins, pa.int64()))

    out = ds.map_batches(lens, batch_format="pyarrow").groupby(group).map_groups(
        pack, batch_format="pyarrow"
    )
    out.write_parquet(_fresh_dir(args.out))
    print(json.dumps({"rows": rd.read_parquet(args.out).count(), "budget": budget, "out": args.out}))
    ray.shutdown()


def cmd_heavy(args) -> None:
    """Exact bounded-memory heavy hitters (stages/sketches.heavy_hitters)
    over one column of a parquet table."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.sketches import heavy_hitters

    ds = rd.read_parquet(args.docs)
    tbl = heavy_hitters(ds, args.key, args.min_frac)
    print(json.dumps({"items": tbl.num_rows, "top": tbl.to_pylist()[: args.show]}))
    ray.shutdown()


def cmd_quantize(args) -> None:
    """Scalar uint8 quantization of an embedding parquet table
    (stages/quantize.py): writes (id, codes) parquet 4× smaller than float32."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.quantize import quantize_embeddings

    ds = rd.read_parquet(args.embeddings)
    out = quantize_embeddings(ds, args.col, id_col=args.id_col)
    out.write_parquet(_fresh_dir(args.out))
    print(json.dumps({"rows": rd.read_parquet(args.out).count(), "out": args.out}))
    ray.shutdown()


def cmd_decon(args) -> None:
    """Benchmark n-gram decontamination (stages/contamination.decontaminate):
    writes per-doc hit stats; --drop-flagged also writes the clean corpus."""
    ray = _ray_session(args.num_cpus)
    import pyarrow.compute as pc
    import ray.data as rd

    from .stages.contamination import decontaminate

    ds = rd.read_parquet(args.docs)
    out = decontaminate(
        ds, id_col=args.id_col, text_col=args.text_col, n=args.ngram, bench_mod=args.bench_mod
    )
    out.write_parquet(_fresh_dir(args.out))
    stats = rd.read_parquet(args.out)
    n_total = stats.count()
    n_flagged = stats.map_batches(
        lambda b: b.filter(pc.equal(b["flagged"], True)), batch_format="pyarrow"
    ).count()
    print(json.dumps({"docs": n_total, "flagged": n_flagged, "out": args.out}))
    ray.shutdown()


def cmd_dup_spans(args) -> None:
    """Cross-doc duplicated-n-gram stats (stages/contamination.dup_span_stats)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .stages.contamination import dup_span_stats

    ds = rd.read_parquet(args.docs)
    out = dup_span_stats(ds, id_col=args.id_col, text_col=args.text_col, n=args.ngram)
    out.write_parquet(_fresh_dir(args.out))
    print(json.dumps({"docs": rd.read_parquet(args.out).count(), "out": args.out}))
    ray.shutdown()


def cmd_mix(args) -> None:
    """Per-group token-budget mixture sampling (stages/scan.budget_mix)."""
    ray = _ray_session(args.num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .stages.scan import budget_mix

    ds = rd.read_parquet(args.docs)
    group, idc, tc = args.group, args.id_col, args.text_col

    def prep(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b[tc])))
        return pa.table({idc: b[idc], group: b[group], "n_toks": pc.cast(n, pa.int64())})

    out = budget_mix(
        ds.map_batches(prep, batch_format="pyarrow"), group, [idc], "n_toks", budget=args.budget
    )
    out.write_parquet(_fresh_dir(args.out))
    print(json.dumps({"kept": rd.read_parquet(args.out).count(), "budget": args.budget, "out": args.out}))
    ray.shutdown()


def cmd_eval(args) -> None:
    import pyarrow.parquet as pq

    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .evaluation.metrics import pairwise_prf_distributed
    from .pipelines.linkage import LinkageConfig, run_linkage

    catalog = pq.read_table(args.catalog)
    res = run_linkage(rd.read_parquet(args.transcripts), catalog, LinkageConfig())
    # Distributed contingency-count PRF — the driver never pulls mentions.
    gold_ds = rd.read_parquet(args.gold, columns=["mention_uid", "gold_ids"])
    prf = pairwise_prf_distributed(res.mentions, gold_ds)
    if args.output_dir:
        # Reference artifacts (cli/eval.py:118-133): eval_results.json +
        # predicts.jsonl (sharded dir).
        from .state.reports import predict_report, write_eval_results_json, write_predicts_jsonl

        write_eval_results_json(prf, args.output_dir)
        report = predict_report(res, catalog, gold=pq.read_table(args.gold))
        write_predicts_jsonl(report, args.output_dir)
    print(json.dumps(prf))
    ray.shutdown()


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="mix_blink_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="generate the deterministic synthetic corpus")
    sp.add_argument("--turns", type=int, default=64000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--out", default="/tmp/mbr_synth")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_synth)

    ip = sub.add_parser("ingest", help="convert CoNLL to transcript + span parquet")
    ip.add_argument("--conll", required=True)
    ip.add_argument("--out", required=True)
    ip.set_defaults(fn=cmd_ingest)

    lp = sub.add_parser("link", help="run blocking→scoring→clustering")
    lp.add_argument("--transcripts", required=True)
    lp.add_argument("--catalog", required=True)
    lp.add_argument("--out", required=True)
    lp.add_argument("--work-dir", default=None)
    lp.add_argument("--strategy", default="auto", choices=["auto", "contract", "stream"])
    lp.add_argument("--num-cpus", type=int, default=None)
    lp.set_defaults(fn=cmd_link)

    ij = sub.add_parser("ingest-jsonl", help="reference-format JSONL dataset → mention parquet")
    ij.add_argument("--jsonl", required=True)
    ij.add_argument("--labels", default=None, help="file of whitespace-separated catalog ids")
    ij.add_argument("--nil-id", default="-1")
    ij.add_argument("--remove-nil", action="store_true")
    ij.add_argument("--out", required=True)
    ij.add_argument("--num-cpus", type=int, default=None)
    ij.set_defaults(fn=cmd_ingest_jsonl)

    dp = sub.add_parser("dedup", help="corpus dedup: kept docs + drop list with reasons")
    dp.add_argument("--docs", required=True)
    dp.add_argument("--threshold", type=float, default=0.7)
    dp.add_argument("--out-kept", required=True)
    dp.add_argument("--out-dropped", required=True)
    dp.add_argument("--num-cpus", type=int, default=None)
    dp.set_defaults(fn=cmd_dedup)

    li = sub.add_parser("link-incremental", help="delta-batch linkage against persisted state")
    li.add_argument("--transcripts", required=True)
    li.add_argument("--catalog", required=True)
    li.add_argument("--state-dir", required=True)
    li.add_argument("--out", required=True)
    li.add_argument("--num-cpus", type=int, default=None)
    li.set_defaults(fn=cmd_link_incremental)

    bi = sub.add_parser("build-index", help="entity dictionary → persisted embedding index parquet")
    bi.add_argument("--catalog", required=True, help="catalog parquet or dictionary JSONL")
    bi.add_argument("--measure", default="ip", choices=["ip", "cos", "l2"])
    bi.add_argument("--nil", action="store_true", help="append the [NIL] sentinel row")
    bi.add_argument("--out", required=True)
    bi.set_defaults(fn=cmd_build_index)

    ai = sub.add_parser("ann-index", help="embeddings parquet → persisted IVF index (centroids + assignments)")
    ai.add_argument("--embeddings", required=True)
    ai.add_argument("--out", required=True)
    ai.add_argument("--clusters", type=int, default=64)
    ai.add_argument("--iters", type=int, default=5)
    ai.add_argument("--num-cpus", type=int, default=None)
    ai.set_defaults(fn=cmd_ann_index)

    cp = sub.add_parser("candidates", help="per-mention top-k candidates + hard negatives (JSONL)")
    cp.add_argument("--transcripts", required=True)
    cp.add_argument("--catalog", required=True)
    cp.add_argument("--gold", required=True)
    cp.add_argument("--top-k", type=int, default=10)
    cp.add_argument("--out", required=True)
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_candidates)

    smp = sub.add_parser("sample", help="deterministic corpus sample (rate or stratified)")
    smp.add_argument("--docs", required=True)
    smp.add_argument("--key", default="doc_id")
    smp.add_argument("--mod", type=int, default=10, help="rate mode: keep ~1/mod of rows")
    smp.add_argument("--residue", type=int, default=0)
    smp.add_argument("--stratum", default=None, help="stratified mode: group column")
    smp.add_argument("--k", type=int, default=5, help="stratified mode: rows kept per stratum")
    smp.add_argument("--out", required=True)
    smp.add_argument("--num-cpus", type=int, default=None)
    smp.set_defaults(fn=cmd_sample)

    vp = sub.add_parser("vocab", help="token counts / doc frequencies / inverted index")
    vp.add_argument("--docs", required=True)
    vp.add_argument("--mode", default="counts", choices=["counts", "df", "index"])
    vp.add_argument("--text-col", default="text")
    vp.add_argument("--out", required=True)
    vp.add_argument("--num-cpus", type=int, default=None)
    vp.set_defaults(fn=cmd_vocab)

    bt = sub.add_parser("bpe-train", help="learn BPE tokenizer merges from a documents parquet")
    bt.add_argument("--docs", required=True)
    bt.add_argument("--out", required=True, help="output parquet FILE for the merge table")
    bt.add_argument("--text-col", default="text")
    bt.add_argument("--n-merges", type=int, default=64)
    bt.add_argument("--min-count", type=int, default=2)
    bt.add_argument("--num-cpus", type=int, default=None)
    bt.set_defaults(fn=cmd_bpe_train)

    dc = sub.add_parser("decon", help="benchmark n-gram decontamination: per-doc hit stats")
    dc.add_argument("--docs", required=True)
    dc.add_argument("--out", required=True)
    dc.add_argument("--id-col", default="doc_id")
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--ngram", type=int, default=5)
    dc.add_argument("--bench-mod", type=int, default=13)
    dc.add_argument("--num-cpus", type=int, default=None)
    dc.set_defaults(fn=cmd_decon)

    dsp = sub.add_parser("dup-spans", help="cross-doc duplicated n-gram stats per doc")
    dsp.add_argument("--docs", required=True)
    dsp.add_argument("--out", required=True)
    dsp.add_argument("--id-col", default="doc_id")
    dsp.add_argument("--text-col", default="text")
    dsp.add_argument("--ngram", type=int, default=5)
    dsp.add_argument("--num-cpus", type=int, default=None)
    dsp.set_defaults(fn=cmd_dup_spans)

    mx = sub.add_parser("mix", help="per-group token-budget mixture sampling")
    mx.add_argument("--docs", required=True)
    mx.add_argument("--out", required=True)
    mx.add_argument("--group", default="source")
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--text-col", default="text")
    mx.add_argument("--budget", type=int, required=True)
    mx.add_argument("--num-cpus", type=int, default=None)
    mx.set_defaults(fn=cmd_mix)

    di = sub.add_parser("dedup-incremental", help="delta-batch exact dedup vs persisted fingerprint state")
    di.add_argument("--docs", required=True)
    di.add_argument("--state-dir", required=True)
    di.add_argument("--id-col", default="doc_id")
    di.add_argument("--out", default=None, help="optionally write the novel documents (payloads)")
    di.add_argument("--num-cpus", type=int, default=None)
    di.set_defaults(fn=cmd_dedup_incremental)

    mi = sub.add_parser(
        "minhash-incremental",
        help="delta-batch MinHash near-dup pairs vs persisted LSH band/signature state",
    )
    mi.add_argument("--docs", required=True)
    mi.add_argument("--state-dir", required=True)
    mi.add_argument("--out", required=True)
    mi.add_argument("--id-col", default="doc_id")
    mi.add_argument("--text-col", default="text")
    mi.add_argument("--threshold", type=float, default=0.7)
    mi.add_argument("--num-cpus", type=int, default=None)
    mi.set_defaults(fn=cmd_minhash_incremental)

    cu = sub.add_parser("curate", help="end-to-end corpus curation: quality -> dedup -> decon -> split")
    cu.add_argument("--docs", required=True)
    cu.add_argument("--out", required=True, help="curated corpus parquet dir (with split column)")
    cu.add_argument("--out-dropped", required=True, help="drop-ledger parquet dir")
    cu.add_argument("--manifest", required=True, help="per-stage metrics JSON file")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--min-quality", type=float, default=0.5)
    cu.add_argument("--threshold", type=float, default=0.7, help="near-dup verify Jaccard")
    cu.add_argument("--ngram", type=int, default=5)
    cu.add_argument("--bench-mod", type=int, default=13, help="0 disables decontamination")
    cu.add_argument(
        "--lm-perplexity-percentile",
        type=float,
        default=0.0,
        help="keep only docs at or below this avg-bigram-NLL percentile "
        "(CCNet-style fluency gate, runs after the heuristic gate; 0 disables)",
    )
    cu.add_argument(
        "--epoch-seed",
        type=int,
        default=-1,
        help="stamp a deterministic epoch_pos training-order column on the "
        "curated output (seed of the epoch order; -1 disables)",
    )
    cu.add_argument(
        "--dsir-target",
        default=None,
        help="parquet dir/file of target-domain docs: attach a DSIR log_w "
        "importance-weight column to the curated output",
    )
    cu.add_argument("--num-cpus", type=int, default=None)
    cu.set_defaults(fn=cmd_curate)

    sj = sub.add_parser("simjoin", help="exact token-Jaccard similarity join (prefix filter)")
    sj.add_argument("--docs", required=True)
    sj.add_argument("--out", required=True)
    sj.add_argument("--threshold", type=float, default=0.7)
    sj.add_argument("--id-col", default="doc_id")
    sj.add_argument("--text-col", default="text")
    sj.add_argument("--num-cpus", type=int, default=None)
    sj.set_defaults(fn=cmd_simjoin)

    pk = sub.add_parser("pack", help="next-fit token-budget sequence packing per group")
    pk.add_argument("--docs", required=True)
    pk.add_argument("--budget", type=int, default=2048)
    pk.add_argument("--group", default="source")
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--text-col", default="text")
    pk.add_argument("--out", required=True)
    pk.add_argument("--num-cpus", type=int, default=None)
    pk.set_defaults(fn=cmd_pack)

    hh = sub.add_parser("heavy", help="exact bounded-memory heavy hitters of a column")
    hh.add_argument("--docs", required=True)
    hh.add_argument("--key", required=True)
    hh.add_argument("--min-frac", type=float, default=0.01)
    hh.add_argument("--show", type=int, default=20)
    hh.add_argument("--num-cpus", type=int, default=None)
    hh.set_defaults(fn=cmd_heavy)

    qz = sub.add_parser("quantize", help="scalar uint8 quantization of an embedding table")
    qz.add_argument("--embeddings", required=True)
    qz.add_argument("--col", default="embedding")
    qz.add_argument("--id-col", default="vec_id")
    qz.add_argument("--out", required=True)
    qz.add_argument("--num-cpus", type=int, default=None)
    qz.set_defaults(fn=cmd_quantize)

    ep = sub.add_parser("eval", help="pairwise P/R/F1 vs a gold mentions table")
    ep.add_argument("--transcripts", required=True)
    ep.add_argument("--catalog", required=True)
    ep.add_argument("--gold", required=True)
    ep.add_argument("--output-dir", default=None, help="write eval_results.json + predicts_jsonl/")
    ep.add_argument("--num-cpus", type=int, default=None)
    ep.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
