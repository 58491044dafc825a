"""Benchmark harness: headline linkage pipeline + representative operator
queries over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "linkage_e2e_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "turns": T, "turns_per_sec": T/sec}

``--scaling``: runs the same bench in two fresh processes at num_cpus=8 and
num_cpus=32 on the same input and reports throughputs + scaling efficiency
(the sandbox proxy for the N→4N-node criterion; see BASELINE.md).

This script OWNS its Ray session (init+shutdown) — the library never does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _load_context() -> dict:
    """Box-load snapshot (loadavg + cumulative steal ticks) so a noisy
    co-tenant run self-explains in the artifact (round-3 VERDICT item 4)."""
    out: dict = {}
    try:
        la = open("/proc/loadavg").read().split()
        out["loadavg"] = [float(la[0]), float(la[1]), float(la[2])]
    except Exception:
        pass
    try:
        cpu = open("/proc/stat").readline().split()
        # fields: user nice system idle iowait irq softirq steal ...
        ticks = [int(x) for x in cpu[1:9]]
        out["cpu_ticks_total"] = sum(ticks)
        out["cpu_ticks_steal"] = ticks[7] if len(ticks) > 7 else 0
    except Exception:
        pass
    return out


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_before = _load_context()

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    # Generate (cached) synthetic transcripts for the headline pipeline and
    # warm the page cache with one untimed read of every input.
    paths = entry._synth_paths(sf_dir)
    import pyarrow.dataset as pads

    n_turns = pads.dataset(paths["transcripts"]).count_rows()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            pq.read_table(p)
    pads.dataset(paths["transcripts"]).to_table()

    # Warm the Ray worker pool (process spawn + heavy imports) so the timed
    # region measures the pipeline, not cold-start — one task per CPU slot.
    def _warm(batch):
        import mix_blink_ray  # noqa: F401 — pay import cost now
        import mix_blink_ray.pipelines.linkage  # noqa: F401

        return batch

    rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        _warm, batch_size=1
    ).count()

    # ── headline: full three-stage linkage, consumed via write_parquet ──────
    # Min-of-GRAFT_BENCH_REPS full recomputations (default 2): this VM's
    # co-tenant load spikes swing single-shot wall time up to 3× (loadavg
    # observed 0.1 → 18 within minutes); min-of-N is the same noise-floor
    # estimator the --scaling harness documents.  All raw reps are reported.
    import shutil

    headline_reps = max(1, int(os.environ.get("GRAFT_BENCH_REPS", "2")))

    def _headline_attempt() -> tuple[list, float | None]:
        """One full rep loop, with its OWN steal measurement."""
        before = _load_context()
        raw = []
        for rep in range(headline_reps):
            out_dir = f"/tmp/mbr_bench_out_{rep}"
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.time()
            res = entry._linkage_result(sf_dir)[0]
            res.mentions.write_parquet(out_dir)
            raw.append(round(time.time() - t0, 3))
            # Drop the result's materialized datasets NOW: their object refs
            # pin plasma memory, and carrying them into the next rep / the
            # query suite forces avoidable object-store spilling.
            del res
            import gc

            gc.collect()
        after = _load_context()
        steal = None
        if "cpu_ticks_total" in before and "cpu_ticks_total" in after:
            dt = after["cpu_ticks_total"] - before["cpu_ticks_total"]
            if dt > 0:
                steal = round(
                    100.0 * (after["cpu_ticks_steal"] - before["cpu_ticks_steal"]) / dt,
                    2,
                )
        return raw, steal

    # Quiet-window guard (round-4 VERDICT item 8): BENCH_r{N} is the number
    # rounds get compared by, and this VM's co-tenant steal swings wall time
    # up to 3×.  If an attempt saw steal% above GRAFT_BENCH_MIN_QUIET
    # (default 2.0; ≤ 0 disables), wait and re-run the headline reps, capped
    # at GRAFT_BENCH_MAX_ATTEMPTS — every attempt's reps AND steal are
    # logged in the artifact, so a noisy final number still self-explains.
    quiet_thresh = float(os.environ.get("GRAFT_BENCH_MIN_QUIET", "2.0"))
    max_attempts = max(1, int(os.environ.get("GRAFT_BENCH_MAX_ATTEMPTS", "3")))
    attempts = []
    while True:
        raw, steal = _headline_attempt()
        attempts.append({"reps": raw, "steal_pct": steal})
        quiet = steal is None or quiet_thresh <= 0 or steal <= quiet_thresh
        if quiet or len(attempts) >= max_attempts:
            break
        time.sleep(float(os.environ.get("GRAFT_BENCH_RETRY_SLEEP", "20")))
    headline_raw = [r for a in attempts for r in a["reps"]]
    headline_sec = min(headline_raw)

    # ── representative operator queries ─────────────────────────────────────
    # (skipped in --scaling legs: the scaling criterion measures the headline
    # pipeline, and the query suite at 2-4 CPUs costs minutes per leg)
    #
    # Fresh Ray session for the query phase: three headline reps leave
    # object-store/worker residue that inflated the shuffle-heavy queries up
    # to 4× (docs_minhash_near_dup measured 3.9 s in a fresh session vs
    # 14-22 s after the headline on the same box) — each phase now measures
    # in a clean room.
    bench_queries = [] if os.environ.get("GRAFT_SKIP_QUERIES") else [
        "q1_pricing_summary",
        "q3_top_orders",
        "events_hourly_window",
        "docs_minhash_near_dup",
        "docs_quality",
        "emb_knn_top5",
        "docs_exact_dedup",
        # round-3 additions (headline metric unchanged — these only extend
        # the per-query report)
        "lineitem_bloom_semi_join",
        "docs_heavy_tokens",
        "docs_repetition",
        "events_running_revenue",
        "q5_local_supplier_volume",
        "customers_surface_link_top3",
        # round-4 additions
        "events_salted_type_join",
        "events_interval_join_windows",
        "events_cms_user_counts",
        "docs_bpe_merges",
        # round-5 additions: the vectorized per-user window family's
        # representative (bucketed-run exchange), the unbounded-float
        # quantile sketch, exact PPJoin, and CBS meta-blocking
        "events_sessionized",
        "events_value_quantile_sketch",
        "docs_simjoin_exact",
        "docs_meta_blocking",
        "docs_epoch_shuffle",
        "events_context_window",
        "events_distinct_types_running",
        # round-5 session additions: Fellegi–Sunter pair scoring (the
        # pair-join-heavy ER scorer, ~110k candidate pairs at sf0.1), the
        # daily-grid interpolation (bucketed-run + segmented searchsorted),
        # and the WL fingerprint (iterative node-scale shuffle-aggregate)
        "docs_fs_match_weights",
        "events_user_day_interp",
        "customers_wl_fingerprint",
    ]
    q_times: dict[str, float] = {}
    if bench_queries:
        ray.shutdown()
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        rd.DataContext.get_current().enable_progress_bars = False
        rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
            _warm, batch_size=1
        ).count()
        qs = entry.queries()
        for name in bench_queries:
            tq = time.time()
            out = qs[name](sf_dir)
            if hasattr(out, "to_pandas"):
                out.to_pandas() if not hasattr(out, "materialize") else out.materialize()
            q_times[name] = round(time.time() - tq, 3)

    load_after = _load_context()
    steal_pct = None
    if "cpu_ticks_total" in load_before and "cpu_ticks_total" in load_after:
        dt = load_after["cpu_ticks_total"] - load_before["cpu_ticks_total"]
        if dt > 0:
            steal_pct = round(
                100.0 * (load_after["cpu_ticks_steal"] - load_before["cpu_ticks_steal"]) / dt, 2
            )
    import statistics

    result = {
        "metric": "linkage_e2e_sec",
        # min over reps = the noise-floor estimator (see BASELINE.md);
        # value_median reports the typical run alongside (round-3 ADVICE)
        "value": round(headline_sec, 3),
        "value_median": round(statistics.median(headline_raw), 3),
        "unit": "sec",
        "headline_raw_reps": headline_raw,
        "headline_attempts": attempts,
        "quiet_threshold_steal_pct": quiet_thresh,
        "queries": q_times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "turns": int(n_turns),
        "turns_per_sec": round(n_turns / headline_sec, 1),
        "loadavg_before": load_before.get("loadavg"),
        "loadavg_after": load_after.get("loadavg"),
        "steal_pct": steal_pct,
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    """Each leg runs GRAFT_SCALE_REPS times (default 2) in fresh processes
    and keeps the fastest — this sandbox VM shows ±40% run-to-run noise
    (BASELINE.md), and min-of-N is the standard estimator for the noise-free
    cost on a shared box.  All raw runs are reported alongside."""
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
    results: dict[int, dict] = {}
    raw: dict[str, list] = {}
    for n in (lo, hi):
        runs = []
        for _ in range(reps):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SKIP_QUERIES="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            runs.append(json.loads(out.strip().splitlines()[-1]))
        raw[f"secs_{n}"] = [r["value"] for r in runs]
        results[n] = min(runs, key=lambda r: r["value"])
    thr_lo = results[lo]["turns_per_sec"]
    thr_hi = results[hi]["turns_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                f"sec_{lo}": results[lo]["value"],
                f"sec_{hi}": results[hi]["value"],
                f"turns_per_sec_{lo}": thr_lo,
                f"turns_per_sec_{hi}": thr_hi,
                "reps": reps,
                **raw,
                "sf": results[hi]["sf"],
                "turns": results[hi]["turns"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
