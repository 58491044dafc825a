"""mix_blink_ray — a from-scratch, Ray-Data-native record-linkage engine.

Re-expresses the capabilities of the reference bi-encoder entity-linking loop
(YuSawan/mix-blink, studied read-only at /root/reference) as a three-stage
``ray.data.Dataset`` program over Parquet transcript tables:

1. **blocking** — MinHash/LSH banding over normalized mention text
   (``stages/blocking.py``),
2. **pairwise candidate scoring** — actor-pool ``map_batches`` running a
   deterministic hash-n-gram bi-encoder (HF-pluggable) with dense top-k against a
   broadcast entity catalog plus cheap Jaccard/Jaro-Winkler prefilters
   (``stages/scoring.py``),
3. **transitive clustering** — iterative min-label propagation via repeated
   groupby-aggregate rounds to fixpoint (``stages/clustering.py``).

Nothing here imports from or copies the reference; reference files are cited in
docstrings (``path:line``) purely to anchor behavioral parity.

No module in this package calls ``ray.init``/``ray.shutdown`` — the caller
(driver, bench.py, CLI, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"
