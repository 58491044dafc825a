"""Behavior tests for docs_er_golden_records survivorship semantics: mode
source wins, exact ties break to the lexicographically smallest source, the
representative is the min doc_id, and singleton clusters consolidate to
themselves."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mix_blink_ray.pipelines.queries import docs_er_golden_records


def _corpus(tmp_path, groups):
    """groups: list of (text, [sources]) — each group duplicates one unique
    ≥4-word text so meta-blocking (shared word-trigrams, block 2..20) blocks
    the group together and trigram-Jaccard verifies at 1.0."""
    rows_text, rows_src = [], []
    for text, sources in groups:
        for s in sources:
            rows_text.append(text)
            rows_src.append(s)
    n = len(rows_text)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(rows_text),
            "source": pa.array(rows_src),
            "n_tokens": pa.array([len(t.split()) for t in rows_text], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_mode_tiebreak_and_representative(tmp_path):
    groups = [
        ("alpha beta gamma delta epsilon zeta", ["web", "web", "mail"]),  # mode: web
        ("one two three four five six seven", ["zcrawl", "acrawl"]),  # tie -> acrawl
        ("lone document with enough unique words here", ["solo"]),  # singleton
    ]
    sf = _corpus(tmp_path, groups)
    out = (
        docs_er_golden_records(sf)
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    # cluster ids are min-doc labels: 0 (docs 0-2), 3 (docs 3-4), 5 (doc 5)
    assert out["cluster_id"].tolist() == [0, 3, 5]
    assert out["rep_doc"].tolist() == [0, 3, 5]
    assert out["n_members"].tolist() == [3, 2, 1]
    assert out["canonical_source"].tolist() == ["web", "acrawl", "solo"]
