"""Hand-computed pair-counting check for docs_er_rand_index: exact Rand /
ARI sufficient statistics on a constructed 6-doc corpus with a known
contingency table (clusters {0,1,2},{3,4},{5} × classes web/mail)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mix_blink_ray.pipelines.queries import docs_er_rand_index


def _corpus(tmp_path, rows):
    texts, srcs = zip(*rows)
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(list(texts)),
            "source": pa.array(list(srcs)),
            "n_tokens": pa.array([len(t.split()) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_hand_computed_pair_counts(tmp_path):
    # Duplicate texts cluster via the ±5-window trigram-Jaccard chain; the
    # three distinct texts share no trigrams so nothing verifies across groups.
    t1 = "alpha beta gamma delta epsilon"
    t2 = "zzz yyy xxx www vvv uuu"
    t3 = "12345 67890 13579 24680"
    rows = [(t1, "web"), (t1, "web"), (t1, "mail"), (t2, "mail"), (t2, "mail"), (t3, "web")]
    out = docs_er_rand_index(_corpus(tmp_path, rows)).to_pandas().iloc[0]
    # n=6, C=15; clusters sizes 3/2/1 -> pr=4; classes web=3, mail=3 -> pc=6;
    # cells (c0,web)=2,(c0,mail)=1,(c3,mail)=2,(c5,web)=1 -> tp=2.
    assert int(out["n_docs"]) == 6
    assert int(out["pair_total"]) == 15
    assert int(out["cluster_pairs"]) == 4
    assert int(out["class_pairs"]) == 6
    assert int(out["tp_pairs"]) == 2
    # Rand = (15 - 4 - 6 + 4)/15 = 0.6 exactly.
    assert int(out["rand_permille"]) == 600
    # ARI = 2*(tp*C - pr*pc) / (C*(pr+pc) - 2*pr*pc) = 12/102.
    assert int(out["ari_num"]) == 12
    assert int(out["ari_den"]) == 102


def test_degenerate_raises(tmp_path):
    # A single document: C(n,2)=0 — must fail loudly, not divide by zero.
    with pytest.raises(ValueError, match="fewer than 2"):
        docs_er_rand_index(_corpus(tmp_path, [("only one document here", "web")]))
