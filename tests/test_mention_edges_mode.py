"""General-path clustering (emit_mention_edges=True): catalog-free dedup
semantics — mentions sharing (or near-matching) surfaces become transitive."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage


def toy_transcripts():
    texts = [
        "we met Zorbenkel Systems about terms",      # entity-ish surface A
        "follow up with Zorbenkel Systems today",    # exact dup of A
        "note from Zorbenkel Sysstems arrived",      # near-dup of A (typo)
        "nothing relevant here",
        "ping Qqzzt Vvkkw when possible",            # NIL surface B
        "Qqzzt Vvkkw replied overnight",             # exact dup of B
    ]
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "role": pa.array(["user"] * len(texts)),
            "text": pa.array(texts),
            "tool": pa.array([""] * len(texts)),
            "ts": pa.array([0] * len(texts), pa.timestamp("us")),
        }
    )


def toy_catalog():
    return pa.table(
        {
            "entity_id": pa.array(["000001", "000002"]),
            "name": pa.array(["Zorbenkel Systems", "Felgarmak Corp"]),
            "description": pa.array(["", ""]),
        }
    )


def test_general_path_surface_transitivity():
    cfg = LinkageConfig(emit_mention_edges=True, scoring_strategy="contract")
    res = run_linkage(rd.from_arrow(toy_transcripts()), toy_catalog(), cfg)
    m = res.mentions.to_pandas().set_index("conv_id")

    # exact + near-dup surfaces of the entity all share its cluster
    assert m.loc["c0", "cluster_id"] == "e:000001"
    assert m.loc["c1", "cluster_id"] == "e:000001"
    assert m.loc["c2", "cluster_id"] == "e:000001"
    # NIL mentions with identical surfaces cluster together (catalog-free
    # dedup semantics of this mode) but not with the entity cluster
    assert m.loc["c4", "cluster_id"] == m.loc["c5", "cluster_id"]
    assert m.loc["c4", "cluster_id"] != "e:000001"
    assert m.loc["c4", "pred_id"] == "-1"


def test_default_path_unaffected():
    res = run_linkage(
        rd.from_arrow(toy_transcripts()), toy_catalog(), LinkageConfig(emit_mention_edges=False)
    )
    m = res.mentions.to_pandas().set_index("conv_id")
    # NIL mentions stay singletons on the default path
    assert m.loc["c4", "cluster_id"] != m.loc["c5", "cluster_id"]
