"""Blocking-key and clustering unit tests."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.stages.blocking import BlockingConfig, add_salt, block_keys_table, composite_context_key
from mix_blink_ray.stages.clustering import cluster_nodes, propagate_labels, unionfind_labels


def nodes_table(texts):
    return pa.table(
        {
            "node_id": pa.array([f"n{i}" for i in range(len(texts))]),
            "norm_text": pa.array(texts),
        }
    )


def test_block_keys_explode_shape():
    cfg = BlockingConfig(num_bands=8)
    t = nodes_table(["zormak systems", "unrelated text"])
    out = block_keys_table(t, cfg)
    assert out.num_rows == 2 * 9  # 8 bands + exact key
    assert set(out.column_names) >= {"block_key", "node_id", "norm_text", "band"}


def test_identical_surfaces_share_exact_block():
    cfg = BlockingConfig()
    t = nodes_table(["same text", "same text", "other thing"])
    out = block_keys_table(t, cfg).to_pandas()
    exact = out[out.band == -1]
    assert exact[exact.node_id == "n0"].block_key.iloc[0] == exact[exact.node_id == "n1"].block_key.iloc[0]
    assert exact[exact.node_id == "n0"].block_key.iloc[0] != exact[exact.node_id == "n2"].block_key.iloc[0]


def test_similar_surfaces_share_some_band():
    cfg = BlockingConfig()
    t = nodes_table(["zormak systems incorporated", "zormak systems incorported", "qqq www eee rrr"])
    out = block_keys_table(t, cfg).to_pandas()
    k0 = set(out[out.node_id == "n0"].block_key)
    k1 = set(out[out.node_id == "n1"].block_key)
    k2 = set(out[out.node_id == "n2"].block_key)
    assert k0 & k1
    assert not (k0 & k2)


def test_salting_caps_and_is_deterministic():
    cfg = BlockingConfig(salt_cap=10)
    t = nodes_table([f"text {i}" for i in range(35)])
    salted = add_salt(t, cfg)
    counts = np.bincount(np.asarray(salted["salt"]))
    assert counts.max() <= 10 + 10  # hash balance is approximate; bounded well below 35
    assert len(counts) == 4  # ceil(35/10)
    assert salted["salted"].to_pylist() == [True] * 35
    salted2 = add_salt(t, cfg)
    assert salted["salt"].to_pylist() == salted2["salt"].to_pylist()
    small = add_salt(nodes_table(["a", "b"]), cfg)
    assert small["salted"].to_pylist() == [False, False]


def test_composite_context_key():
    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c1", "c2"]),
            "turn_idx": pa.array([0, 3, 9, 0], pa.int32()),
            "role": pa.array(["user", "user", "user", "user"]),
            "tool": pa.array(["", "", "", ""]),
        }
    )
    keys = composite_context_key(t, window=8).to_pylist()
    assert keys[0] == keys[1]      # same window
    assert keys[0] != keys[2]      # next window
    assert keys[0] != keys[3]      # other conv


def graph_edges():
    return pa.table(
        {
            "src": pa.array(["b", "c", "x", "m"]),
            "dst": pa.array(["a", "b", "y", "x"]),
        }
    )


def graph_nodes():
    return pa.table({"node": pa.array(["a", "b", "c", "x", "y", "m", "lone"])})


EXPECTED = {"a": "a", "b": "a", "c": "a", "x": "m", "y": "m", "m": "m", "lone": "lone"}


def test_unionfind_labels():
    out = unionfind_labels(graph_edges(), graph_nodes()["node"].combine_chunks())
    assert dict(zip(out["node"].to_pylist(), out["label"].to_pylist())) == EXPECTED


def test_propagate_labels_matches_unionfind():
    edges = rd.from_arrow(graph_edges())
    nodes = rd.from_arrow(graph_nodes())
    out = propagate_labels(edges, nodes, num_partitions=2).to_pandas()
    assert dict(zip(out["node"], out["label"])) == EXPECTED


def test_cluster_nodes_modes_agree():
    edges = rd.from_arrow(graph_edges())
    nodes = rd.from_arrow(graph_nodes())
    d = cluster_nodes(edges, nodes, mode="driver").to_pandas()
    dist = cluster_nodes(edges, nodes, mode="distributed").to_pandas()
    assert dict(zip(d["node"], d["label"])) == dict(zip(dist["node"], dist["label"]))


def test_propagate_long_chain():
    """Chain graph needs multiple propagation rounds."""
    n = 12
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([f"n{i:02d}" for i in range(n - 1)]),
                "dst": pa.array([f"n{i + 1:02d}" for i in range(n - 1)]),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array([f"n{i:02d}" for i in range(n)])}))
    out = propagate_labels(edges, nodes, num_partitions=2).to_pandas()
    assert set(out["label"]) == {"n00"}


def test_propagate_labels_long_chain_converges():
    """Regression (round-1 ADVICE): a component with diameter > the old
    32-round cap must still collapse to one label — pointer jumping makes
    rounds O(log diameter)."""
    n = 100
    names = [f"n{i:04d}" for i in range(n)]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(names[:-1]), "dst": pa.array(names[1:])})
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array(names)}))
    out = propagate_labels(edges, nodes, num_partitions=2).to_pandas()
    assert set(out["label"]) == {"n0000"}
    assert len(out) == n


def test_sorted_neighborhood_pairs_stitch_across_blocks():
    """Every sort-adjacent pair within the window must appear EXACTLY once,
    no matter the block layout — boundary pairs are the regression target."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mix_blink_ray.stages.blocking import sorted_neighborhood_pairs

    n, w = 101, 3
    rng = np.random.default_rng(11)
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table({"k": pa.array(ids), "name": pa.array([f"n{int(i):04d}" for i in ids])})
    want = set()
    srt = sorted(ids)
    for i in range(n):
        for off in range(1, w + 1):
            if i + off < n:
                want.add((srt[i], srt[i + off]))
    for n_blocks in (1, 2, 9, 64):
        out = sorted_neighborhood_pairs(
            rd.from_arrow(tbl).repartition(n_blocks), ["name", "k"], window=w
        ).to_pandas()
        got = list(zip(out.a_k, out.b_k))
        assert len(got) == len(set(got)) == len(want), n_blocks
        assert set(got) == want, n_blocks


def test_meta_blocking_pairs_vs_bruteforce():
    """CBS weights and the min_shared prune must equal a local brute-force
    over the same trigram block collection, at every partition layout and
    on BOTH the broadcast and join key-filter paths."""
    from collections import Counter

    from mix_blink_ray.stages.blocking import meta_blocking_pairs

    docs = [
        "a b c d e f",          # shares 'a b c','b c d' with doc 1
        "a b c d x y",
        "p q r s t u",          # shares 'p q r','q r s' with doc 3
        "p q r s z w",
        "unrelated words only here now ok",
        "a b c d e f",          # exact dup of doc 0 → many shared grams
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)})

    # local reference
    def grams(s):
        t = s.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
    gsets = [grams(d) for d in docs]
    from collections import defaultdict
    members = defaultdict(set)
    for i, gs in enumerate(gsets):
        for g in gs:
            members[g].add(i)
    want = Counter()
    for g, mem in members.items():
        if not (2 <= len(mem) <= 20):
            continue
        mem = sorted(mem)
        for ai in range(len(mem)):
            for bi in range(ai + 1, len(mem)):
                want[(mem[ai], mem[bi])] += 1
    want = {p: w for p, w in want.items() if w >= 2}

    for n_blocks in (1, 3):
        for thresh in (20_000_000, 0):  # broadcast path, then forced join path
            out = meta_blocking_pairs(
                rd.from_arrow(tbl).repartition(n_blocks),
                n=3, min_block=2, max_block=20, min_shared=2,
                broadcast_threshold=thresh,
            ).to_pandas()
            got = {(int(a), int(b)): int(w) for a, b, w in
                   zip(out.doc_a, out.doc_b, out.shared_blocks)}
            assert got == want, (n_blocks, thresh)


def test_triangle_count_degree_oriented_hub_skew():
    """A 500-degree hub (the skew case degree orientation exists for) plus
    known triangles: the count must match a local reference count and be
    identical across block layouts (round-3 VERDICT item 3)."""
    import itertools

    from mix_blink_ray.pipelines.queries import _triangle_count

    edges = set()
    for i in range(1, 501):          # star: hub 0 — no triangles by itself
        edges.add((0, i))
    edges.add((1, 2))                # closes triangle (0, 1, 2)
    edges.add((3, 4))                # closes triangle (0, 3, 4)
    for base in (1000, 2000):        # two hub-free triangles
        a, b, c = base, base + 1, base + 2
        edges.update([(a, b), (a, c), (b, c)])

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert expected == 4

    tbl = pa.table(
        {
            "a_id": pa.array([a for a, _ in sorted(edges)], pa.int64()),
            "b_id": pa.array([b for _, b in sorted(edges)], pa.int64()),
        }
    )
    for n_blocks in (1, 13):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        assert _triangle_count(ds) == expected
