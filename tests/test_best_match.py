"""Best-match clustering: component structure vs the nearest-neighbor
digraph, min-label convention, and the semantics contrast with the
transitive-closure ER clusters (best-first refines, never merges more)."""

import numpy as np

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_components_replayed_from_nn_edges(ray_session):
    nn = q.docs_nearest_neighbor(SF_DIR).to_pandas()
    got = q.docs_best_match_clusters(SF_DIR).to_pandas()
    # sequential union-find reference over the same edges
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(nn["doc_id"], nn["nbr_id"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}
    gmap = dict(zip(got["doc_id"].astype(int), got["cluster_id"].astype(int)))
    assert gmap == want
    # min-label convention
    labels = got.groupby("cluster_id")["doc_id"].min()
    assert (labels.index.to_numpy() == labels.to_numpy()).all()


def test_best_first_never_merges_more_than_closure(ray_session):
    # every best-match edge is a verified candidate pair, so best-match
    # components are sub-partitions of the full candidate-graph closure:
    # two docs in different best-match... may still share a closure cluster,
    # but two docs in ONE best-match cluster can never span two closure
    # clusters of the same pair graph's transitive closure superset.
    bm = q.docs_best_match_clusters(SF_DIR).to_pandas()
    fs = q.docs_fs_match_weights(SF_DIR).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(fs["doc_a"], fs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    closure_of = {int(d): find(int(d)) for d in set(fs["doc_a"]) | set(fs["doc_b"])}
    for cid, grp in bm.groupby("cluster_id"):
        roots = {closure_of[int(d)] for d in grp["doc_id"]}
        assert len(roots) == 1  # a best-match cluster never straddles closure clusters
    # and best-first is a strict refinement on this corpus (more clusters)
    assert bm["cluster_id"].nunique() >= len(set(closure_of.values()))
