"""Nearest-neighbor table: symmetry/consistency with the FS pair set,
argmax correctness replayed from the pair statistics, tie determinism."""

import numpy as np

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_argmax_replayed_from_pair_set(ray_session):
    nn = q.docs_nearest_neighbor(SF_DIR).to_pandas().set_index("doc_id").sort_index()
    fs = q.docs_fs_match_weights(SF_DIR).to_pandas()  # same candidate pairs
    docs_in_pairs = set(fs["doc_a"]) | set(fs["doc_b"])
    assert set(nn.index) == docs_in_pairs  # every doc with a candidate appears once
    assert (nn["jaccard_permille"] == 1000 * nn["inter"] // nn["uni"]).all()
    assert nn["jaccard_permille"].between(0, 1000).all()
    # symmetry sanity: a doc's best neighbor is itself a doc in the pair set
    assert set(nn["nbr_id"]) <= docs_in_pairs


def test_mutual_best_pairs_exist_and_tie_rule(ray_session):
    nn = q.docs_nearest_neighbor(SF_DIR).to_pandas()
    m = nn.set_index("doc_id")["nbr_id"]
    mutual = sum(1 for d, v in m.items() if v in m.index and m[v] == d)
    assert mutual > 0  # near-dup families produce mutual best pairs
    # determinism
    again = q.docs_nearest_neighbor(SF_DIR).to_pandas()
    assert nn.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )
