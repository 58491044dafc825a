"""Fold-leakage audit: cell normalization, cross-query consistency with the
Fellegi–Sunter label (same verified pair set), and the leakage story itself
(row-level folds DO leak near-dup pairs on this corpus)."""

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_cells_normalized_and_bounded(ray_session):
    out = q.docs_fold_leakage_audit(SF_DIR).to_pandas()
    assert (out["fold_a"] <= out["fold_b"]).all()
    assert out["fold_a"].between(0, 4).all() and out["fold_b"].between(0, 4).all()
    assert (out["n_pairs"] > 0).all()
    # at most C(5,2)+5 = 15 cells
    assert len(out) <= 15


def test_total_matches_fs_match_count(ray_session):
    # the audit counts exactly the pairs the Fellegi–Sunter query labels
    # is_match (both use 10·inter ≥ 7·uni over the same candidates)
    audit = q.docs_fold_leakage_audit(SF_DIR).to_pandas()
    fs = q.docs_fs_match_weights(SF_DIR).to_pandas()
    assert int(audit["n_pairs"].sum()) == int(fs["is_match"].sum())


def test_row_level_folds_do_leak(ray_session):
    # the reason docs_split_leakage_safe exists: on this corpus the
    # row-level stratified folds put most near-dup pairs across folds
    out = q.docs_fold_leakage_audit(SF_DIR).to_pandas()
    cross = int(out[out["fold_a"] != out["fold_b"]]["n_pairs"].sum())
    assert cross > 0
