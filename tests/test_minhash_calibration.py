"""MinHash calibration: consistency with the registered near-dup query
(same candidate set, same signatures) and the estimator-accuracy property
the table exists to show."""

import numpy as np

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_consistent_with_near_dup_query(ray_session):
    cal = q.docs_minhash_calibration(SF_DIR).to_pandas()
    nd = q.docs_minhash_near_dup(SF_DIR).to_pandas()
    # the near-dup output is exactly the calibration rows with sig_agree >= 64
    hi = cal[cal["sig_agree"] >= 64]
    assert sorted(map(tuple, hi[["a_id", "b_id"]].to_numpy())) == sorted(
        map(tuple, nd[["a_id", "b_id"]].to_numpy())
    )
    # and the recovered k reproduces the near-dup estimate exactly
    merged = hi.merge(nd, on=["a_id", "b_id"])
    assert np.allclose(merged["sig_agree"] / 128, merged["est_jaccard"], atol=1e-6)


def test_estimator_brackets_truth(ray_session):
    cal = q.docs_minhash_calibration(SF_DIR).to_pandas()
    assert len(cal) > 0
    assert cal["sig_agree"].between(0, 128).all()
    assert (cal["est_permille"] == 1000 * cal["sig_agree"] // 128).all()
    assert (cal["exact_permille"] == 1000 * cal["inter"] // cal["uni"]).all()
    # a 128-perm estimator stays within ~0.2 of the truth w.h.p.; the whole
    # point of the table is that this holds on real data
    assert (cal["est_permille"] - cal["exact_permille"]).abs().max() <= 200
    assert (cal["inter"] <= cal["uni"]).all() and (cal["uni"] > 0).all()
