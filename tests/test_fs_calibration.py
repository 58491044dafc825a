"""FS calibration table: consistency with the scorer's output and the
calibration claim itself (higher-weight pairs are empirically more often
matches, pooled over halves to dodge small-bucket noise)."""

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_sums_match_scorer_output(ray_session):
    cal = q.docs_fs_calibration(SF_DIR).to_pandas()
    fs = q.docs_fs_match_weights(SF_DIR).to_pandas()
    assert int(cal["n_pairs"].sum()) == len(fs)
    assert int(cal["n_matches"].sum()) == int(fs["is_match"].sum())
    assert len(cal) <= 8  # weights are a function of 3 agreement bits
    assert (cal["precision_permille"] == 1000 * cal["n_matches"] // cal["n_pairs"]).all()


def test_higher_weights_are_better_calibrated(ray_session):
    cal = q.docs_fs_calibration(SF_DIR).to_pandas().sort_values("weight_ppm").reset_index(drop=True)
    half = len(cal) // 2
    lo, hi = cal.iloc[:half], cal.iloc[half:]
    lo_prec = int(lo["n_matches"].sum()) / max(int(lo["n_pairs"].sum()), 1)
    hi_prec = int(hi["n_matches"].sum()) / max(int(hi["n_pairs"].sum()), 1)
    assert hi_prec > lo_prec
