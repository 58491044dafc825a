"""salted_join: the result multiset must be IDENTICAL to the unsalted join,
for any n_salts, any partition layout, under extreme hot-key skew; the salt
must actually spread hot keys over distinct composite join keys."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.joins import salted_join
from mix_blink_ray.stages.sketches import splitmix64


def _skewed_big(n=4000, hot_frac=0.9, seed=5):
    rng = np.random.default_rng(seed)
    # one ultra-hot key ("hot") with 90% of rows, tail spread over 20 keys
    hot = int(n * hot_frac)
    keys = np.concatenate(
        [np.full(hot, "hot"), np.array([f"k{i%20}" for i in range(n - hot)])]
    )
    rng.shuffle(keys)
    return pa.table(
        {
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "key": pa.array(keys.astype(object), pa.string()),
            "val": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )


def _dim():
    keys = ["hot"] + [f"k{i}" for i in range(20)]
    return pa.table(
        {
            "dkey": pa.array(keys, pa.string()),
            "w": pa.array(np.arange(len(keys), dtype=np.int64)),
        }
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("n_salts,parallelism", [(4, 3), (16, 9)])
def test_salted_join_parity_with_plain_join(ray_session, n_salts, parallelism):
    big = rd.from_arrow(_skewed_big()).repartition(parallelism)
    dim = rd.from_arrow(_dim())
    salted = salted_join(
        big, dim, on="key", right_on="dkey", salt_from="rid",
        n_salts=n_salts, num_partitions=8,
    ).to_pandas()
    plain = big.join(
        dim, join_type="inner", num_partitions=8, on=("key",), right_on=("dkey",)
    ).to_pandas()
    cols = ["rid", "key", "val", "w"]  # right key cols are consumed by the join
    pd.testing.assert_frame_equal(_norm(salted[cols]), _norm(plain[cols]))


def test_salt_spreads_hot_key(ray_session):
    big = _skewed_big()
    rid = big["rid"].to_numpy()
    hot_mask = np.asarray(big["key"]) == "hot"
    salts = (splitmix64(rid[hot_mask].view(np.uint64)) % np.uint64(8)).astype(np.int64)
    used = np.unique(salts)
    assert len(used) == 8, "hot key must fan out over every salt"
    # no salt bucket may carry more than ~2x its fair share of the hot key
    counts = np.bincount(salts, minlength=8)
    assert counts.max() <= 2 * hot_mask.sum() / 8


def test_salted_join_drops_helper_columns(ray_session):
    big = rd.from_arrow(_skewed_big(n=200))
    dim = rd.from_arrow(_dim())
    out = salted_join(
        big, dim, on="key", right_on="dkey", salt_from="rid", n_salts=4, num_partitions=4
    )
    cols = set(out.schema().names)
    assert "__salt" not in cols and "__rsalt" not in cols


def test_salted_join_rejects_same_key_names(ray_session):
    big = rd.from_arrow(_skewed_big(n=50))
    with pytest.raises(ValueError):
        salted_join(big, big, on="key", right_on="key", salt_from="rid")
