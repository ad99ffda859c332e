"""profile_dataset: one-pass per-column stats."""

import pyarrow as pa
import ray.data as rd

from xtract.ops.profile import profile_dataset


def test_profile_nulls_ranges_distinct(ray_session):
    t = pa.table({
        "i": pa.array([3, 1, None, 7, 1], pa.int64()),
        "s": pa.array(["b", None, "a", "c", "a"], pa.string()),
        "empty": pa.nulls(5, pa.float64()),
    })
    df = profile_dataset(rd.from_arrow(t).repartition(3), distinct=True) \
        .set_index("column")
    assert (df["n_rows"] == 5).all()
    assert df.loc["i", "n_nulls"] == 1
    assert df.loc["i", "min_val"] == "1" and df.loc["i", "max_val"] == "7"
    assert df.loc["s", "min_val"] == "a" and df.loc["s", "max_val"] == "c"
    assert df.loc["empty", "n_nulls"] == 5
    assert df.loc["empty", "min_val"] is None
    # null counts as its own distinct group (Arrow groupby semantics)
    assert df.loc["i", "n_distinct"] == 4   # {1, 3, 7, null}
    assert df.loc["s", "n_distinct"] == 4   # {a, b, c, null}
    assert df.loc["empty", "n_distinct"] == 1


def test_profile_partition_invariant(ray_session):
    t = pa.table({"x": pa.array(range(100), pa.int64())})
    a = profile_dataset(rd.from_arrow(t).repartition(2))
    b = profile_dataset(rd.from_arrow(t).repartition(17))
    assert a.equals(b)
