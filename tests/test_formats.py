"""ORC / Arrow-IPC source-sink roundtrips and idempotent rerun."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rd, n=500, blocks=5):
    return rd.from_arrow(pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64) % 7),
        "v": pa.array(np.arange(n, dtype=np.int64) * 3),
        "s": pa.array([f"row-{i}" for i in range(n)]),
    })).repartition(blocks)


@pytest.mark.parametrize("fmt", ["orc", "ipc"])
def test_roundtrip_and_idempotent_rerun(ray_session, tmp_path, fmt):
    import ray.data as rd

    from xtract.ops import formats

    write = getattr(formats, f"write_{fmt}")
    read = getattr(formats, f"read_{fmt}")
    out = str(tmp_path / fmt)
    man = write(_ds(rd), out).to_pandas()
    assert man.n_rows.sum() == 500
    files = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(files) == len(man)

    back = read(files).to_pandas().sort_values("v").reset_index(drop=True)
    assert back.drop(columns=["_source_file"]).v.sum() == 3 * 499 * 500 // 2
    assert set(back.columns) == {"k", "v", "s", "_source_file"}
    assert back.s[0] == "row-0"

    # rerun writes the SAME content-hash names — no duplicate files
    write(_ds(rd), out).to_pandas()
    assert sorted(glob.glob(os.path.join(out, "part-*"))) == files


def test_read_orc_column_pruning(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.formats import read_orc, write_orc

    out = str(tmp_path / "o")
    write_orc(_ds(rd, n=60, blocks=2), out).materialize()
    files = glob.glob(os.path.join(out, "part-*"))
    got = read_orc(files, columns=["k"]).to_pandas()
    assert set(got.columns) == {"k", "_source_file"}
    assert len(got) == 60
