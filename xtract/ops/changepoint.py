"""Sequential changepoint detection — one-sided CUSUM per key.

The drift-monitoring primitive a crawl/feed pipeline needs: "did this
user's (host's, source's) value level shift upward?"  Page's CUSUM
statistic (Page 1954, public) over each key's event sequence ordered
by (ts, id):

    S_0 = 0;   S_i = max(0, S_{i-1} + (x_i - drift))

with an ALARM at the first i where S_i > threshold.  The recursion
looks inherently sequential, but it has a closed form over prefix
sums: with P_i = Σ_{j≤i} (x_j - drift) and P_0 = 0,

    S_i = P_i - min_{0≤j≤i} P_j

so one cumsum + one running-min per key computes the exact statistic
vectorized — the same rewrite the DuckDB oracle replays with window
functions (``SUM OVER`` / ``MIN OVER``).

Everything is exact int64 (values in cents), so results are
bit-identical at any parallelism and replayable in SQL.

Scale shape: ONE coarse hash co-group by key; per partition one
mergesort + grouped cumsum/cummin (all cython) — Python runs P times,
output is key-bounded.  Partitioning assumption: one key's events fit
in one partition (same contract as ``ops/joins.session_windows``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .joins import _add_key_part


def cusum_alarms(ds, key: str, ts_col: str, val_col: str,
                 id_col: str, drift: int, threshold: int,
                 num_partitions: int = 64):
    """Per-key one-sided CUSUM over int ``val_col`` (already scaled
    to exact integer units by the caller).

    → (key, n_events:int64, max_cusum:int64, alarm_id:int64) where
    ``alarm_id`` is the ``id_col`` of the FIRST event (by ts, id)
    whose statistic exceeds ``threshold``, or -1 when the key never
    alarms.  ``max_cusum`` is the running maximum of the statistic.
    """
    drift = int(drift)
    threshold = int(threshold)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        keys = g[key].to_numpy()
        x = g[val_col].to_numpy().astype(np.int64) - np.int64(drift)
        gb = pd.Series(x).groupby(keys, sort=False)
        p = gb.cumsum().to_numpy()
        runmin = pd.Series(p).groupby(keys, sort=False).cummin().to_numpy()
        s = p - np.minimum(runmin, 0)
        df = pd.DataFrame({
            key: keys,
            "_id": g[id_col].to_numpy().astype(np.int64),
            "_s": s,
        })
        agg = df.groupby(key, sort=False).agg(
            n_events=("_s", "size"), max_cusum=("_s", "max"))
        alarms = df[df["_s"] > threshold]
        # rows are already in (ts, id) order per key → first() is the
        # chronologically first alarm
        first = alarms.groupby(key, sort=False)["_id"].first()
        agg["alarm_id"] = first.reindex(agg.index).fillna(-1)
        out = agg.reset_index()
        return pd.DataFrame({
            key: out[key],
            "n_events": out["n_events"].astype("int64"),
            "max_cusum": out["max_cusum"].astype("int64"),
            "alarm_id": out["alarm_id"].astype("int64"),
        })

    return (ds.select_columns([key, ts_col, val_col, id_col])
            .map_batches(lambda b: _add_key_part(b, key, num_partitions),
                         batch_format="pyarrow")
            .groupby("_part")
            .map_groups(per_partition, batch_format="pandas"))
