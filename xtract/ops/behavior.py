"""User-behavior analytics over event streams: funnel conversion and
cohort retention — the two aggregate shapes a crawl/product pipeline
runs on its interaction logs.

Both use the standard coarse hash co-group on the user key (one pandas
pass per partition, cython kernels inside), with the partitioning
assumption every keyed op here shares: one user's events fit in one
partition.  Every output is an exact integer count, so the DuckDB
oracles hash-match bit for bit.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .joins import _add_key_part


def funnel_counts(ds, key: str, ts_col: str, steps: "tuple[str, ...]",
                  type_col: str = "event_type", num_partitions: int = 32):
    """Greedy first-occurrence funnel: a user reaches step i+1 iff they
    have a ``steps[i+1]`` event STRICTLY after their step-i reach time
    (step-0 reach = first ``steps[0]`` event).  → (step, event_type,
    n_users), step 1-based, n_users monotonically non-increasing.

    Per partition: one filtered ``groupby(key).min`` per step (cython),
    each merged against the previous step's reach times — no per-user
    Python.  Partials are per-partition step counts; the final
    ``groupby(step)`` sums P slim rows."""
    from ray.data.aggregate import Sum

    steps = tuple(steps)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        reach: "pd.Series | None" = None
        counts = []
        for s in steps:
            ev = g.loc[g[type_col] == s, [key, ts_col]]
            if reach is not None:
                # plain column merge — a right_index merge would leak
                # the key as the result's index NAME and make the
                # groupby below ambiguous
                ev = ev.merge(reach, on=key)
                ev = ev[ev[ts_col] > ev["_r"]].drop(columns=["_r"])
            reach = (ev.groupby(key, sort=False)[ts_col].min()
                       .rename("_r").reset_index())
            counts.append(len(reach))
        return pd.DataFrame({"step": np.arange(1, len(steps) + 1,
                                               dtype=np.int64),
                             "event_type": list(steps),
                             "_n": np.asarray(counts, np.int64)})

    parts = (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                            batch_format="pyarrow")
               .groupby("_part")
               .map_groups(per_partition, batch_format="pandas"))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["step", "event_type", "n_users"])

    return (parts.groupby(["step", "event_type"])
                 .aggregate(Sum("_n", alias_name="n_users"))
                 .map_batches(rename, batch_format="pyarrow"))


def cohort_retention(ds, key: str, ts_col: str, num_partitions: int = 32):
    """Cohort retention matrix: users grouped by their FIRST active day
    (cohort), counted on each later active day by integer day offset.
    → (cohort_day 'YYYY-MM-DD', offset_days, n_users) — exact distinct
    user counts (a user's (day) activity dedups inside its partition,
    which holds ALL of that user's events).

    Per partition: ``groupby(key).min`` for the cohort day, one
    drop_duplicates for active (user, day) pairs, one vectorized date
    diff; partials summed by a final slim groupby."""
    from ray.data.aggregate import Sum

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        days = pd.Series(g[ts_col].to_numpy().astype("datetime64[D]"))
        df = pd.DataFrame({key: g[key].to_numpy(), "_day": days})
        first = (df.groupby(key, sort=False)["_day"].min()
                   .rename("_cohort").reset_index())
        act = df.drop_duplicates()
        act = act.merge(first, on=key)
        off = (act["_day"].to_numpy() - act["_cohort"].to_numpy()) \
            .astype("timedelta64[D]").astype(np.int64)
        out = pd.DataFrame({
            "cohort_day": act["_cohort"].dt.strftime("%Y-%m-%d"),
            "offset_days": off,
        }).groupby(["cohort_day", "offset_days"], sort=False) \
          .size().rename("_n").reset_index()
        return out

    parts = (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                            batch_format="pyarrow")
               .groupby("_part")
               .map_groups(per_partition, batch_format="pandas"))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cohort_day", "offset_days", "n_users"])

    return (parts.groupby(["cohort_day", "offset_days"])
                 .aggregate(Sum("_n", alias_name="n_users"))
                 .map_batches(rename, batch_format="pyarrow"))


def trend_per_key(ds, key: str, ts_col: str, value_col: str,
                  num_partitions: int = 32):
    """Per-key least-squares TREND of value-vs-time, kept EXACT: emits
    the slope's integer numerator ``n·Σxy − Σx·Σy`` and denominator
    ``n·Σx² − (Σx)²`` instead of a float quotient (the caller divides;
    the SQL oracle hash-matches both).  x = whole seconds since the
    key's FIRST event (non-negative → ``//`` floors identically in
    numpy and SQL), y = integer cents.
    → (key, n, slope_num, slope_den); slope_den = 0 ⇔ all events in
    the same second.

    One co-group pass: the per-key min-ts, the x/y encoding, and all
    five sums happen inside the partition that owns the key (cython
    groupby kernels) — only (key, 4 ints) rows leave."""
    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        us = pd.Series(g[ts_col].to_numpy().astype("datetime64[us]")
                       .astype(np.int64))
        keys = g[key].to_numpy()
        x = (us - us.groupby(keys, sort=False).transform("min")) \
            .to_numpy() // 1_000_000
        y = np.round(g[value_col].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({key: keys, "x": x, "y": y,
                           "xy": x * y, "xx": x * x})
        agg = df.groupby(key, sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum")).reset_index()
        n = agg["n"].to_numpy().astype(np.int64)
        sx = agg["sx"].to_numpy()
        return pd.DataFrame({
            key: agg[key],
            "n": n,
            "slope_num": n * agg["sxy"].to_numpy()
                - sx * agg["sy"].to_numpy(),
            "slope_den": n * agg["sxx"].to_numpy() - sx * sx,
        })

    from .joins import _add_key_part

    return (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                           batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pandas"))


def rfm_segments(ds, key: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value"):
    """RFM (recency / frequency / monetary) user segmentation — the
    classic event-log marketing cut, in a shape that never sorts or
    collects the user table:

    1. ONE native grouped aggregate → per-user (max ts µs, count,
       sum cents); materialized once (bounded by #users, spillable).
    2. Exact global QUARTILE thresholds of each metric via the
       histogram-refinement quantile engine (streaming passes over the
       user table, ≤n_bins rows per pass to the driver).
    3. One vectorized compare per batch: score = 1 + #thresholds
       strictly below the value (type-1 discrete boundaries — the
       SQL ``quantile_disc`` rule), so all three scores ∈ 1..4.

    → (key, r_us, f_n, m_cents, r_score, f_score, m_score, rfm)
    with ``rfm = 100·r + 10·f + m`` — all int64."""
    import ray
    from ray.data.aggregate import Count, Max, Sum

    from .quantiles import exact_quantiles_global

    def slim(b: pa.Table) -> pa.Table:
        ts = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(b[value_col].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return pa.table({key: b[key], "_ts_us": pa.array(ts),
                         "_cents": pa.array(cents)})

    ua = (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(key)
            .aggregate(Max("_ts_us", alias_name="r_us"),
                       Count(alias_name="f_n"),
                       Sum("_cents", alias_name="m_cents"))
            .materialize())
    qs = {"q25": 0.25, "q50": 0.50, "q75": 0.75}
    thresholds = {m: exact_quantiles_global(ua, m, qs)
                  for m in ("r_us", "f_n", "m_cents")}
    ref = ray.put(thresholds)

    def score(b: pa.Table) -> pa.Table:
        th = ray.get(ref)
        out = {key: b[key]}
        scores = {}
        for m, sname in (("r_us", "r_score"), ("f_n", "f_score"),
                         ("m_cents", "m_score")):
            v = b[m].to_numpy(zero_copy_only=False)
            s = np.ones(len(b), np.int64)
            for q in ("q25", "q50", "q75"):
                s += v > th[m][q]
            out[m] = b[m]
            scores[sname] = s
        for sname, s in scores.items():
            out[sname] = pa.array(s)
        out["rfm"] = pa.array(100 * scores["r_score"]
                              + 10 * scores["f_score"]
                              + scores["m_score"])
        return pa.table(out)

    return ua.map_batches(score, batch_format="pyarrow")


def association_rules(ds, key: str, item_col: str,
                      min_pair_users: int = 1,
                      max_items_per_key: int = 64):
    """Market-basket association mining over (key, item) events →
    one row per ORDERED item pair (a → b):
    ``(item_a, item_b, n_both, n_a, n_b, n_keys, conf_ppm,
    lift_ppm)`` with conf = P(b|a) = n_both/n_a and
    lift = conf / P(b) — all as exact integer ppm
    (``1_000_000 · n_both // n_a`` and
    ``1_000_000² · n_both · n_keys // (n_a · n_b) // 1`` computed in
    Python big-ints, so the oracle can replay it bit-exactly).

    Shape: ONE pass emits per-block DISTINCT (key, item) rows
    (np.unique combiner) → grouped distinct; item supports are a slim
    grouped Count; baskets co-group ONCE by key to emit ordered
    pairs (bounded by ``max_items_per_key`` — oversized baskets drop
    whole, the m² guard) → grouped pair Count; supports broadcast
    (item vocabulary is bounded).  ``n_keys`` is the distinct basket
    count (exact)."""
    import ray
    from ray.data.aggregate import Count

    from .agg import _hash_part  # noqa: F401 (co-group convention)

    def distinct_block(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "k": t[key].to_pylist(),
            "i": t[item_col].to_pylist()}).dropna().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    mem = (ds.select_columns([key, item_col])
           .map_batches(distinct_block, batch_format="pyarrow")
           .groupby(["k", "i"]).aggregate(Count(alias_name="_n"))
           .select_columns(["k", "i"]).materialize())

    n_keys = mem.groupby("k").aggregate(
        Count(alias_name="_c")).count()
    support = mem.groupby("i").aggregate(
        Count(alias_name="n")).to_pandas()
    sup = dict(zip(support["i"], support["n"].astype(int)))
    sup_ref = ray.put(sup)

    def pairs(g) -> pa.Table:
        import pandas as pd

        aa, bb = [], []
        for _, grp in g.groupby("k", sort=False):
            items = sorted(grp["i"].tolist())
            if len(items) < 2 or len(items) > max_items_per_key:
                continue
            for x in items:
                for y in items:
                    if x != y:
                        aa.append(x)
                        bb.append(y)
        return pd.DataFrame({"item_a": aa, "item_b": bb})

    pair_counts = (mem.groupby("k")
                   .map_groups(pairs, batch_format="pandas")
                   .groupby(["item_a", "item_b"])
                   .aggregate(Count(alias_name="n_both")))

    def finish(t: pa.Table, _s=sup_ref, _nk=n_keys) -> pa.Table:
        s = ray.get(_s)
        ia = t["item_a"].to_pylist()
        ib = t["item_b"].to_pylist()
        nb_ = t["n_both"].to_pylist()
        na = [s[x] for x in ia]
        nbv = [s[x] for x in ib]
        conf = [1_000_000 * c // a for c, a in zip(nb_, na)]
        lift = [1_000_000 * c * _nk // (a * b)
                for c, a, b in zip(nb_, na, nbv)]
        keep = [c >= min_pair_users for c in nb_]
        out = pa.table({
            "item_a": pa.array(ia, pa.string()),
            "item_b": pa.array(ib, pa.string()),
            "n_both": pa.array(nb_, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nbv, pa.int64()),
            "n_keys": pa.array([_nk] * len(ia), pa.int64()),
            "conf_ppm": pa.array(conf, pa.int64()),
            "lift_ppm": pa.array(lift, pa.int64())})
        return out.filter(pa.array(keep))

    return pair_counts.map_batches(finish, batch_format="pyarrow")


def decayed_counts(ds, key: str, ts_col: str, ref_ts_us: int,
                   value_col: "str | None" = None,
                   half_life_s: int = 86_400, age_cap: int = 30):
    """Exponential time-decay aggregate per key, EXACT-integer:
    each row weighs ``2^(age_cap − age)`` where
    ``age = min((ref − ts) // half_life, age_cap)`` — a freshest row
    weighs ``2^age_cap``, one half-life older weighs half, ages past
    the cap weigh 1 (never 0, so history is bounded but not erased).
    → (key, decayed:int64, n_rows:int64); ``decayed`` is in units of
    ``2^−age_cap · value`` (divide by ``2**age_cap`` for the decayed
    float if wanted — the op itself never touches floats, so results
    are bit-identical at any parallelism and SQL-replicable with the
    ``<<`` operator).  ``ref_ts_us`` is the caller's explicit
    reference instant (epoch µs) — never wall-clock.

    The crawl use: freshness-weighted host activity for recrawl
    priority.  Shape: one vectorized block combiner (shift + add) →
    one native grouped Sum."""
    from ray.data.aggregate import Count, Sum

    hl_us = int(half_life_s) * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        age = np.clip((ref_ts_us - ts) // hl_us, 0, age_cap)
        v = (pc.cast(t[value_col], pa.int64())
             .to_numpy(zero_copy_only=False)
             if value_col else np.ones(len(ts), np.int64))
        w = v << (age_cap - age).astype(np.int64)
        k = t[key].to_numpy(zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        cnt = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, w)
        np.add.at(cnt, inv, 1)
        return pa.table({key: pa.array(u),
                         "decayed": pa.array(acc, pa.int64()),
                         "n_rows": pa.array(cnt, pa.int64())})

    return (ds.select_columns(
        [key, ts_col] + ([value_col] if value_col else []))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key).aggregate(
            Sum("decayed", alias_name="decayed"),
            Sum("n_rows", alias_name="n_rows")))
