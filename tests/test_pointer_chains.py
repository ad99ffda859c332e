"""Pointer-doubling chain resolution: logarithmic-round convergence
and exactness on chains far longer than any fixed BFS round count."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _state_from_ptr(ptr: np.ndarray):
    import ray.data as rd

    d = np.arange(len(ptr), dtype=np.int64)
    is_src = ptr != d
    return rd.from_arrow(pa.table({
        "d": pa.array(d, pa.int64()),
        "ptr": pa.array(ptr, pa.int64()),
        "hops": pa.array(is_src.astype(np.int64), pa.int64()),
        "src": pa.array(is_src.astype(np.int64), pa.int64())}))


def test_long_chain_resolves_in_log_rounds(ray_session):
    """A single 5000-hop chain: node i -> i-1, node 0 terminal.  A
    fixed-round BFS would need 5000 all-to-alls; doubling needs
    ceil(log2(5000)) = 13.  max_rounds=20 both proves convergence is
    logarithmic and guards the budget."""
    from xtract.ops.graph import resolve_pointer_chains

    n = 5000
    ptr = np.arange(-1, n - 1, dtype=np.int64)
    ptr[0] = 0
    out = resolve_pointer_chains(_state_from_ptr(ptr), partitions=8,
                                 max_rounds=20).to_pandas()
    out = out.sort_values("d").reset_index(drop=True)
    assert (out["ptr"] == 0).all()
    assert (out["hops"].to_numpy() == np.arange(n)).all()


def test_forest_of_chains_and_self_loops(ray_session):
    """Mixed forest: several chains of different lengths plus isolated
    terminals — every node must land on its own chain's terminal with
    the exact hop count."""
    from xtract.ops.graph import resolve_pointer_chains

    # chain A: 14..1 -> 0 ; chain B: 20..16 -> 15 ; terminals 21, 22
    ptr = np.arange(-1, 22, dtype=np.int64)  # ptr[i] = i - 1
    for t in (0, 15, 21, 22):
        ptr[t] = t
    out = (resolve_pointer_chains(_state_from_ptr(ptr), partitions=4)
           .to_pandas().sort_values("d").reset_index(drop=True))
    f = out["ptr"].to_numpy()
    h = out["hops"].to_numpy()
    assert (f[:15] == 0).all() and (h[:15] == np.arange(15)).all()
    assert (f[15:21] == 15).all() and (h[15:21] == np.arange(6)).all()
    assert f[21] == 21 and h[21] == 0 and f[22] == 22 and h[22] == 0


def test_redirect_query_matches_closed_form(ray_session):
    """The planted-fixture query end-to-end at sf0.001."""
    import __ray_entry__ as E

    out = E.queries()["url_redirect_chains"]("/root/testdata/sf0.001")
    assert (out["final_doc"] == out["doc_id"] - out["doc_id"] % 8).all()
    assert (out["hops"] == out["doc_id"] % 8).all()


def test_redirect_cycle_fails_loud(ray_session):
    """A 3-cycle (0→1→2→0) has no terminal: the doubling loop can
    never finish — it must RAISE naming the cycle cause, never return
    half-doubled pointers (round 4)."""
    import pytest

    from xtract.ops.graph import resolve_pointer_chains

    ptr = np.array([1, 2, 0, 3], np.int64)  # 3-cycle + one terminal
    with pytest.raises(RuntimeError, match="cycle"):
        resolve_pointer_chains(_state_from_ptr(ptr), partitions=2,
                               max_rounds=6)
