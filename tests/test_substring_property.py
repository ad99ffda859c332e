"""Property test: the distributed substring-dedup stats equal a
brute-force sequential reference on arbitrary small corpora."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xtract.ops.vocab import sql_tokens

K = 3

# tiny alphabet → lots of genuine exact-window repetition
_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def brute_force(texts: list[str], k: int) -> dict[int, tuple[int, ...]]:
    """Sequential reference: windows by CONTENT (no hashing), canonical
    = min (doc_id, pos), interval merge of non-canonical positions."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    toks = {d: sql_tokens(t) for d, t in enumerate(texts)}
    for d, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p:p + k]), []).append((d, p))
    dups: dict[int, list[int]] = {}
    for positions in occ.values():
        if len(positions) > 1:
            for d, p in sorted(positions)[1:]:
                dups.setdefault(d, []).append(p)
    out = {}
    for d, ts in toks.items():
        ps = sorted(dups.get(d, []))
        covered = 0
        cur_s = cur_e = None
        for p in ps:
            if cur_e is None or p > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = p, p + k
            else:
                cur_e = p + k
        if cur_e is not None:
            covered += cur_e - cur_s
        out[d] = (len(ts), max(len(ts) - k + 1, 0), len(ps), covered)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus)
def test_substring_stats_match_brute_force(ray_session, texts):
    import ray.data as rd

    from xtract.ops.substring import substring_dedup_stats

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = {int(r.doc_id): (int(r.n_tokens), int(r.n_windows),
                           int(r.n_dup_windows), int(r.n_dup_tokens))
           for r in substring_dedup_stats(
               rd.from_arrow(t), k=K, num_partitions=4
           ).to_pandas().itertuples()}
    assert got == brute_force(texts, K)
