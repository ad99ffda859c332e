"""DSIR importance scores: target separation, partition invariance,
OOV bucket."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.dsir import dsir_scores


def _corpus():
    # target docs overuse "good"; raw background overuses "junk"
    rows = []
    for i in range(40):
        tgt = 1 if i % 4 == 0 else 0
        word = "good" if tgt else "junk"
        rows.append({"doc_id": i, "is_tgt": tgt,
                     "text": (word + " ") * 5 + "common filler text"})
    rows.append({"doc_id": 40, "is_tgt": 0, "text": ""})
    rows.append({"doc_id": 41, "is_tgt": 0, "text": "zebra zebra"})
    return rows


def _scores(blocks, vocab_size=50):
    ds = rd.from_items(_corpus())
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = dsir_scores(ds, "text", "is_tgt", "doc_id",
                      vocab_size=vocab_size).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_target_words_score_higher(ray_session):
    out = _scores(1)
    s = dict(zip(out["doc_id"], out["dsir_score"]))
    good_docs = [i for i in range(40) if i % 4 == 0]
    junk_docs = [i for i in range(40) if i % 4 != 0]
    assert min(s[i] for i in good_docs) > max(s[j] for j in junk_docs)
    assert s[40] == 0  # empty doc


def test_partition_invariance(ray_session):
    a = _scores(1)
    b = _scores(7)
    assert a.equals(b)


def test_oov_bucket_used(ray_session):
    # vocab_size=2 keeps only the two most frequent tokens; "zebra"
    # goes through the OOV weight and still gets a deterministic score
    out = _scores(1, vocab_size=2)
    z = int(out.loc[out["doc_id"] == 41, "dsir_score"].iloc[0])
    out2 = _scores(5, vocab_size=2)
    z2 = int(out2.loc[out2["doc_id"] == 41, "dsir_score"].iloc[0])
    assert z == z2 != 0
