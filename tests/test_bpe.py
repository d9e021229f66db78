"""BPE merge training / application vs a pure-Python reference
implementation (same greedy rule, same tie-break) — the differential
oracle for operators/bpe.py, plus contract tests (early stop,
losslessness, per-doc assembly)."""

from __future__ import annotations

import collections
import re

import pytest

from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators import bpe as B


def _ref_bpe(texts, k):
    """Reference BPE: word-frequency table, greedy (count desc, left
    asc, right asc) merges, left-to-right overlap rule."""
    freq: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+|[^a-z0-9\s]", t.lower()):
            freq[w] += 1
    seg = {w: list(w) for w in freq}
    merges = []
    for rnd in range(1, k + 1):
        pc: collections.Counter = collections.Counter()
        for w, f in freq.items():
            s = seg[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, left, right, cnt))
        for w, s in seg.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seg[w] = out
    return merges, seg, freq


TEXTS = [
    "the cat sat on the mat",
    "the cats sat, the cats sat!",
    "a banana and a bandana",
    "lower lowest newer newest",
    "the newest banana mat",
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    want_merges, want_seg, _ = _ref_bpe(TEXTS, 12)
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in B.bpe_train_merges(docs, k=12).orderBy("round").collect()
    ]
    assert got == want_merges
    # applying the learned merges reproduces the training segmentation
    vocab = spark.createDataFrame(
        [(w,) for w in want_seg], "word string"
    )
    merges_df = B.bpe_train_merges(docs, k=12)
    seg = {
        r["word"]: list(r["pieces"])
        for r in B.bpe_segment_words(vocab, merges_df).collect()
    }
    assert seg == want_seg
    # losslessness: pieces concatenate back to the word
    assert all("".join(p) == w for w, p in seg.items())


def test_bpe_train_early_stop_and_validation(spark):
    # two distinct 2-char words -> at most 2 merges possible, then every
    # word is one symbol and training must stop early
    docs = spark.createDataFrame(
        [(0, "ab ab cd")], "doc_id long, text string"
    )
    merges = B.bpe_train_merges(docs, k=10).collect()
    assert len(merges) == 2
    assert {(m["left"], m["right"]) for m in merges} == {("a", "b"), ("c", "d")}
    assert [m["round"] for m in sorted(merges, key=lambda m: m["round"])] == [1, 2]
    with pytest.raises(ValueError, match="k must be"):
        B.bpe_train_merges(docs, k=0)


def test_bpe_apply_assembles_docs_in_order(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    want_merges, want_seg, _ = _ref_bpe(TEXTS, 8)
    merges = [
        {"round": r, "left": l, "right": rr, "pair_count": c}
        for (r, l, rr, c) in want_merges
    ]
    got = {
        r["doc_id"]: r for r in B.bpe_apply(docs, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        words = re.findall(r"[a-z0-9]+|[^a-z0-9\s]", t.lower())
        pieces = [p for w in words for p in want_seg[w]]
        assert got[i]["n_words"] == len(words)
        assert got[i]["n_pieces"] == len(pieces)
        assert got[i]["pieces"] == "|".join(pieces)


def test_bpe_segment_map_matches_apply_and_streams(spark, tmp_path):
    """The stateless mapInPandas twin emits rows bit-identical to
    bpe_apply (same pre-split, merge order, assembly, zero-token drop)
    and runs unchanged on a readStream in append mode."""
    texts = TEXTS + ["", "   "]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = B.bpe_train_merges(docs, k=6)
    want = {tuple(r) for r in B.bpe_apply(docs, merges).collect()}
    got = {tuple(r) for r in B.bpe_segment_map(docs, merges).collect()}
    assert got == want and len(got) == len(TEXTS)  # blank docs dropped

    src = str(tmp_path / "bpe_docs")
    docs.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    from multi_sensor_data_pipeline_for_robotics__spark.streaming.sync_stream import (
        run_to_memory,
    )

    run_to_memory(
        B.bpe_segment_map(stream, merges), "bpe_stream_tbl", output_mode="append"
    )
    streamed = {tuple(r) for r in spark.table("bpe_stream_tbl").collect()}
    assert streamed == want


def test_bpe_overlap_rule_is_greedy_left_to_right(spark):
    # "aaaa" with merge (a, a): greedy -> [aa, aa]; "aaa" -> [aa, a]
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaa")], "doc_id long, text string"
    )
    merges = B.bpe_train_merges(docs, k=1)
    m = merges.first()
    assert (m["left"], m["right"]) == ("a", "a")
    # pair_count counts overlapping adjacencies: 3+3+2 per doc word
    assert m["pair_count"] == 2 * 3 + 2
    seg = {
        r["word"]: list(r["pieces"])
        for r in B.bpe_segment_words(
            spark.createDataFrame([("aaaa",), ("aaa",)], "word string"),
            merges,
        ).collect()
    }
    assert seg == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}
