"""pack_sequences (concat-and-chunk) + ngram_contamination invariants."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from multi_sensor_data_pipeline_for_robotics__spark.operators import dedup as D
from multi_sensor_data_pipeline_for_robotics__spark.operators.pack import (
    global_running_sum,
    pack_sequences,
)
from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import load_table


def test_global_running_sum_matches_pandas(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [5, 3, 1, 4, 2], "v": [10, 20, 30, 40, 50]})
    )
    got = (
        global_running_sum(df, "k", "v", "run", num_partitions=3)
        .orderBy("k")
        .toPandas()
    )
    # k-order pairs: (1,30) (2,50) (3,20) (4,40) (5,10)
    assert got["run"].tolist() == [30, 80, 100, 140, 150]
    assert set(got.columns) == {"k", "v", "run"}


def test_pack_sequences_invariants(spark, sf_dir):
    L = 64
    docs = load_table(spark, sf_dir, "documents")
    plan = pack_sequences(docs, seq_len=L).toPandas()
    n_total = int(
        docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    )

    # every token lands exactly once: per-doc slices reconstruct doc lengths
    per_doc = plan.groupby("doc_id")["n_toks"].sum()
    doc_lens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert per_doc.to_dict() == doc_lens

    # every sequence except the last is exactly L tokens; ids contiguous
    per_seq = plan.groupby("seq_id")["n_toks"].sum().sort_index()
    assert per_seq.index.tolist() == list(range(len(per_seq)))
    assert (per_seq.iloc[:-1] == L).all()
    assert per_seq.iloc[-1] == n_total - L * (len(per_seq) - 1)

    # slices are in-bounds and non-empty
    assert (plan["n_toks"] > 0).all()
    assert (plan["tok_from"] >= 0).all()


def test_pack_sequences_doc_spanning(spark):
    # 3 docs of 5 tokens, seq_len 4: doc 0 spans seqs 0-1, doc 1 spans
    # 1-2, doc 2 spans 2-3
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c d e"] * 3})
    )
    plan = (
        pack_sequences(docs, seq_len=4)
        .orderBy("seq_id", "doc_id")
        .toPandas()
    )
    rows = list(plan.itertuples(index=False, name=None))
    assert rows == [
        (0, 0, 0, 4),
        (1, 0, 4, 1),
        (1, 1, 0, 3),
        (2, 1, 3, 2),
        (2, 2, 0, 2),
        (3, 2, 2, 3),
    ]


def test_ngram_contamination_planted(spark):
    # eval doc 0 copies train doc 10 verbatim (fully contaminated);
    # eval doc 1 shares nothing 3-gram-sized with the train set
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11],
                "text": ["w x y z q r s", "m n o p"],
            }
        )
    )
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["w x y z q r s", "aa bb cc dd ee"],
            }
        )
    )
    got = (
        D.ngram_contamination(train, ev, n=3)
        .orderBy("doc_id")
        .toPandas()
    )
    assert got.loc[0, "contaminated_frac"] == 1.0
    assert got.loc[1, "n_contaminated"] == 0
    assert got.loc[1, "n_ngrams"] == 3


def test_pack_sequences_null_and_empty_text(spark):
    # NULL text must contribute 0 tokens (not F.size's -1) and emit no
    # spans; later docs' offsets stay correct
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c", None, "d e f"]})
    )
    plan = pack_sequences(docs, seq_len=4).orderBy("seq_id", "doc_id").toPandas()
    rows = list(plan.itertuples(index=False, name=None))
    # 6 tokens total: seq 0 = [a b c d], seq 1 = [e f]
    assert rows == [(0, 0, 0, 3), (0, 2, 0, 1), (1, 2, 1, 2)]
    assert 1 not in set(plan["doc_id"])


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=20),
    seq_len=st.integers(min_value=1, max_value=17),
)
def test_pack_sequences_conservation_property(lens, seq_len):
    from tests.test_asof_properties import _get_spark

    spark = _get_spark()
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(lens)),
                "text": [" ".join(["t"] * n) if n else None for n in lens],
            }
        )
    )
    plan = pack_sequences(docs, seq_len=seq_len).toPandas()
    total = sum(n if n else 0 for n in lens)
    # conservation: per-doc slices sum to doc length; seqs tile [0,total)
    per_doc = plan.groupby("doc_id")["n_toks"].sum().to_dict()
    assert per_doc == {i: n for i, n in enumerate(lens) if n > 0}
    if total:
        per_seq = plan.groupby("seq_id")["n_toks"].sum().sort_index()
        assert per_seq.index.tolist() == list(range((total + seq_len - 1) // seq_len))
        assert (per_seq.iloc[:-1] == seq_len).all()
        assert per_seq.iloc[-1] == total - seq_len * (len(per_seq) - 1)
