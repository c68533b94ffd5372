"""Round-8 tests: byte-level production BPE (VERDICT r7 ask #1), the
release_plan_caches serving-loop lifecycle (ask #5), and the other
round-8 operators/refinements."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


# ---------------------------------------------------------------------------
# Byte-level BPE (tx15/tx17)
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, docs: list[str]) -> str:
    import pandas as pd

    pdf = pd.DataFrame(
        [(i, t) for i, t in enumerate(docs)], columns=["doc_id", "text"]
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_tx15_spark_byte_level_non_ascii(spark, tmp_path):
    """The Spark trainer on a NON-ASCII corpus must equal the pure
    byte-level reference: multi-byte UTF-8 words (é=2 bytes, €=3,
    Greek=2/char) split into per-byte symbols and re-join via merges."""
    from tests.test_round6_ops import _hex_syms, _ref_bpe

    docs = [
        "café café crème",
        "€uro €uro zone",
        "σπάρκ engine σπάρκ",
        "café zone",
    ]
    sf = _write_docs(spark, tmp_path, docs)
    words: dict = {}
    for d in docs:
        for w in d.lower().split():
            words[w] = words.get(w, 0) + 1
    from apache_iceberg_spark.operators.text import TX15_MERGES

    want = sorted(_ref_bpe(words, TX15_MERGES))
    got = sorted(
        tuple(r)
        for r in REGISTRY["tx15_bpe_merges"].spark(spark, sf).collect()
    )
    assert got == want
    # byte-level sanity: the 2-hex symbols cover the multi-byte chars
    first_syms = {r[1] for r in got} | {r[2] for r in got}
    assert any(len(s) >= 2 and s >= "80" for s in first_syms if len(s) == 2), (
        "expected non-ASCII (>=0x80) byte symbols in the merge table"
    )


def test_tx15_distributed_branch_matches_driver_branch(spark, tmp_path):
    """Forcing the distributed per-round loop (gate=0) must produce the
    identical merge table as the driver incremental loop — the two
    branches of the TX15_DRIVER_VOCAB gate are interchangeable."""
    import apache_iceberg_spark.operators.text as tx

    docs = ["ab ab abc cafe café", "b c ab aaaa", "x aaaa café"]
    sf = _write_docs(spark, tmp_path, docs)
    driver, n_vocab = tx._tx15_train(spark, sf, n_merges=8)
    saved = tx.TX15_DRIVER_VOCAB
    tx.TX15_DRIVER_VOCAB = 0
    try:
        dist, n2 = tx._tx15_train(spark, sf, n_merges=8)
    finally:
        tx.TX15_DRIVER_VOCAB = saved
    assert n_vocab == n2 and n_vocab > 0
    assert driver == dist


def test_tx17_raises_on_degenerate_corpus(spark, tmp_path):
    """ADVICE r7: a corpus yielding fewer than TX15_MERGES merges must
    fail LOUDLY (the oracle's CROSS JOIN over an empty merge round would
    silently empty the result)."""
    sf = _write_docs(spark, tmp_path, ["x y", "x"])
    with pytest.raises(RuntimeError, match="merges"):
        REGISTRY["tx17_bpe_encode"].spark(spark, sf).collect()


def test_tx17_encode_accounting_non_ascii(spark, tmp_path):
    """tx17's per-doc accounting on a multi-byte corpus: n_sym_before is
    the UTF-8 BYTE count (not char count), and applying the learned
    merges by hand to each word reproduces n_sym_after."""
    import apache_iceberg_spark.operators.text as tx
    from tests.test_round6_ops import _hex_syms

    docs = ["café café crème zone", "€uro zone café", "σπάρκ σπάρκ"]
    sf = _write_docs(spark, tmp_path, docs)
    saved = tx.TX15_MERGES
    tx.TX15_MERGES = 6  # the tiny corpus supports only a few merges
    try:
        merges, _ = tx._tx15_train(spark, sf)

        def encode(word):
            syms = _hex_syms(word)
            for _r, a, b, _m, _c in merges:
                ns = []
                for t in syms:
                    if ns and ns[-1] == a and t == b:
                        ns[-1] = a + b
                    else:
                        ns.append(t)
                syms = ns
            return syms

        want = {}
        for i, d in enumerate(docs):
            ws = d.lower().split()
            before = sum(len(w.encode("utf-8")) for w in ws)
            after = sum(len(encode(w)) for w in ws)
            want[i] = (len(ws), before, after, before - after)
        got = {
            r["doc_id"]: (
                r["n_words"],
                r["n_sym_before"],
                r["n_sym_after"],
                r["n_merged"],
            )
            for r in REGISTRY["tx17_bpe_encode"].spark(spark, sf).collect()
        }
        assert got == want
    finally:
        tx.TX15_MERGES = saved


# ---------------------------------------------------------------------------
# release_plan_caches serving-loop lifecycle (VERDICT r7 ask #5)
# ---------------------------------------------------------------------------


def test_release_plan_caches_serving_loop(spark):
    """A long-running serving loop interleaving plan-cache operators with
    release_plan_caches must return the block manager to its baseline
    cached-frame count after EVERY release — the documented escape hatch
    of the persist-lifecycle convention, proven end-to-end rather than
    relied on (VERDICT r7 ask #5)."""
    from tests.conftest import SF_DIR

    from apache_iceberg_spark.session import release_plan_caches

    jsc = spark.sparkContext._jsc.sc()
    release_plan_caches(spark)  # start from a clean slate
    baseline = jsc.getPersistentRDDs().size()
    # Three plan-cache operators (similarity carries # plan-cache persist
    # sites) plus one plain query, back to back, as a serving loop would.
    for name in (
        "ann6_pq_adc",
        "ann9_ivf_pq",
        "dd15_incremental_dedup",
        "a2_groupby_count",
    ):
        REGISTRY[name].spark(spark, SF_DIR).count()
        release_plan_caches(spark)
        after = jsc.getPersistentRDDs().size()
        assert after == baseline, (
            f"{name}: {after - baseline} cached frames survived "
            "release_plan_caches"
        )
