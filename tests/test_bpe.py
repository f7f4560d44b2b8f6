"""BPE trainer/tokenizer (operators/bpe): the published Sennrich
algorithm — merge-order ground truth from the paper's own example,
parity with an independent reference implementation, determinism, and
the map-only plan shape."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pangeo_forge_recipes_spark.operators.bpe import (
    _END,
    tokenize_bpe,
    train_bpe,
    word_counts,
)


# --------------------------------------------------------------------------
# independent reference implementation (straight from the published
# algorithm description; no shared code with the operator)
# --------------------------------------------------------------------------


def _ref_train(word_freq, num_merges):
    vocab = {tuple(w) + (_END,): c for w, c in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best_cnt = max(pairs.values())
        if best_cnt < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_cnt)
        merges.append(best)
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def _ref_segment(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [_END]
    while len(syms) > 1:
        cands = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def _corpus_word_freq(rows):
    freq = Counter()
    for _, text in rows:
        for w in re.sub(r"[^A-Za-z0-9]+", " ", text).lower().split():
            freq[w] += 1
    return freq


_ROWS = [
    (1, "low low low low low"),
    (2, "lower lower"),
    (3, "newest newest newest newest newest newest"),
    (4, "widest widest widest"),
]


def test_paper_example_merge_order(spark):
    """The Sennrich et al. example dictionary {low:5, lower:2, newest:6,
    widest:3}: the first merges must combine (e,s) -> (es,t) -> est</w>,
    driven by the 'newest'+'widest' mass — published ground truth."""
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    merges = train_bpe(df, num_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", _END)
    # after 'est</w>', the next heaviest is 'l o' (low 5 + lower 2 = 7)
    assert merges[3] == ("l", "o")


def test_train_matches_independent_reference(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    got = train_bpe(df, num_merges=10)
    expect = _ref_train(_corpus_word_freq(_ROWS), 10)
    assert got == expect


def test_tokenize_matches_reference_segmentation(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    merges = train_bpe(df, num_merges=6)
    out = {r["doc_id"]: list(r["tokens"]) for r in tokenize_bpe(df, merges).collect()}
    for i, text in _ROWS:
        words = re.sub(r"[^A-Za-z0-9]+", " ", text).lower().split()
        expect = [t for w in words for t in _ref_segment(w, merges)]
        assert out[i] == expect
    # unseen words segment too (fall back toward characters)
    df2 = spark.createDataFrame([(9, "lowest")], "doc_id long, text string")
    toks = tokenize_bpe(df2, merges).collect()[0]["tokens"]
    assert "".join(toks) == "lowest" + _END


def test_word_counts_and_caps(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    wc = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    # max_words keeps the top by (count desc, word)
    merges = train_bpe(df, num_merges=3, max_words=1)  # only 'newest'
    assert merges[0] in (("e", "s"), ("n", "e"))  # only newest's pairs


def test_tokenize_plan_is_map_only(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    merges = train_bpe(df, num_merges=3)
    plan = (
        tokenize_bpe(df, merges)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_train_dictionary_is_bounded(spark):
    """The driver-collected dictionary never exceeds max_words no matter
    how many distinct words the corpus holds — and the DEFAULT is a
    bounded cap (web-scale vocabularies are effectively unbounded, so an
    uncapped collect is a driver OOM)."""
    import inspect

    assert (
        inspect.signature(train_bpe).parameters["max_words"].default
        == 1_000_000
    )
    # heavy head uses one alphabet, the distinct-word tail another: with
    # max_words=2 only head words may contribute merge symbols
    rows = [(1, " ".join(["aaaa"] * 50 + ["aabb"] * 40))] + [
        (i + 2, f"xy{chr(0x7A - i % 26)}q{i}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, num_merges=8, max_words=2)
    syms = {s for p in merges for s in p}
    assert syms  # head words do produce merges
    assert not any(c in s for s in syms for c in "xyq0123456789")
    # the cap plans as a TakeOrdered top-k, not a global sort — the
    # EXACT expression train_bpe builds ((desc cnt, asc word) tie-break)
    from pyspark.sql import functions as F

    capped = (
        word_counts(df)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in capped


def test_tokenize_cache_cap_preserves_output(spark):
    """A tiny cache_cap (forcing repeated clears) yields identical
    tokens — the cache is a bounded accelerator, never semantics."""
    rows = [(i, f"w{i}a w{i}b shared low lower") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, num_merges=6)
    base = {
        r["doc_id"]: list(r["tokens"])
        for r in tokenize_bpe(df, merges).collect()
    }
    tiny = {
        r["doc_id"]: list(r["tokens"])
        for r in tokenize_bpe(df, merges, cache_cap=2).collect()
    }
    assert base == tiny


def test_determinism_across_partitionings(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    a = train_bpe(df.repartition(1), num_merges=8)
    b = train_bpe(df.repartition(7), num_merges=8)
    assert a == b


def test_driver_oracle_replace_chain_equals_greedy_segmentation():
    """The driver oracle's replace-chain replay (each merge applied
    twice — one pass misses back-to-back occurrences whose delimiter
    space the previous match consumed, e.g. 'dining' with merge (i,n))
    must equal greedy-by-rank segmentation on an adversarial battery:
    repeated pairs, runs, and the full short-word space over the pinned
    merge alphabet. No Spark needed — DuckDB executes the oracle text."""
    import itertools

    import duckdb

    import __spark_entry__ as em
    from pangeo_forge_recipes_spark.operators.bpe import _segment

    ranks = {p: i for i, p in enumerate(em._BPE_MERGES)}
    words = [
        "dining", "mining", "wanderer", "ininining", "aaaaa", "ererer",
        "nnnnn", "lulu", "owowow", "ststst", "atatat", "inin", "erer",
        "stinower", "lowering", "flowerer", "ratatat", "inn", "eer",
    ]
    alpha = "inerowstalu"
    words += ["".join(c) for c in itertools.product(alpha, repeat=3)][:400]

    chain = (
        "concat(' ', array_to_string(list_transform("
        "range(1, length(w) + 1), i -> substr(w, i, 1)), ' '), ' </w> ')"
    )
    for a, b in em._BPE_MERGES:
        for _ in range(2):
            chain = f"replace({chain}, ' {a} {b} ', ' {a}{b} ')"
    con = duckdb.connect()
    con.execute("CREATE TABLE words(w VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?)", [(w,) for w in words])
    rows = con.execute(
        f"SELECT w, string_split(trim({chain}), ' ') FROM words"
    ).fetchall()
    assert len(rows) == len(words)
    for w, got in rows:
        assert got == _segment(w, ranks), w
