"""Byte-pair encoding: a real BPE trainer and tokenizer over the
corpus, beyond the regex "BPE-ish" token counter in textexprs.

Method (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units"): train on a WORD-FREQUENCY dictionary —
repeatedly merge the most frequent adjacent symbol pair — then tokenize
by replaying the merges in order.

Spark-first shape at 100 TB:

* the corpus is touched ONCE: a map-side-combining word-count
  aggregation produces the distinct-word frequency table (bounded by
  vocabulary size, not corpus size; ``min_freq``/``max_words`` cap it
  further — exactly how reference BPE implementations train);
* the merge loop runs driver-side over that bounded dictionary with an
  incrementally maintained pair-count index (the published algorithm);
  deterministic tie-break (count desc, pair lexicographic) makes the
  learned merges reproducible across runs and partitionings;
* tokenization is MAP-ONLY: the merge ranks broadcast, each Arrow batch
  greedily merges per word with a per-batch word cache (words repeat
  heavily, so the cache hit rate is the type/token ratio).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"  # end-of-word marker (the published convention)

_TOKENIZE = (
    "filter(split(lower(regexp_replace({col}, '[^A-Za-z0-9]+', ' ')), ' '), "
    "x -> x != '')"
)


def word_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — one explode + one map-side-combining
    aggregation; the result is vocabulary-sized."""
    return (
        df.select(F.explode(F.expr(_TOKENIZE.format(col=col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _pairs(symbols: Tuple[str, ...]) -> Iterator[Tuple[str, str]]:
    return zip(symbols, symbols[1:])


def train_bpe(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 100,
    min_freq: int = 1,
    max_words: Optional[int] = 1_000_000,
) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    One distributed pass builds the word-frequency dictionary
    (``min_freq`` floor; ``max_words`` keeps the top words by
    (count desc, word) — both standard dictionary caps); the merge loop
    is driver-side over that bounded table with an incrementally
    updated pair index. Returns the ordered merge list.

    ``max_words`` bounds the driver's collected dictionary and defaults
    to 1,000,000 (standard BPE trainer practice): on web-scale text the
    distinct-"word" count is effectively unbounded (URLs, typos, unicode
    junk), so an uncapped collect would be a driver OOM. Pass ``None``
    explicitly only for corpora whose vocabulary is known to be small.
    The cap plans as a TakeOrdered (top-k, no global sort)."""
    wc = word_counts(df, col).filter(F.col("cnt") >= min_freq)
    if max_words is not None:
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(max_words)
    vocab: Dict[Tuple[str, ...], int] = {
        tuple(r["word"]) + (_END,): int(r["cnt"]) for r in wc.collect()
    }

    pair_counts: Dict[Tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for p in _pairs(syms):
            pair_counts[p] = pair_counts.get(p, 0) + cnt

    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        best_cnt = max(pair_counts.values())
        if best_cnt < max(min_freq, 2):
            break
        best_pair = min(p for p, c in pair_counts.items() if c == best_cnt)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: Dict[Tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            if best_pair not in set(_pairs(syms)):
                new_vocab[syms] = new_vocab.get(syms, 0) + cnt
                continue
            # apply the merge and update the pair index incrementally
            for p in _pairs(syms):
                pair_counts[p] -= cnt
            out: List[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best_pair
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
            for p in _pairs(t):
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        vocab = new_vocab
        pair_counts = {p: c for p, c in pair_counts.items() if c > 0}
    return merges


def _segment(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


_TOKENIZE_CACHE_CAP = 262_144  # distinct words cached per task


def tokenize_bpe(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    col: str = "text",
    id_col: str = "doc_id",
    cache_cap: int = _TOKENIZE_CACHE_CAP,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — map-only: the merge ranks
    broadcast, each Arrow batch segments its words with a per-task
    word cache (types repeat across tokens). The cache is bounded at
    ``cache_cap`` distinct words (it is cleared when full — the Zipfian
    head that carries the hit rate repopulates in one batch, so the
    reset costs little while keeping task memory O(cache_cap))."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})
    tokenized = df.select(
        id_col, F.expr(_TOKENIZE.format(col=col)).alias("__words")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        cache: Dict[str, List[str]] = {}
        for pdf in batches:
            toks_out = []
            for words in pdf["__words"]:
                toks: List[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = _segment(w, ranks)
                        if len(cache) >= cache_cap:
                            cache.clear()
                        cache[w] = got
                    toks.extend(got)
                toks_out.append(toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks_out,
                    "n_tokens": [len(t) for t in toks_out],
                }
            )

    return tokenized.mapInPandas(
        run, f"{id_col} long, tokens array<string>, n_tokens long"
    )


__all__ = ["word_counts", "train_bpe", "tokenize_bpe"]
