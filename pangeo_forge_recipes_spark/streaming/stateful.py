"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming engine (SURVEY §2.8); the charter's scale
surface calls for arbitrary per-key streaming state beyond built-in
windowed aggregation. The model operator here is day-gap sessionization —
the streaming face of the ``events_sessions`` batch query, carrying
``(last_date, n_sessions, n_events)`` per user across micro-batches so a
restarted or long-running stream keeps exact counts.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
_STATE_SCHEMA = "last_date string, n_sessions long, n_events long"


def stateful_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user session counting with persistent state: a new session starts
    on the first event or when the calendar date changes (identical
    semantics to the LAG-based batch query ``events_sessions``). Events
    must arrive date-ordered per user across micro-batches (file-arrival
    order in the manifest stream), matching the batch query's ordering.

    Emits one updated ``(user_id, n_sessions, n_events)`` row per user per
    micro-batch (output mode ``update``).
    """

    def fold(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, id_col])
        if state.exists:
            last_date, n_sessions, n_events = state.get
        else:
            last_date, n_sessions, n_events = None, 0, 0
        for d in rows[ts_col].dt.strftime("%Y-%m-%d"):
            if last_date is None or d != last_date:
                n_sessions += 1
            last_date = d
            n_events += 1
        state.update((last_date, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        _OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
    state_ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Streaming NEAR-duplicate flagging — the LSH analog of
    :func:`..streaming.append.streaming_dedup`'s exact dedup, for
    dedup-at-ingest against everything already seen.

    Each document's MinHash band buckets (same vectorized signature
    family as the batch ``operators.dedup.minhash_dedup``, so candidate
    semantics match) stream into a per-bucket stateful operator whose
    entire state is ONE long: the bucket's first-seen document id.
    Every later arrival that lands in an already-claimed bucket emits a
    ``(doc_id, first_doc_id, band)`` candidate row — cross-micro-batch,
    O(1) state per bucket, never the bucket's membership list (state is
    bounded by distinct buckets, i.e. ~corpus distinct-signature count,
    not corpus x bands arrivals). ``state_ttl_ms`` ages idle buckets out
    via a processing-time timeout (state eviction for infinite streams:
    an expired bucket forgets its representative, so a much-later
    near-dup re-admits — the standard bounded-memory tradeoff).

    Within one micro-batch, arrivals are ordered by id so the chosen
    representative is deterministic given the batch boundaries. A
    near-dup pair colliding in several bands emits several rows —
    ``dropDuplicates([id, first_id])`` downstream if one row per pair is
    wanted. Exactness: candidates are exactly the pairs sharing >= 1
    band bucket with the bucket's FIRST representative (the streaming
    subset of the batch LSH candidate graph — later-vs-later pairs in
    the same bucket are already represented through the shared
    representative for dedup purposes)."""
    from ..operators.dedup import minhash_band_hashes

    buckets = minhash_band_hashes(
        docs, text_col, id_col, num_perm, bands, shingle_n, seed
    )
    out_schema = f"{id_col} long, first_{id_col} long, band int"

    return buckets.groupBy("band", "band_hash").applyInPandasWithState(
        _minhash_flag_handler(id_col, state_ttl_ms),
        out_schema,
        "first long",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout,
    )


def streaming_domain_cap(
    docs: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    state_ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Streaming per-host admission cap — the ingest-time analog of
    ``operators.urls.domain_cap_sample``: at most ``cap`` documents per
    canonical host are admitted ACROSS micro-batches, everything after
    that is dropped at the door (the C4-style guard applied while the
    crawl is still arriving, instead of a post-hoc sample).

    State per host is ONE long (the running admit count) — bounded by
    distinct hosts, never their membership. Semantics differ from the
    batch operator deliberately: batch picks an md5-deterministic subset
    of the FULL corpus; streaming admits FIRST-ARRIVED (ascending id
    within a micro-batch, so results are deterministic given the batch
    boundaries) — the same first-seen convention as streaming_dedup and
    streaming_minhash_dedup. ``state_ttl_ms`` ages idle hosts out via a
    processing-time timeout (an expired host's admit count resets — a
    rolling-window cap rather than an all-time one). Output: the
    admitted ``(id, host)`` rows."""
    from ..operators.urls import host_expr

    keyed = docs.select(F.col(id_col), host_expr(url_col).alias("host"))
    out_schema = f"{id_col} long, host string"

    return keyed.groupBy("host").applyInPandasWithState(
        _domain_cap_fold_handler(cap, id_col, state_ttl_ms),
        out_schema,
        "n long",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout,
    )


def _minhash_flag_handler(id_col: str, state_ttl_ms: Optional[int]):
    """Handler factory for streaming_minhash_dedup — module-level so the
    TTL/eviction logic is unit-testable against the REAL closure."""

    def flag(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = int(state.get[0]) if state.exists else None
        # a big group arrives as SEVERAL Arrow chunks whose order follows
        # shuffle row order — collect ALL ids first, then sort once, or
        # the first-seen representative is the min of the FIRST chunk
        # only and the "arrivals ordered by id" determinism contract
        # breaks at chunk boundaries (same fix as _domain_cap_fold_handler)
        ids: list = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        ids.sort()
        dups = []
        for d in ids:
            if first is None:
                first = d
            elif d != first:
                dups.append(d)
        if first is not None:
            state.update((first,))
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
        if dups:
            yield pd.DataFrame(
                {
                    id_col: dups,
                    f"first_{id_col}": [first] * len(dups),
                    "band": [int(key[0])] * len(dups),
                }
            )

    return flag


def _domain_cap_fold_handler(cap: int, id_col: str, state_ttl_ms: Optional[int]):
    """Handler factory for streaming_domain_cap — module-level so the
    TTL/eviction logic is unit-testable against the REAL closure."""

    def fold(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = int(state.get[0]) if state.exists else 0
        # a big group arrives as SEVERAL Arrow chunks whose order follows
        # shuffle row order — collect ALL ids first, then sort, or the
        # "smallest ids win within a micro-batch" contract silently
        # depends on chunk boundaries
        ids: list = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        ids.sort()
        kept = ids[: max(cap - n, 0)]
        state.update((n + len(kept),))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if kept:
            yield pd.DataFrame({id_col: kept, "host": [key[0]] * len(kept)})

    return fold


def streaming_hamming_dedup(
    sigs: DataFrame,
    sig_col: str,
    id_col: str = "doc_id",
    bands: int = 8,
    state_ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Streaming near-duplicate flagging over ANY 64-bit signature
    column — the ingest-time face of ``operators.dedup.hamming_near_dup``
    and the cross-modal sibling of :func:`streaming_minhash_dedup`:
    feed it text SimHash (``dedup.simhash_signatures``), image pHash
    (``imagehash.image_phash``), or audio fingerprints
    (``audiohash.audio_fingerprint``) computed map-side on the stream.

    Identical state discipline: each signature's band values stream
    into a per-(band, band_val) stateful operator whose entire state is
    ONE long (the bucket's first-seen id); later arrivals in a claimed
    bucket emit ``(id, first_id, band)`` candidate rows cross-batch.
    Pigeonhole recall: two signatures within Hamming distance
    ``bands - 1`` share a band, so a true near-dup of an already-seen
    item always collides with SOME bucket — the first-seen
    representative convention then matches the batch star path.
    ``state_ttl_ms`` ages idle buckets out (bounded-memory eviction)."""
    from ..operators.dedup import banded_signature

    banded = banded_signature(sigs, sig_col, [id_col], bands)
    out_schema = f"{id_col} long, first_{id_col} long, band int"
    return banded.groupBy("band", "band_val").applyInPandasWithState(
        _minhash_flag_handler(id_col, state_ttl_ms),
        out_schema,
        "first long",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout,
    )
