"""Retrieval-corpus recipe: chunk documents to passage windows, embed
them (deterministic hashed-projection embedding — the honest stand-in
for a model encoder; the Spark plumbing is the real thing), build the
persisted IVF×PQ index once, then serve queries through partition-
pruned scans and verify the loop.

At 100 TB the shape is unchanged: chunking and embedding are map-only,
the index build is one pass + a partitioned write, and each query
reads O(nprobe/nlist) of the index bytes.
"""

import os
import shutil
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pangeo_forge_recipes_spark.operators.packing import chunk_documents
from pangeo_forge_recipes_spark.operators import similarity as sim
from pangeo_forge_recipes_spark.session import get_spark

DIM = 64


def embed(df, text_col="text", id_col="chunk_id"):
    """Deterministic hashed bag-of-words projection: token CRC32 picks a
    coordinate, sign from the next bit — the classic feature-hashing
    embedding (public: Weinberger et al. 2009). Map-only, Arrow-batched."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for t in pdf[text_col]:
                v = np.zeros(DIM, dtype=np.float64)
                for tok in (t or "").lower().split():
                    h = zlib.crc32(tok.encode("utf-8"))
                    v[h % DIM] += 1.0 if (h >> 16) & 1 else -1.0
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).astype("float32"))
            yield pd.DataFrame({"vec_id": pdf[id_col], "embedding": vecs})

    return df.mapInPandas(run, "vec_id long, embedding array<float>")


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="retrieval_index_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        raw_chunks = chunk_documents(docs, window=48, stride=40)
        # collision-free composite id: 2^20 chunks per doc headroom,
        # asserted (doc_id*1000 overflowed into the next doc's space
        # for any 1000-chunk document — review finding)
        assert raw_chunks.agg(F.max("chunk_id")).first()[0] < 1 << 20
        chunks = raw_chunks.select(
            (F.shiftleft(F.col("doc_id"), 20) + F.col("chunk_id")).alias(
                "chunk_id"
            ),
            F.col("chunk_text").alias("text"),
        )
        n_chunks = chunks.count()
        assert n_chunks >= docs.count()

        # cache: the index build makes several passes (pq sample,
        # centroids, encode) and each query call re-resolves the
        # lineage — without this the Python embed UDF re-runs 5+ times
        embedded = embed(chunks.select("chunk_id", "text")).cache()
        idx_path = os.path.join(work, "idx")
        meta = sim.build_ivf_pq_index(
            embedded, idx_path, n_centroids=16, m=8, nbits=6
        )
        assert meta["n_vectors"] == n_chunks

        # serve: a chunk queried against the index must retrieve ITSELF
        # among the top-3 at full probe (PQ reconstructions of highly
        # overlapping passages can tie, so top-1 is too strict a bar)
        queries = embedded.limit(25)
        hits = {}
        for r in sim.query_ivf_pq_index(
            spark, idx_path, queries, k=3, nprobe=16
        ).collect():
            hits.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        self_top = sum(1 for q, ns in hits.items() if q in ns)
        assert self_top >= 22, f"self-retrieval {self_top}/25"

        # pruned serving path: nprobe=2 of 16 lists
        pruned = sim.query_ivf_pq_index(spark, idx_path, queries, k=3, nprobe=2)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        n_rows = pruned.count()
        assert n_rows > 0
        print(
            f"retrieval_index OK: {n_chunks} chunks indexed "
            f"({meta['n_centroids']} lists), self-retrieval {self_top}/25, "
            f"pruned query returned {n_rows} rows"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
