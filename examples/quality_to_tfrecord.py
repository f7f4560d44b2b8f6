"""Train a learned quality filter, gate a corpus with it alongside the
heuristic rules, dedup near-identical images, and ship the survivors as
TFRecord shards — the end-to-end 'prepare a training slice' recipe.

Pipeline: labeled seeds → fastText-shaped classifier (distributed
gradient reduction) → score + threshold the corpus (zero-shuffle
broadcast UDF) → pHash near-dup collapse on attached image media →
TFRecord shards (deterministic bytes, sha256 manifest) → read back and
verify the loop closes.
"""

import glob
import os
import shutil
import tempfile

from pangeo_forge_recipes_spark.operators import classifier as clf
from pangeo_forge_recipes_spark.operators import imagehash, multimodal
from pangeo_forge_recipes_spark.session import get_spark
from pangeo_forge_recipes_spark.sources import read_tfrecord, write_tfrecord_shards

GOOD = [
    "the committee published a detailed annual report on water quality",
    "researchers measured rainfall across the river basin for a decade",
    "engineers reviewed the bridge design before construction began",
    "students presented their findings at the regional science fair",
    "the museum restored a collection of nineteenth century paintings",
    "farmers rotated crops to preserve the soil for future seasons",
]
BAD = [
    "click here buy now cheap cheap cheap best price click click",
    "zzz qqq xxx win win win free free casino casino jackpot",
    "buy viagra buy viagra buy viagra discount discount discount",
    "subscribe subscribe like like like share share share now",
    "!!! ??? $$$ ### @@@ %%% ^^^ &&& *** ((( ))) ~~~",
    "qwerty asdf zxcv uiop hjkl vbnm qwer tyui asdf lkjh",
]


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="quality_tfrecord_")
    try:
        labeled = spark.createDataFrame(
            [(t, 1.0) for t in GOOD] + [(t, 0.0) for t in BAD],
            "text string, label double",
        )
        model = clf.train_quality_classifier(labeled, dim=1 << 14, epochs=15)
        assert model["loss_history"][-1] < model["loss_history"][0]

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        kept = clf.classifier_filter(docs, model, threshold=0.3).select(
            "doc_id", "text", "n_chars"
        )
        n_kept = kept.count()
        assert 0 < n_kept <= docs.count()

        # image near-dup collapse: attach PNG media; width keyed on
        # doc_id % 3 so thirds of the corpus render IDENTICAL images
        # within each (doc_id mod pattern) family at the pHash level
        # one deterministic, materialized sample: two independent
        # unordered limit(60) scans could select different subsets and
        # the join would silently shrink (review finding)
        sample = kept.orderBy("doc_id").limit(60).cache()
        media = multimodal.attach_png_media(sample)
        with_media = sample.join(media, "doc_id").select("doc_id", "media")
        reps = imagehash.phash_dedup_representatives(with_media, max_hamming=2)
        n_clusters = reps.select("rep").distinct().count()
        assert 0 < n_clusters <= 60

        out = os.path.join(work, "shards")
        manifest = write_tfrecord_shards(
            kept, out, n_shards=3, meta_cols=["n_chars"]
        ).collect()
        assert sum(m["n_docs"] for m in manifest) == n_kept
        assert len(glob.glob(os.path.join(out, "*.tfrecord"))) == 3

        back = read_tfrecord(
            spark, out, {"doc_id": "int64", "text": "string", "n_chars": "int64"}
        )
        got = {r["doc_id"]: (r["text"], r["n_chars"]) for r in back.collect()}
        want = {r["doc_id"]: (r["text"], r["n_chars"]) for r in kept.collect()}
        assert got == want, "tfrecord roundtrip mismatch"
        print(
            f"quality_to_tfrecord OK: kept {n_kept} docs, "
            f"{n_clusters} image clusters of 60, "
            f"{len(manifest)} shards verified"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
