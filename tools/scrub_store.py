"""Distributed Zarr store scrub CLI: verify every chunk object of a
store in parallel and print a summary + any bad objects.

Usage: PYTHONPATH=/root/repo python tools/scrub_store.py <store-path>
           [--cheap]    # existence/size only, skip decoding
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangeo_forge_recipes_spark.dsio import store_summary, verify_zarr
from pangeo_forge_recipes_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 1:
        print(__doc__)
        return 2
    path = args[0]
    cheap = "--cheap" in sys.argv
    spark = get_spark(app_name="scrub-store")
    try:
        summary = store_summary(path)
        print(
            f"store: {path} (zarr v{summary['zarr_format']}) — "
            f"{len(summary['arrays'])} arrays, {summary['n_objects']} "
            f"objects, {summary['stored_bytes'] / 1e6:.1f} MB stored / "
            f"{summary['logical_bytes'] / 1e6:.1f} MB logical"
        )
        rep = verify_zarr(spark, path, check_values=not cheap)
        bad = rep.filter("NOT ok").collect()
        n = rep.count()
        missing = rep.filter("NOT exists").count()
        print(
            f"scrubbed {n} chunk slots: {n - len(bad) - missing} ok, "
            f"{missing} unstored (fill), {len(bad)} BAD"
        )
        for r in bad[:50]:
            print(f"  BAD {r['chunk_key']}: {r['error']}")
        return 1 if bad else 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
