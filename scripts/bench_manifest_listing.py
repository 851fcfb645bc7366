"""Listing-vs-manifest timing at 10k files (VERDICT r4 item 7).

The 100 TB posture claims the manifest path replaces per-file driver
opens in the metas header probe (`pipeline._scan_headers` vs
`pipeline.load_manifest`). This measures that claim at 10k synthetic
court-CSV headers on local disk and prints one JSON line.

Local disk flatters the listing path enormously — an open() here is
~10 us, while an object-store GET is ~10-100 ms — so the honest
headline is the RATIO shape, not the absolute: per-file cost scales
O(files) with a per-open constant that is 3-4 orders of magnitude
larger on S3/GCS, while the manifest is ONE sequential read of a
~1 MB catalog file regardless of store latency.

Usage: python scripts/bench_manifest_listing.py [n_files]
"""

from __future__ import annotations

import csv
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metas_judiciarias_etl_spark.metas import pipeline


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    root = tempfile.mkdtemp(prefix="manifest_bench_")
    try:
        header = "Sigla,julgados_2025,cn2025,dm2025,suspensos_2025"
        man_path = os.path.join(root, "manifest.csv")
        data_dir = os.path.join(root, "files")
        os.makedirs(data_dir)
        with open(man_path, "w", newline="") as mf:
            w = csv.writer(mf)
            w.writerow(["path", "header"])
            for i in range(n):
                p = os.path.join(data_dir, f"court_{i:05d}.csv")
                with open(p, "w") as fh:
                    fh.write(header + "\n")
                    fh.write(f"TRF{i % 6},{i},{i * 2},{i % 7},{i % 3}\n")
                w.writerow([p, header])
        man_bytes = os.path.getsize(man_path)

        t0 = time.perf_counter()
        scan_buckets = pipeline._scan_headers(data_dir)
        t_scan = time.perf_counter() - t0

        t0 = time.perf_counter()
        man_buckets = pipeline._bucket_entries(
            pipeline.load_manifest(man_path)
        )
        t_manifest = time.perf_counter() - t0

        assert {
            h: sorted(ps) for h, ps in scan_buckets.items()
        } == {h: sorted(ps) for h, ps in man_buckets.items()}, (
            "listing and manifest paths bucketed differently"
        )

        print(
            json.dumps(
                {
                    "metric": "manifest_vs_listing_10k",
                    "n_files": n,
                    "listing_sec": round(t_scan, 3),
                    "manifest_sec": round(t_manifest, 3),
                    "speedup": round(t_scan / t_manifest, 1),
                    "manifest_bytes": man_bytes,
                    "per_file_open_us": round(t_scan / n * 1e6, 1),
                    "note": (
                        "local-disk opens are ~1000x cheaper than object-"
                        "store GETs; at S3 latency the listing path is "
                        "O(files x RTT) while the manifest stays one read"
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
