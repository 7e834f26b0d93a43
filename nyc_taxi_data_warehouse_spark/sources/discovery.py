"""Source discovery — pluggable manifest of (path, year, month).

The reference discovers monthly files by scraping the TLC index page with
an XPath over hrefs (``/root/reference/data/airflow/dags/
save_nyc_data_to_s3.py:80-95``; bulk variant ``populate_s3.py:18-23``) and
derives S3 keys ``raw/fhvhv/{year}/fhvhv_tripdata_{year}-{month:02d}.parquet``
(``save_nyc_data_to_s3.py:36-48``). The scrape is network-bound and brittle,
so the engine models discovery as a pluggable callable that yields manifest
rows; the filesystem walker below is the offline stand-in with the same
filename convention.
"""

from __future__ import annotations

import os
import re

FHVHV_FILE_RE = re.compile(r"fhvhv_tripdata_(\d{4})-(\d{2})\.parquet$")


def discover_local(root: str) -> list[tuple[str, int, int]]:
    """Walk a directory tree for monthly FHVHV files → (path, year, month)."""
    manifest: list[tuple[str, int, int]] = []
    for dirpath, dirs, files in os.walk(root):
        # Spark writes a <name>.parquet *directory* of part files; a raw
        # TLC download is a single file. Accept both.
        for fname in sorted(files) + sorted(dirs):
            m = FHVHV_FILE_RE.search(fname)
            if m:
                manifest.append(
                    (os.path.join(dirpath, fname), int(m.group(1)), int(m.group(2)))
                )
    return sorted(manifest, key=lambda t: (t[1], t[2]))


def partition_key(year: int, month: int) -> str:
    """Raw-zone key convention (≙ save_nyc_data_to_s3.py:36-48)."""
    return f"raw/fhvhv/{year}/fhvhv_tripdata_{year}-{month:02d}.parquet"
