"""make_fresh_data.py must stay schema-compatible with the driver's
testdata — the seed-robustness sweeps are only meaningful if a fresh
corpus is a drop-in replacement for every registered query."""

from __future__ import annotations

import subprocess
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def test_fresh_data_schema_parity(tmp_path):
    dest = tmp_path / "fresh"
    subprocess.run(
        [
            sys.executable,
            "scripts/make_fresh_data.py",
            "--seed", "99",
            "--sf", "0.001",
            "--dest", str(dest),
        ],
        check=True,
        cwd="/root/repo",
    )
    con = duckdb.connect()
    for t in TABLES:
        ref = con.execute(
            f"DESCRIBE SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        ).df()
        new = con.execute(f"DESCRIBE SELECT * FROM '{dest}/{t}.parquet'").df()
        assert list(ref.column_name) == list(new.column_name), t
        assert list(ref.column_type) == list(new.column_type), t
    # scaling + basic invariants
    n_doc = con.execute(f"SELECT count(*) FROM '{dest}/documents.parquet'").fetchone()[0]
    assert n_doc == 50  # 50_000 * 0.001
    bad = con.execute(
        f"SELECT count(*) FROM '{dest}/documents.parquet' WHERE n_chars <> len(text)"
    ).fetchone()[0]
    assert bad == 0
    dim = con.execute(
        f"SELECT min(len(embedding)), max(len(embedding)) FROM '{dest}/embeddings.parquet'"
    ).fetchone()
    assert dim == (64, 64)
    # deterministic: same seed regenerates identical bytes-level content
    dest2 = tmp_path / "fresh2"
    subprocess.run(
        [
            sys.executable,
            "scripts/make_fresh_data.py",
            "--seed", "99",
            "--sf", "0.001",
            "--dest", str(dest2),
        ],
        check=True,
        cwd="/root/repo",
    )
    for t in ("documents", "lineitem"):
        a = con.execute(f"SELECT * FROM '{dest}/{t}.parquet'").df()
        b = con.execute(f"SELECT * FROM '{dest2}/{t}.parquet'").df()
        assert a.equals(b), t
