"""Fake MySQL DB-API driver for write_upsert tests.

Standalone module (shipped to executors with SparkContext.addPyFile) that
emulates a MySQL table with a declared primary key: records every
executemany call to per-commit JSON files and APPLIES the received
statement -- inserts on absent keys, and on duplicate keys overwrites
exactly the ``col = VALUES(col)`` pairs parsed from the ON DUPLICATE KEY
UPDATE clause, which is MySQL's actual conflict behavior.

Concurrency-faithful: statements are recorded per connection and REPLAYED
against the freshly loaded table under an exclusive file lock at
commit(), emulating InnoDB's row-level serialization of concurrent
upserts — concurrent partitions writing overlapping keys interleave
per-statement rather than clobbering each other's whole snapshot, so no
committed row is ever lost (only per-key last-writer order is
racy, exactly as on a real server)."""

from __future__ import annotations

import fcntl
import json
import os
import re
import uuid


def _apply(rows, key_cols, sql, batch):
    m = re.match(
        r"INSERT INTO (\w+) \(([^)]*)\) VALUES \(([^)]*)\)"
        r"(?: ON DUPLICATE KEY UPDATE (.*))?$",
        sql,
    )
    assert m, f"unparseable statement: {sql}"
    cols = [c.strip() for c in m.group(2).split(",")]
    assert len(cols) == m.group(3).count("?")
    updates = []
    if m.group(4):
        for pair in m.group(4).split(", "):
            pm = re.match(r"(\w+) = VALUES\((\w+)\)$", pair)
            assert pm and pm.group(1) == pm.group(2), pair
            updates.append(pm.group(1))
    for row in batch:
        vals = dict(zip(cols, row))
        key = tuple(vals[k] for k in key_cols)
        if key not in rows:
            rows[key] = vals
        elif updates:  # MySQL: only the UPDATE-clause columns change
            rows[key].update({c: vals[c] for c in updates})


class FakeCursor:
    def __init__(self, conn):
        self._conn = conn

    def executemany(self, sql, batch):
        self._conn.calls.append({"sql": sql, "n": len(batch)})
        self._conn.pending.append((sql, [tuple(r) for r in batch]))
        _apply(self._conn.rows, self._conn.key_cols, sql, batch)


class FakeMySQLConn:
    """One 'database' = one directory: state.json is the table, each
    commit also drops a calls-*.json record for the driver to read."""

    def __init__(self, db_dir, key_cols):
        self.db_dir = db_dir
        self.key_cols = key_cols
        self.calls = []
        self.pending = []
        self.rows = {}
        state = os.path.join(db_dir, "state.json")
        if os.path.exists(state):
            for vals in json.load(open(state)):
                self.rows[tuple(vals[k] for k in key_cols)] = vals

    def cursor(self):
        return FakeCursor(self)

    def commit(self):
        state = os.path.join(self.db_dir, "state.json")
        lock = os.path.join(self.db_dir, ".lock")
        with open(lock, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            rows = {}
            if os.path.exists(state):
                for vals in json.load(open(state)):
                    rows[tuple(vals[k] for k in self.key_cols)] = vals
            for sql, batch in self.pending:
                _apply(rows, self.key_cols, sql, batch)
            tmp = state + f".{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(list(rows.values()), f)
            os.replace(tmp, state)
        self.pending = []
        with open(
            os.path.join(self.db_dir, f"calls-{uuid.uuid4().hex}.json"), "w"
        ) as f:
            json.dump(self.calls, f)
        self.calls = []

    def close(self):
        pass


def connect(db_dir, key_cols):
    return FakeMySQLConn(db_dir, key_cols)


