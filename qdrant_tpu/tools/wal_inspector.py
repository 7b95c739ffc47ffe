"""Inspect a WAL directory: `python -m qdrant_tpu.tools.wal_inspector
<wal_dir> [collection|raft]` (reference: src/wal_inspector.rs — prints
every operation with its number; raft mode prints consensus entries)."""

from __future__ import annotations

import json
import sys


def print_collection_wal(path: str) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ..storage.wal import Wal

    wal = Wal(path)
    first = None
    count = 0
    last = 0
    for op_num, op in wal.read_from(0):
        if first is None:
            first = op_num
        last = op_num
        count += 1
        summary = {k: v for k, v in op.items() if k != "points"}
        if "points" in op:
            summary["points"] = f"<{len(op['points'])} points>"
        print(f"op #{op_num}: {json.dumps(summary, default=str)}")
    print("==========================")
    print(f"entries: {count} (first: {first}, last: {last})")
    print(f"next op num: {wal.next_op_num}")
    return 0


def print_raft_wal(path: str) -> int:
    import os

    import msgpack

    state_file = os.path.join(path, "raft_state.json")
    log_file = os.path.join(path, "raft_log.msgpack")
    if os.path.exists(state_file):
        with open(state_file) as f:
            print(f"state: {f.read().strip()}")
    if os.path.exists(log_file):
        with open(log_file, "rb") as f:
            entries = msgpack.unpackb(f.read(), raw=False)
        for e in entries:
            print(f"entry #{e['index']} (term {e['term']}): "
                  f"{json.dumps(e['operation'], default=str)}")
        print("==========================")
        print(f"entries: {len(entries)}")
    return 0


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m qdrant_tpu.tools.wal_inspector <wal_dir> "
              "[collection|raft]", file=sys.stderr)
        return 2
    path = argv[0]
    kind = argv[1] if len(argv) > 1 else "collection"
    if kind == "collection":
        return print_collection_wal(path)
    if kind == "raft":
        return print_raft_wal(path)
    print(f"unknown wal type: {kind}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
