"""WAL inspection CLI (reference: src/wal_inspector.rs).

Usage: python -m qdrant_tpu.tools.wal_inspect <wal-dir> [--from N] [--limit N]
Prints one JSON line per record: {"op_num": N, "operation": {...}}.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="wal_inspect")
    parser.add_argument("path", help="WAL directory (shard_dir/wal)")
    parser.add_argument("--from", dest="from_op", type=int, default=1)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    from ..storage.wal import Wal

    wal = Wal(args.path)
    count = 0
    for op_num, op in wal.read_from(args.from_op):
        print(json.dumps({"op_num": op_num, "operation": op}, default=str))
        count += 1
        if args.limit and count >= args.limit:
            break
    print(f"# {count} records, next_op_num={wal.next_op_num}", file=sys.stderr)
    wal.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
