import os

import pytest

from qdrant_tpu.storage.wal import NativeWal, Wal, open_wal


def _roundtrip(wal_cls, path):
    wal = wal_cls(str(path), segment_capacity=256)  # tiny → multiple segments
    ops = [{"type": "upsert", "points": [{"id": i, "v": [float(i)] * 8}]} for i in range(20)]
    nums = [wal.append(op) for op in ops]
    assert nums == list(range(1, 21))
    wal.sync()
    got = list(wal.read_from(1))
    assert [n for n, _ in got] == nums
    assert got[5][1] == ops[5]
    # partial replay
    tail = list(wal.read_from(15))
    assert [n for n, _ in tail] == list(range(15, 21))
    wal.close()
    return nums


def test_python_wal_roundtrip(tmp_path):
    _roundtrip(Wal, tmp_path / "w")


def test_python_wal_recovery_and_ack(tmp_path):
    path = str(tmp_path / "w")
    wal = Wal(path, segment_capacity=128)
    for i in range(30):
        wal.append({"i": i})
    wal.close()
    wal2 = Wal(path, segment_capacity=128)
    assert wal2.next_op_num == 31
    assert len(list(wal2.read_from(1))) == 30
    wal2.ack(25)
    remaining = list(wal2.read_from(1))
    assert remaining[-1][0] == 30
    assert all(n <= 30 for n, _ in remaining)
    wal2.close()


def test_python_wal_torn_tail(tmp_path):
    path = str(tmp_path / "w")
    wal = Wal(path)
    for i in range(5):
        wal.append({"i": i})
    wal.close()
    # corrupt the tail
    files = [f for f in os.listdir(path) if f.endswith(".log")]
    with open(os.path.join(path, files[0]), "ab") as f:
        f.write(b"\x10\x00\x00\x00garbage")
    wal2 = Wal(path)
    assert wal2.next_op_num == 6  # torn record dropped
    assert len(list(wal2.read_from(1))) == 5
    wal2.close()


def _native_available():
    from qdrant_tpu.native import load

    return load() is not None


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
def test_native_wal_roundtrip(tmp_path):
    _roundtrip(NativeWal, tmp_path / "w")


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
def test_native_python_interop(tmp_path):
    """Same on-disk format: write native, read python — and vice versa."""
    path = str(tmp_path / "w")
    nwal = NativeWal(path)
    for i in range(10):
        nwal.append({"n": i})
    nwal.sync()
    nwal.close()

    pwal = Wal(path)
    got = list(pwal.read_from(1))
    assert [op["n"] for _, op in got] == list(range(10))
    for i in range(10, 15):
        pwal.append({"n": i})
    pwal.close()

    nwal2 = NativeWal(path)
    assert nwal2.next_op_num == 16
    got = list(nwal2.read_from(8))
    assert [op["n"] for _, op in got] == list(range(7, 15))
    nwal2.close()


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
def test_open_wal_picks_native(tmp_path):
    wal = open_wal(str(tmp_path / "w"))
    assert isinstance(wal, NativeWal)
    wal.close()


def test_wal_pop_last(tmp_path):
    """pop_last drops exactly the tail record, across segment boundaries,
    down to empty (reference: src/wal_pop.rs poisoned-entry repair)."""
    from qdrant_tpu.storage.wal import Wal

    # tiny capacity forces one segment per few records
    wal = Wal(str(tmp_path / "w"), segment_capacity=64)
    for i in range(7):
        wal.append({"op": i})
    assert wal.pop_last() == 7
    assert wal.next_op_num == 7
    # remaining records intact and re-readable after reopen
    wal.close()
    wal2 = Wal(str(tmp_path / "w"), segment_capacity=64)
    ops = [op["op"] for _, op in wal2.read_from(1)]
    assert ops == [0, 1, 2, 3, 4, 5]
    # appending after a pop reuses the freed op number
    assert wal2.append({"op": "new"}) == 7
    # pop everything
    for _ in range(7):
        assert wal2.pop_last() is not None
    assert wal2.pop_last() is None
    assert wal2.next_op_num == 1


def test_wal_pop_tool(tmp_path, capsys):
    from qdrant_tpu.storage.wal import Wal
    from qdrant_tpu.tools import wal_pop

    wal = Wal(str(tmp_path / "w"))
    wal.append({"a": 1})
    wal.append({"a": 2})
    wal.close()
    assert wal_pop.main([str(tmp_path / "w")]) == 0
    wal2 = Wal(str(tmp_path / "w"))
    assert [op for _, op in wal2.read_from(1)] == [{"a": 1}]

    # raft mode
    import msgpack

    entries = [{"term": 1, "index": 1, "operation": {}},
               {"term": 1, "index": 2, "operation": {}}]
    (tmp_path / "raft_log.msgpack").write_bytes(
        msgpack.packb(entries, use_bin_type=True)
    )
    assert wal_pop.main([str(tmp_path), "raft"]) == 0
    left = msgpack.unpackb((tmp_path / "raft_log.msgpack").read_bytes(), raw=False)
    assert len(left) == 1 and left[0]["index"] == 1
