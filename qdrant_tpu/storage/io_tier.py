"""Universal read tier: one ranged-read interface over local files, S3
objects, and remote peers' storage.

Reference behavior: `lib/common/common/src/universal_io` abstracts reads
over mmap/io_uring/disk-cache/object-store backends, and the `StorageRead`
gRPC service (`storage_read_service.proto:17-21`, client
`lib/uio-grpc-client`) lets one node read byte ranges of another node's
storage for disaggregated deployments. Here the same capability rides the
existing HTTP internal plane (`POST /internal/storage/read`) — a
deliberate divergence: this codebase's inter-peer transport is HTTP
throughout (cluster/remote.py), not tonic gRPC.

URI forms accepted by :class:`UniversalReader.read`:

* ``file://<path>`` or a bare path — local file relative to the storage
  root (escapes rejected), ranged via seek+read.
* ``s3://<key>`` — ranged GET against the configured S3 client.
* ``peer://<host:port>/<relpath>`` — ranged read of another peer's
  storage through its internal storage-read endpoint.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Optional


class IoTierError(Exception):
    pass


def resolve_in_root(root: str, rel: str) -> str:
    """Absolute path of `rel` inside `root`; raises on escape attempts."""
    base = os.path.realpath(root)
    full = os.path.realpath(os.path.join(base, rel.lstrip("/")))
    if not (full == base or full.startswith(base + os.sep)):
        raise IoTierError(f"path escapes storage root: {rel!r}")
    return full


def read_local(root: str, rel: str, offset: int = 0, length: int = -1) -> bytes:
    full = resolve_in_root(root, rel)
    if not os.path.isfile(full):
        raise IoTierError(f"no such file: {rel!r}")
    with open(full, "rb") as f:
        if offset:
            f.seek(offset)
        return f.read(None if length < 0 else length)


def read_peer(
    peer_url: str,
    rel: str,
    offset: int = 0,
    length: int = -1,
    api_key: Optional[str] = None,
    timeout: float = 30.0,
) -> bytes:
    """Ranged read of another peer's storage file over the internal plane."""
    body = json.dumps({"path": rel, "offset": offset, "length": length}).encode()
    req = urllib.request.Request(
        peer_url.rstrip("/") + "/internal/storage/read",
        data=body,
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    if api_key:
        req.add_header("api-key", api_key)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:
        raise IoTierError(
            f"peer storage read {rel!r} failed: {e.code} "
            f"{e.read().decode(errors='replace')[:200]}"
        )
    except OSError as e:
        raise IoTierError(f"peer {peer_url} unreachable: {e}")


class UniversalReader:
    """Scheme-dispatching ranged reader (see module docstring)."""

    def __init__(
        self,
        storage_root: str,
        s3_client=None,
        api_key: Optional[str] = None,
    ):
        self.storage_root = storage_root
        self.s3_client = s3_client
        self.api_key = api_key

    def read(self, uri: str, offset: int = 0, length: int = -1) -> bytes:
        if uri.startswith("s3://"):
            if self.s3_client is None:
                raise IoTierError("no S3 client configured")
            return self.s3_client.get_object_range(uri[5:], offset, length)
        if uri.startswith("peer://"):
            rest = uri[7:]
            host, _, rel = rest.partition("/")
            scheme = "https" if host.endswith(":443") else "http"
            return read_peer(
                f"{scheme}://{host}", rel, offset, length, self.api_key
            )
        if uri.startswith("file://"):
            uri = uri[7:]
        return read_local(self.storage_root, uri, offset, length)
