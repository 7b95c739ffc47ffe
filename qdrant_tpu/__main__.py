"""Process entry point: `python -m qdrant_tpu [--config-path ...]`.

Reference: src/main.rs — loads settings, initializes the storage root
(TableOfContent), and serves the REST API (gRPC arrives with the cluster
layer). Ctrl-C flushes all collections before exit.
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="qdrant_tpu", description="TPU-native vector search engine")
    parser.add_argument("--config-path", help="path to a config yaml overriding the cascade")
    parser.add_argument("--storage-dir", help="override storage.storage_path")
    parser.add_argument("--http-port", type=int, help="override service.http_port")
    parser.add_argument("--host", help="override service.host")
    parser.add_argument("--uri", help="this peer's public URL (enables cluster mode)")
    parser.add_argument(
        "--bootstrap",
        help="URL of an existing peer to join (reference: src/main.rs --bootstrap)",
    )
    parser.add_argument("--peer-id", type=int, help="stable peer id (default: derived from uri)")
    parser.add_argument(
        "--force-cpu",
        action="store_true",
        help="run on the CPU backend (CPU-only hosts / accelerator outage)",
    )
    args = parser.parse_args(argv)

    if args.force_cpu or os.environ.get("QDRANT_TPU_FORCE_CPU"):
        # must happen before ANY jax use: plugin discovery (e.g. an axon
        # TPU tunnel) overrides JAX_PLATFORMS env, but not the config knob
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.config_path:
        os.environ["QDRANT_CONFIG_PATH"] = args.config_path

    from .settings import Settings

    settings = Settings.load()
    if args.storage_dir:
        settings["storage"]["storage_path"] = args.storage_dir
    if args.http_port:
        settings["service"]["http_port"] = args.http_port
    if args.host:
        settings["service"]["host"] = args.host

    logging.basicConfig(
        level=getattr(logging, str(settings.get("log_level", "INFO")).upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    log = logging.getLogger("qdrant_tpu")

    # optional on-disk log sink (reference: src/tracing/on_disk.rs; config
    # schema mirrors config.yaml's `logger.on_disk` section)
    on_disk_cfg = (settings.get("logger") or {}).get("on_disk") or {}
    if on_disk_cfg.get("enabled"):
        from .utils.telemetry import configure_on_disk_logging

        try:
            configure_on_disk_logging(on_disk_cfg)
            log.info("on-disk log sink: %s", on_disk_cfg.get("log_file"))
        except Exception as exc:
            # same degradation as the reference: report and continue with
            # the sink disabled rather than refusing to start
            log.error("failed to enable on-disk log sink: %s", exc)

    # runtime feature flags (reference: common/flags.rs, OnceLock init)
    from .utils.flags import init_feature_flags

    init_feature_flags(settings.get("feature_flags"))

    # load-time memory mode — an OOM-crash-loop recovery knob that only
    # affects how segments load (reference: config.yaml:49-63)
    lmm = settings.get_path("storage.low_memory_mode", "disabled")
    if lmm and lmm != "disabled":
        from .storage.segment import set_low_memory_mode

        set_low_memory_mode(lmm)
        log.warning("low_memory_mode=%s: segments load on-disk/unpopulated", lmm)

    # stall watchdog (reference: service_debug deadlock checker thread,
    # src/main.rs:331-366); also togglable at runtime via PATCH /debugger
    if settings.get_path("service.service_debug", False):
        from .utils.debug import WATCHDOG

        WATCHDOG.configure({"enabled": True})
        log.info("service debug: stall watchdog enabled")

    from .api.rest import RestServer
    from .api.toc import TableOfContent

    storage_path = settings.get_path("storage.storage_path", "./storage")
    toc = TableOfContent(
        storage_path,
        flush_interval_sec=settings.get_path("storage.optimizers.flush_interval_sec", 5),
        snapshots_config={
            "snapshots_storage": settings.get_path("storage.snapshots_storage", "local"),
            "s3_config": settings.get_path("storage.s3_config", None),
        },
        quota_config=settings.get_path("storage.quota", None),
    )
    inf_cfg = settings.get("inference") or {}
    if inf_cfg.get("address"):
        from .utils import inference as _inference

        _inference.configure(
            inf_cfg["address"],
            token=inf_cfg.get("token"),
            timeout=float(inf_cfg.get("timeout") or 10.0),
        )
        log.info("inference service: %s", inf_cfg["address"])

    host = settings.get_path("service.host", "127.0.0.1")
    port = int(settings.get_path("service.http_port", 6333))

    cluster_enabled = bool(settings.get_path("cluster.enabled", False)) or bool(args.uri)
    cluster_node = None
    if cluster_enabled and args.uri:
        import binascii

        from .cluster.node import ClusterNode

        peer_id = args.peer_id or (
            binascii.crc32(args.uri.encode()) & 0x7FFFFFFF
        )
        peer_urls = {peer_id: args.uri}
        if args.bootstrap:
            # announce ourselves to an existing peer and adopt its membership
            import json as _json
            import urllib.request as _rq

            req = _rq.Request(
                args.bootstrap.rstrip("/") + "/cluster/bootstrap",
                method="POST",
                data=_json.dumps({"peer_id": peer_id, "url": args.uri}).encode(),
                headers={
                    "Content-Type": "application/json",
                    **(
                        {"api-key": settings.get_path("service.api_key")}
                        if settings.get_path("service.api_key")
                        else {}
                    ),
                },
            )
            with _rq.urlopen(req, timeout=10) as resp:
                peers = _json.loads(resp.read())["result"]["peers"]
            peer_urls.update({int(k): v for k, v in peers.items()})
        cluster_node = ClusterNode(
            peer_id,
            toc,
            peer_urls,
            tick_period=float(settings.get_path("cluster.consensus.tick_period_ms", 100)) / 1000.0,
            raft_storage=os.path.join(storage_path, "raft"),
            api_key=settings.get_path("service.api_key"),
        )
        cluster_node.start()
        log.info("cluster mode: peer %d at %s (%d peers)", peer_id, args.uri, len(peer_urls))
    server = RestServer(
        toc,
        host=host,
        port=port,
        api_key=settings.get_path("service.api_key"),
        read_only_api_key=settings.get_path("service.read_only_api_key"),
        static_content_dir=settings.get_path(
            "service.static_content_dir", "./static"
        ),
        enable_static_content=bool(
            settings.get_path("service.enable_static_content", True)
        ),
    )

    # anonymized usage reporter (reference: telemetry_reporting.rs — hourly
    # level-2 anonymized POST, disabled by `telemetry_disabled: true`)
    reporter = None
    if not settings.get("telemetry_disabled", False):
        from .utils.telemetry import TelemetryReporter

        reporter = TelemetryReporter(
            toc, url=settings.get_path("service.telemetry_url", None)
        )
        reporter.start()
        log.info("anonymized telemetry reporting enabled (hourly)")
    log.info("qdrant-tpu listening on http://%s:%d (storage: %s)", host, server.port, storage_path)

    grpc_server = None
    try:
        from .api.grpc_server import make_server

        grpc_port = int(settings.get_path("service.grpc_port", 6334))
        grpc_server, bound = make_server(
            toc,
            host=host,
            port=grpc_port,
            api_key=settings.get_path("service.api_key"),
            read_only_api_key=settings.get_path("service.read_only_api_key"),
        )
        grpc_server.start()
        log.info("qdrant-tpu gRPC listening on %s:%d", host, bound)
    except Exception as e:  # grpc runtime optional
        log.warning("gRPC server not started: %s", e)

    def shutdown(signum, frame):
        log.info("shutting down; flushing collections")
        if reporter is not None:
            reporter.stop()
        if cluster_node is not None:
            cluster_node.stop()
        if grpc_server is not None:
            grpc_server.stop(2)
        toc.close()
        server.httpd.shutdown()

    signal.signal(signal.SIGINT, shutdown)
    signal.signal(signal.SIGTERM, shutdown)
    try:
        server.serve_forever()
    finally:
        toc.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
