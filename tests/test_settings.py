from qdrant_tpu.settings import Settings


def test_defaults():
    s = Settings.load(config_dir="/nonexistent", environ={})
    assert s.get_path("service.http_port") == 6333
    assert s.get_path("storage.hnsw_index.m") == 20


def test_yaml_cascade(tmp_path):
    (tmp_path / "config.yaml").write_text("service:\n  http_port: 7000\n")
    (tmp_path / "dev.yaml").write_text("service:\n  http_port: 7001\nlog_level: DEBUG\n")
    s = Settings.load(config_dir=str(tmp_path), environ={})
    assert s.get_path("service.http_port") == 7000
    s = Settings.load(config_dir=str(tmp_path), run_mode="dev", environ={})
    assert s.get_path("service.http_port") == 7001
    assert s["log_level"] == "DEBUG"


def test_env_overrides():
    env = {
        "QDRANT__SERVICE__HTTP_PORT": "9999",
        "QDRANT__STORAGE__HNSW_INDEX__M": "32",
        "QDRANT__SERVICE__API_KEY": "secret",
        "QDRANT__CLUSTER__ENABLED": "true",
    }
    s = Settings.load(config_dir="/nonexistent", environ=env)
    assert s.get_path("service.http_port") == 9999
    assert s.get_path("storage.hnsw_index.m") == 32
    assert s.get_path("service.api_key") == "secret"
    assert s.get_path("cluster.enabled") is True
