"""gRPC smoke tests (style of reference tests/basic_grpc_test.sh) using a
raw grpc channel + the dynamic message classes as the 'client'."""

import grpc
import pytest

from qdrant_tpu.api.grpc_schema import MESSAGES as M
from qdrant_tpu.api.grpc_server import make_server
from qdrant_tpu.api.toc import TableOfContent


@pytest.fixture(scope="module")
def grpc_env(tmp_path_factory):
    toc = TableOfContent(str(tmp_path_factory.mktemp("storage")))
    server, port = make_server(toc, port=0)
    server.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    yield channel
    server.stop(0)
    toc.close()


def unary(channel, method, request, resp_cls):
    fn = channel.unary_unary(
        method,
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_cls.FromString,
    )
    return fn(request)


def test_health_check(grpc_env):
    reply = unary(
        grpc_env,
        "/qdrant.Qdrant/HealthCheck",
        M["HealthCheckRequest"](),
        M["HealthCheckReply"],
    )
    assert "qdrant" in reply.title
    assert reply.version


def test_collections_lifecycle(grpc_env):
    create = M["CreateCollection"](collection_name="g1")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 2  # Euclid
    resp = unary(
        grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"]
    )
    assert resp.result

    lst = unary(
        grpc_env,
        "/qdrant.Collections/List",
        M["ListCollectionsRequest"](),
        M["ListCollectionsResponse"],
    )
    assert any(c.name == "g1" for c in lst.collections)

    exists = unary(
        grpc_env,
        "/qdrant.Collections/CollectionExists",
        M["CollectionExistsRequest"](collection_name="g1"),
        M["CollectionExistsResponse"],
    )
    assert exists.result.exists


def test_points_upsert_search_count(grpc_env):
    create = M["CreateCollection"](collection_name="g2")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 2
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])

    up = M["UpsertPoints"](collection_name="g2")
    for i, vec in enumerate([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]):
        p = up.points.add()
        p.id.num = i
        p.vectors.vector.dense.data.extend(vec)
        p.payload["tag"].string_value = f"t{i % 2}"
    resp = unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])
    assert resp.result.status == 2  # Completed

    count = unary(
        grpc_env,
        "/qdrant.Points/Count",
        M["CountPoints"](collection_name="g2"),
        M["CountResponse"],
    )
    assert count.result.count == 3

    search = M["SearchPoints"](collection_name="g2", vector=[1, 0, 0, 0], limit=2)
    search.with_payload.enable = True
    sr = unary(grpc_env, "/qdrant.Points/Search", search, M["SearchResponse"])
    assert sr.result[0].id.num == 0
    assert sr.result[0].payload["tag"].string_value == "t0"

    # filtered search: tag = t1 → only point 1
    search2 = M["SearchPoints"](collection_name="g2", vector=[1, 0, 0, 0], limit=3)
    cond = search2.filter.must.add()
    cond.field.key = "tag"
    cond.field.match.keyword = "t1"
    sr2 = unary(grpc_env, "/qdrant.Points/Search", search2, M["SearchResponse"])
    assert [p.id.num for p in sr2.result] == [1]

    # get with vectors
    get = M["GetPoints"](collection_name="g2")
    get.ids.add().num = 1
    get.with_payload.enable = True
    get.with_vectors.enable = True
    gr = unary(grpc_env, "/qdrant.Points/Get", get, M["GetResponse"])
    assert len(gr.result) == 1
    assert list(gr.result[0].vectors.vector.dense.data) == [0.0, 1.0, 0.0, 0.0]

    # delete by id
    dl = M["DeletePoints"](collection_name="g2")
    dl.points.points.ids.add().num = 0
    unary(grpc_env, "/qdrant.Points/Delete", dl, M["PointsOperationResponse"])
    count = unary(
        grpc_env,
        "/qdrant.Points/Count",
        M["CountPoints"](collection_name="g2"),
        M["CountResponse"],
    )
    assert count.result.count == 2


def test_grpc_error_status(grpc_env):
    with pytest.raises(grpc.RpcError) as e:
        unary(
            grpc_env,
            "/qdrant.Collections/Get",
            M["GetCollectionInfoRequest"](collection_name="missing"),
            M["GetCollectionInfoResponse"],
        )
    assert e.value.code() == grpc.StatusCode.NOT_FOUND


def test_scroll_and_payload_ops(grpc_env):
    create = M["CreateCollection"](collection_name="g3")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 3  # Dot
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name="g3")
    for i in range(5):
        p = up.points.add()
        p.id.num = i
        p.vectors.vector.dense.data.extend([float(i), 0, 0, 0])
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])

    sp = M["SetPayloadPoints"](collection_name="g3")
    sp.payload["mark"].bool_value = True
    sp.points_selector.points.ids.add().num = 2
    unary(grpc_env, "/qdrant.Points/SetPayload", sp, M["PointsOperationResponse"])

    scroll = M["ScrollPoints"](collection_name="g3", limit=3)
    scroll.with_payload.enable = True
    sr = unary(grpc_env, "/qdrant.Points/Scroll", scroll, M["ScrollResponse"])
    assert [p.id.num for p in sr.result] == [0, 1, 2]
    assert sr.next_page_offset.num == 3
    assert sr.result[2].payload["mark"].bool_value is True

    cp = M["ClearPayloadPoints"](collection_name="g3")
    cp.points.points.ids.add().num = 2
    unary(grpc_env, "/qdrant.Points/ClearPayload", cp, M["PointsOperationResponse"])
    sr = unary(grpc_env, "/qdrant.Points/Scroll", scroll, M["ScrollResponse"])
    assert "mark" not in sr.result[2].payload


def test_query_api_over_grpc(grpc_env):
    create = M["CreateCollection"](collection_name="g4")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 2
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name="g4")
    for i in range(8):
        p = up.points.add()
        p.id.num = i
        p.vectors.vector.dense.data.extend([float(i), 0, 0, 0])
        p.payload["rank"].integer_value = i
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])

    # nearest
    q = M["QueryPoints"](collection_name="g4", limit=3)
    q.query.nearest.dense.data.extend([2.2, 0, 0, 0])
    q.with_payload.enable = True
    resp = unary(grpc_env, "/qdrant.Points/Query", q, M["QueryResponse"])
    assert resp.result[0].id.num == 2
    assert resp.result[0].payload["rank"].integer_value == 2

    # recommend by point ids
    q = M["QueryPoints"](collection_name="g4", limit=3)
    pos = q.query.recommend.positive.add()
    pos.id.num = 5
    resp = unary(grpc_env, "/qdrant.Points/Query", q, M["QueryResponse"])
    assert all(p.id.num != 5 for p in resp.result)

    # order_by desc
    q = M["QueryPoints"](collection_name="g4", limit=2)
    q.query.order_by.key = "rank"
    q.query.order_by.direction = 1
    resp = unary(grpc_env, "/qdrant.Points/Query", q, M["QueryResponse"])
    assert [p.id.num for p in resp.result] == [7, 6]

    # prefetch + rrf fusion
    q = M["QueryPoints"](collection_name="g4", limit=3)
    pf = q.prefetch.add()
    pf.query.nearest.dense.data.extend([1.0, 0, 0, 0])
    pf.limit = 5
    q.query.fusion = 0  # RRF
    resp = unary(grpc_env, "/qdrant.Points/Query", q, M["QueryResponse"])
    assert len(resp.result) == 3


def test_grpc_api_key_auth(tmp_path):
    toc = TableOfContent(str(tmp_path / "sec"))
    server, port = make_server(toc, port=0, api_key="topsecret")
    server.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    try:
        with pytest.raises(grpc.RpcError) as e:
            unary(channel, "/qdrant.Qdrant/HealthCheck", M["HealthCheckRequest"](), M["HealthCheckReply"])
        assert e.value.code() == grpc.StatusCode.UNAUTHENTICATED

        fn = channel.unary_unary(
            "/qdrant.Qdrant/HealthCheck",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=M["HealthCheckReply"].FromString,
        )
        reply = fn(M["HealthCheckRequest"](), metadata=(("api-key", "topsecret"),))
        assert reply.version
    finally:
        server.stop(0)
        toc.close()


def test_datetime_range_filter_over_grpc(grpc_env):
    create = M["CreateCollection"](collection_name="g5")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 3
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name="g5")
    for i, ts in enumerate(["2024-01-01T00:00:00Z", "2025-06-15T12:00:00Z", "2026-03-01T00:00:00Z"]):
        p = up.points.add()
        p.id.num = i
        p.vectors.vector.dense.data.extend([1.0, 0, 0, 0])
        p.payload["created"].string_value = ts
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])

    cnt = M["CountPoints"](collection_name="g5")
    cond = cnt.filter.must.add()
    cond.field.key = "created"
    cond.field.datetime_range.gte.seconds = 1735689600  # 2025-01-01T00:00:00Z
    resp = unary(grpc_env, "/qdrant.Points/Count", cnt, M["CountResponse"])
    assert resp.result.count == 2


def test_batch_search_and_query(grpc_env):
    create = M["CreateCollection"](collection_name="g6")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 2
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name="g6")
    for i in range(4):
        p = up.points.add()
        p.id.num = i
        p.vectors.vector.dense.data.extend([float(i), 0, 0, 0])
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])

    sb = M["SearchBatchPoints"](collection_name="g6")
    for target in (0.0, 3.0):
        sp = sb.search_points.add(limit=1)
        sp.vector.extend([target, 0, 0, 0])
    resp = unary(grpc_env, "/qdrant.Points/SearchBatch", sb, M["SearchBatchResponse"])
    assert [b.result[0].id.num for b in resp.result] == [0, 3]

    qb = M["QueryBatchPoints"](collection_name="g6")
    for target in (1.0, 2.0):
        qp = qb.query_points.add()
        qp.limit = 1
        qp.query.nearest.dense.data.extend([target, 0, 0, 0])
    resp = unary(grpc_env, "/qdrant.Points/QueryBatch", qb, M["QueryBatchResponse"])
    assert [b.result[0].id.num for b in resp.result] == [1, 2]


def test_legacy_recommend_rpc(grpc_env):
    create = M["CreateCollection"](collection_name="g7")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 1  # Cosine
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name="g7")
    vecs = [[1, 0, 0, 0], [0.9, 0.1, 0, 0], [0, 0, 1, 0], [0, 0.1, 0.9, 0]]
    for i, v in enumerate(vecs):
        p = up.points.add()
        p.id.num = i
        p.vectors.vector.dense.data.extend(v)
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])

    rec = M["RecommendPoints"](collection_name="g7", limit=2)
    rec.positive.add().num = 0
    resp = unary(grpc_env, "/qdrant.Points/Recommend", rec, M["RecommendResponse"])
    ids = [p.id.num for p in resp.result]
    assert 0 not in ids  # the example itself is excluded
    assert ids[0] == 1  # nearest to the positive example


def test_aliases_and_field_index_over_grpc(grpc_env):
    create = M["CreateCollection"](collection_name="g8")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 3
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])

    ch = M["ChangeAliases"]()
    op = ch.actions.add()
    op.create_alias.collection_name = "g8"
    op.create_alias.alias_name = "galias"
    unary(grpc_env, "/qdrant.Collections/UpdateAliases", ch, M["CollectionOperationResponse"])
    lst = unary(grpc_env, "/qdrant.Collections/ListAliases", M["ListAliasesRequest"](), M["ListAliasesResponse"])
    assert any(a.alias_name == "galias" and a.collection_name == "g8" for a in lst.aliases)
    lst = unary(
        grpc_env,
        "/qdrant.Collections/ListCollectionAliases",
        M["ListCollectionAliasesRequest"](collection_name="g8"),
        M["ListAliasesResponse"],
    )
    assert len(lst.aliases) == 1

    ch = M["ChangeAliases"]()
    op = ch.actions.add()
    op.rename_alias.old_alias_name = "galias"
    op.rename_alias.new_alias_name = "galias2"
    unary(grpc_env, "/qdrant.Collections/UpdateAliases", ch, M["CollectionOperationResponse"])
    ch = M["ChangeAliases"]()
    ch.actions.add().delete_alias.alias_name = "galias2"
    unary(grpc_env, "/qdrant.Collections/UpdateAliases", ch, M["CollectionOperationResponse"])

    fi = M["CreateFieldIndexCollection"](collection_name="g8", field_name="tag")
    fi.field_type = 0
    unary(grpc_env, "/qdrant.Points/CreateFieldIndex", fi, M["PointsOperationResponse"])
    info = unary(
        grpc_env,
        "/qdrant.Collections/Get",
        M["GetCollectionInfoRequest"](collection_name="g8"),
        M["GetCollectionInfoResponse"],
    )
    # index exists (payload_schema not in the gRPC subset yet; at least no error)
    df = M["DeleteFieldIndexCollection"](collection_name="g8", field_name="tag")
    unary(grpc_env, "/qdrant.Points/DeleteFieldIndex", df, M["PointsOperationResponse"])


def test_update_and_delete_vectors_rpc(grpc_env):
    create = M["CreateCollection"](collection_name="g9")
    vp = create.vectors_config.params_map.map["a"]
    vp.size = 4
    vp.distance = 3
    vp2 = create.vectors_config.params_map.map["b"]
    vp2.size = 4
    vp2.distance = 3
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name="g9")
    p = up.points.add()
    p.id.num = 1
    p.vectors.vectors.vectors["a"].dense.data.extend([1, 0, 0, 0])
    p.vectors.vectors.vectors["b"].dense.data.extend([0, 1, 0, 0])
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])

    uv = M["UpdatePointVectors"](collection_name="g9")
    pv = uv.points.add()
    pv.id.num = 1
    pv.vectors.vectors.vectors["a"].dense.data.extend([9, 9, 9, 9])
    unary(grpc_env, "/qdrant.Points/UpdateVectors", uv, M["PointsOperationResponse"])

    get = M["GetPoints"](collection_name="g9")
    get.ids.add().num = 1
    get.with_vectors.enable = True
    gr = unary(grpc_env, "/qdrant.Points/Get", get, M["GetResponse"])
    assert list(gr.result[0].vectors.vectors.vectors["a"].dense.data) == [9.0, 9.0, 9.0, 9.0]

    dv = M["DeletePointVectors"](collection_name="g9")
    dv.points_selector.points.ids.add().num = 1
    dv.vectors.names.append("b")
    unary(grpc_env, "/qdrant.Points/DeleteVectors", dv, M["PointsOperationResponse"])
    gr = unary(grpc_env, "/qdrant.Points/Get", get, M["GetResponse"])
    assert "b" not in gr.result[0].vectors.vectors.vectors


def test_snapshots_service(grpc_env):
    create = M["CreateCollection"](collection_name="g10")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 3
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    resp = unary(
        grpc_env,
        "/qdrant.Snapshots/Create",
        M["CreateSnapshotRequest"](collection_name="g10"),
        M["CreateSnapshotResponse"],
    )
    name = resp.snapshot_description.name
    assert name and resp.snapshot_description.size > 0
    lst = unary(
        grpc_env,
        "/qdrant.Snapshots/List",
        M["ListSnapshotsRequest"](collection_name="g10"),
        M["ListSnapshotsResponse"],
    )
    assert any(s.name == name for s in lst.snapshot_descriptions)
    unary(
        grpc_env,
        "/qdrant.Snapshots/Delete",
        M["DeleteSnapshotRequest"](collection_name="g10", snapshot_name=name),
        M["DeleteSnapshotResponse"],
    )
    full = unary(
        grpc_env,
        "/qdrant.Snapshots/CreateFull",
        M["CreateFullSnapshotRequest"](),
        M["CreateSnapshotResponse"],
    )
    assert full.snapshot_description.name.startswith("full-snapshot-")


def _mk_coll(grpc_env, name, n=8, dim=4):
    create = M["CreateCollection"](collection_name=name)
    create.vectors_config.params.size = dim
    create.vectors_config.params.distance = 3  # Dot
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name=name)
    for i in range(n):
        p = up.points.add()
        p.id.num = i
        vec = [0.0] * dim
        vec[i % dim] = 1.0
        p.vectors.vector.dense.data.extend(vec)
        p.payload["grp"].string_value = f"g{i % 2}"
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])


def test_discover_and_batches(grpc_env):
    _mk_coll(grpc_env, "gd")
    # discover with target + context pair
    d = M["DiscoverPoints"](collection_name="gd", limit=3)
    d.target.single.id.num = 0
    pair = d.context.add()
    pair.positive.id.num = 1
    pair.negative.id.num = 2
    r = unary(grpc_env, "/qdrant.Points/Discover", d, M["DiscoverResponse"])
    assert len(r.result) == 3

    db = M["DiscoverBatchPoints"](collection_name="gd")
    sub = db.discover_points.add(limit=2)
    sub.target.single.id.num = 1
    rb = unary(grpc_env, "/qdrant.Points/DiscoverBatch", db, M["DiscoverBatchResponse"])
    assert len(rb.result) == 1 and len(rb.result[0].result) == 2

    reb = M["RecommendBatchPoints"](collection_name="gd")
    rp = reb.recommend_points.add(limit=2)
    rp.positive.add().num = 0
    rr = unary(grpc_env, "/qdrant.Points/RecommendBatch", reb, M["RecommendBatchResponse"])
    assert len(rr.result) == 1 and len(rr.result[0].result) == 2


def test_groups_over_grpc(grpc_env):
    _mk_coll(grpc_env, "gg")
    sg = M["SearchPointGroups"](
        collection_name="gg", vector=[1, 0, 0, 0], limit=2,
        group_by="grp", group_size=2,
    )
    r = unary(grpc_env, "/qdrant.Points/SearchGroups", sg, M["SearchGroupsResponse"])
    assert len(r.result.groups) == 2
    gids = {g.id.string_value for g in r.result.groups}
    assert gids == {"g0", "g1"}
    assert all(len(g.hits) == 2 for g in r.result.groups)

    qg = M["QueryPointGroups"](collection_name="gg", group_by="grp", limit=2, group_size=1)
    qg.query.nearest.dense.data.extend([0, 1, 0, 0])
    r2 = unary(grpc_env, "/qdrant.Points/QueryGroups", qg, M["QueryGroupsResponse"])
    assert len(r2.result.groups) == 2

    rg = M["RecommendPointGroups"](collection_name="gg", group_by="grp", limit=2, group_size=1)
    rg.positive.add().num = 0
    r3 = unary(grpc_env, "/qdrant.Points/RecommendGroups", rg, M["RecommendGroupsResponse"])
    assert len(r3.result.groups) == 2


def test_facet_and_matrix_over_grpc(grpc_env):
    _mk_coll(grpc_env, "gf")
    fc = M["FacetCounts"](collection_name="gf", key="grp")
    r = unary(grpc_env, "/qdrant.Points/Facet", fc, M["FacetResponse"])
    counts = {h.value.string_value: h.count for h in r.hits}
    assert counts == {"g0": 4, "g1": 4}

    mp = M["SearchMatrixPoints"](collection_name="gf", sample=4, limit=2)
    rp = unary(grpc_env, "/qdrant.Points/SearchMatrixPairs", mp, M["SearchMatrixPairsResponse"])
    assert len(rp.result.pairs) > 0
    ro = unary(grpc_env, "/qdrant.Points/SearchMatrixOffsets", mp, M["SearchMatrixOffsetsResponse"])
    assert len(ro.result.ids) == 4
    assert len(ro.result.scores) == len(ro.result.offsets_row)


def test_update_batch_over_grpc(grpc_env):
    _mk_coll(grpc_env, "gu")
    ub = M["UpdateBatchPoints"](collection_name="gu")
    # op 1: upsert a new point
    op1 = ub.operations.add()
    p = op1.upsert.points.add()
    p.id.num = 100
    p.vectors.vector.dense.data.extend([1, 1, 0, 0])
    # op 2: set payload on it
    op2 = ub.operations.add()
    op2.set_payload.payload["tier"].integer_value = 9
    op2.set_payload.points_selector.points.ids.add().num = 100
    # op 3: delete another point
    op3 = ub.operations.add()
    op3.delete_points.points.points.ids.add().num = 0
    r = unary(grpc_env, "/qdrant.Points/UpdateBatch", ub, M["UpdateBatchResponse"])
    assert len(r.result) == 3
    count = unary(grpc_env, "/qdrant.Points/Count", M["CountPoints"](collection_name="gu"),
                  M["CountResponse"])
    assert count.result.count == 8  # +1 upsert, -1 delete
    get = M["GetPoints"](collection_name="gu")
    get.ids.add().num = 100
    get.with_payload.enable = True
    gr = unary(grpc_env, "/qdrant.Points/Get", get, M["GetResponse"])
    assert gr.result[0].payload["tier"].integer_value == 9

    # overwrite payload RPC
    ow = M["SetPayloadPoints"](collection_name="gu")
    ow.payload["fresh"].bool_value = True
    ow.points_selector.points.ids.add().num = 100
    unary(grpc_env, "/qdrant.Points/OverwritePayload", ow, M["PointsOperationResponse"])
    gr2 = unary(grpc_env, "/qdrant.Points/Get", get, M["GetResponse"])
    assert "tier" not in gr2.result[0].payload
    assert gr2.result[0].payload["fresh"].bool_value is True


def test_collections_update_over_grpc(grpc_env):
    _mk_coll(grpc_env, "gc")
    upd = M["UpdateCollection"](collection_name="gc")
    upd.optimizers_config.indexing_threshold = 123
    r = unary(grpc_env, "/qdrant.Collections/Update", upd, M["CollectionOperationResponse"])
    assert r.result
    info = unary(grpc_env, "/qdrant.Collections/Get",
                 M["GetCollectionInfoRequest"](collection_name="gc"),
                 M["GetCollectionInfoResponse"])
    assert info.result is not None


def test_shard_snapshots_over_grpc(grpc_env):
    """qdrant.ShardSnapshots Create/List/Recover/Delete (reference:
    src/tonic/mod.rs:138-338)."""
    create = M["CreateCollection"](collection_name="gsnap")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 1
    unary(grpc_env, "/qdrant.Collections/Create", create, M["CollectionOperationResponse"])
    up = M["UpsertPoints"](collection_name="gsnap")
    for i in range(4):
        p = up.points.add()
        p.id.num = i
        p.vectors.vector.dense.data.extend([float(i), 1, 0, 0])
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])

    resp = unary(
        grpc_env,
        "/qdrant.ShardSnapshots/Create",
        M["CreateShardSnapshotRequest"](collection_name="gsnap", shard_id=0),
        M["CreateSnapshotResponse"],
    )
    name = resp.snapshot_description.name
    assert name.endswith(".snapshot")

    lst = unary(
        grpc_env,
        "/qdrant.ShardSnapshots/List",
        M["ListShardSnapshotsRequest"](collection_name="gsnap", shard_id=0),
        M["ListSnapshotsResponse"],
    )
    assert [d.name for d in lst.snapshot_descriptions] == [name]

    dl = M["DeletePoints"](collection_name="gsnap")
    for i in range(4):
        dl.points.points.ids.add().num = i
    unary(grpc_env, "/qdrant.Points/Delete", dl, M["PointsOperationResponse"])

    rec = M["RecoverShardSnapshotRequest"](collection_name="gsnap", shard_id=0)
    rec.snapshot_location.path = name
    unary(
        grpc_env,
        "/qdrant.ShardSnapshots/Recover",
        rec,
        M["RecoverSnapshotResponse"],
    )
    count = unary(
        grpc_env,
        "/qdrant.Points/Count",
        M["CountPoints"](collection_name="gsnap"),
        M["CountResponse"],
    )
    assert count.result.count == 4

    unary(
        grpc_env,
        "/qdrant.ShardSnapshots/Delete",
        M["DeleteShardSnapshotRequest"](
            collection_name="gsnap", shard_id=0, snapshot_name=name
        ),
        M["DeleteSnapshotResponse"],
    )
    lst = unary(
        grpc_env,
        "/qdrant.ShardSnapshots/List",
        M["ListShardSnapshotsRequest"](collection_name="gsnap", shard_id=0),
        M["ListSnapshotsResponse"],
    )
    assert len(lst.snapshot_descriptions) == 0


def test_custom_sharding_and_shard_key_selector_over_grpc(grpc_env):
    """Custom sharding end-to-end over gRPC: Create(sharding_method=Custom),
    CreateShardKey, shard-key-routed upsert + search + count, DeleteShardKey.
    Reference: collections_service.proto:36-38, points.proto:155-159."""
    create = M["CreateCollection"](collection_name="gsk", sharding_method=1)
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 3  # Dot
    unary(grpc_env, "/qdrant.Collections/Create", create,
          M["CollectionOperationResponse"])
    for key in ("eu", "us"):
        csk = M["CreateShardKeyRequest"](collection_name="gsk")
        csk.request.shard_key.keyword = key
        r = unary(grpc_env, "/qdrant.Collections/CreateShardKey", csk,
                  M["CreateShardKeyResponse"])
        assert r.result

    # upsert 3 points into "eu", 2 into "us"
    for key, ids in (("eu", [1, 2, 3]), ("us", [10, 11])):
        up = M["UpsertPoints"](collection_name="gsk")
        up.shard_key_selector.shard_keys.add().keyword = key
        for i in ids:
            p = up.points.add()
            p.id.num = i
            p.vectors.vector.data.extend([1.0, 0.0, 0.0, float(i)])
        unary(grpc_env, "/qdrant.Points/Upsert", up,
              M["PointsOperationResponse"])

    # count per shard key
    for key, expect in (("eu", 3), ("us", 2)):
        cp = M["CountPoints"](collection_name="gsk")
        cp.shard_key_selector.shard_keys.add().keyword = key
        r = unary(grpc_env, "/qdrant.Points/Count", cp, M["CountResponse"])
        assert r.result.count == expect

    # search restricted to one shard key only returns its points
    sp = M["SearchPoints"](collection_name="gsk", vector=[1, 0, 0, 1], limit=10)
    sp.shard_key_selector.shard_keys.add().keyword = "us"
    r = unary(grpc_env, "/qdrant.Points/Search", sp, M["SearchResponse"])
    got = {h.id.num for h in r.result}
    assert got == {10, 11}

    # multi-key selector spans both
    sp2 = M["SearchPoints"](collection_name="gsk", vector=[1, 0, 0, 1], limit=10)
    sp2.shard_key_selector.shard_keys.add().keyword = "us"
    sp2.shard_key_selector.shard_keys.add().keyword = "eu"
    r2 = unary(grpc_env, "/qdrant.Points/Search", sp2, M["SearchResponse"])
    assert {h.id.num for h in r2.result} == {1, 2, 3, 10, 11}

    dsk = M["DeleteShardKeyRequest"](collection_name="gsk")
    dsk.request.shard_key.keyword = "us"
    r3 = unary(grpc_env, "/qdrant.Collections/DeleteShardKey", dsk,
               M["DeleteShardKeyResponse"])
    assert r3.result
    cp = M["CountPoints"](collection_name="gsk")
    r4 = unary(grpc_env, "/qdrant.Points/Count", cp, M["CountResponse"])
    assert r4.result.count == 3  # us points gone with their shard


def test_groups_with_lookup_over_grpc(grpc_env):
    """WithLookup: group ids double as point ids in a lookup collection and
    the matched record is attached to each group (points.proto:576-583,
    PointGroup.lookup)."""
    _mk_coll(grpc_env, "glk_src")
    # lookup collection keyed by the group values used by _mk_coll ("g0","g1")
    # — string group ids resolve as uuid-style ids, so use a numeric group
    create = M["CreateCollection"](collection_name="glk_items")
    create.vectors_config.params.size = 4
    create.vectors_config.params.distance = 3
    unary(grpc_env, "/qdrant.Collections/Create", create,
          M["CollectionOperationResponse"])
    # re-tag source points with integer group ids 0/1
    up = M["UpsertPoints"](collection_name="glk_src")
    for i in range(8):
        p = up.points.add()
        p.id.num = 100 + i
        p.vectors.vector.data.extend([1.0, 0.0, 0.0, float(i)])
        p.payload["gid"].integer_value = i % 2
    unary(grpc_env, "/qdrant.Points/Upsert", up, M["PointsOperationResponse"])
    # lookup items with ids 0 and 1
    up2 = M["UpsertPoints"](collection_name="glk_items")
    for i in (0, 1):
        p = up2.points.add()
        p.id.num = i
        p.vectors.vector.data.extend([0.0, 1.0, 0.0, 0.0])
        p.payload["title"].string_value = f"item-{i}"
    unary(grpc_env, "/qdrant.Points/Upsert", up2, M["PointsOperationResponse"])

    sg = M["SearchPointGroups"](
        collection_name="glk_src", vector=[1, 0, 0, 0], limit=2,
        group_by="gid", group_size=2,
    )
    sg.with_lookup.collection = "glk_items"
    r = unary(grpc_env, "/qdrant.Points/SearchGroups", sg,
              M["SearchGroupsResponse"])
    assert len(r.result.groups) == 2
    titles = {
        g.lookup.payload["title"].string_value for g in r.result.groups
    }
    assert titles == {"item-0", "item-1"}
